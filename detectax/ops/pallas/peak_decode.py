"""Fused CenterNet heatmap peak decode as a Pallas TPU kernel.

sigmoid -> 3x3 local-maximum test -> masked scores, in one VMEM pass
(SURVEY.md §7.2.11b). The masked scores feed `lax.top_k` + the NMS-free
CenterNet peak pipeline: a cell survives iff it equals the max of its 3x3
neighborhood (the standard maxpool-equals trick).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detectax.ops.pallas._common import on_tpu


def _peak_kernel(logits_ref, out_ref, *, apply_sigmoid: bool = True):
    x = logits_ref[0]  # [H, W] one class plane
    p = 1.0 / (1.0 + jnp.exp(-x)) if apply_sigmoid else x
    h, w = p.shape
    neg = jnp.float32(-1.0)

    def shift(arr, dy, dx):
        # shift with -1 fill so borders never beat real cells
        rolled = arr
        if dy:
            rolled = jnp.roll(rolled, dy, axis=0)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            edge = row_ids < dy if dy > 0 else row_ids >= h + dy
            rolled = jnp.where(edge, neg, rolled)
        if dx:
            rolled = jnp.roll(rolled, dx, axis=1)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            edge = col_ids < dx if dx > 0 else col_ids >= w + dx
            rolled = jnp.where(edge, neg, rolled)
        return rolled

    neighborhood_max = p
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neighborhood_max = jnp.maximum(neighborhood_max, shift(p, dy, dx))
    out_ref[0] = jnp.where(p >= neighborhood_max, p, 0.0)


def _peak_call(
    planes_in: jnp.ndarray, apply_sigmoid: bool, interpret: bool | None
) -> jnp.ndarray:
    if interpret is None:
        interpret = not on_tpu()
    h, w, c = planes_in.shape
    planes = jnp.moveaxis(planes_in.astype(jnp.float32), -1, 0)  # [C, H, W]
    out = pl.pallas_call(
        functools.partial(_peak_kernel, apply_sigmoid=apply_sigmoid),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
    )(planes)
    return jnp.moveaxis(out, 0, -1)


def peak_scores_pallas(
    logits: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """[H, W, C] class logits -> [H, W, C] sigmoid scores masked to local
    3x3 peaks (zeros elsewhere)."""
    return _peak_call(logits, apply_sigmoid=True, interpret=interpret)


def peak_mask_scores_pallas(
    scores: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """[H, W, C] pre-computed probabilities (e.g. sigma(cls)*sigma(cen)) ->
    same maps masked to 3x3 local peaks. Same kernel, sigmoid skipped."""
    return _peak_call(scores, apply_sigmoid=False, interpret=interpret)


def _mask_to_peaks(p: jnp.ndarray) -> jnp.ndarray:
    padded = jnp.pad(
        p, ((1, 1), (1, 1), (0, 0)), constant_values=-1.0
    )
    neigh = jnp.stack([
        padded[1 + dy:1 + dy + p.shape[0], 1 + dx:1 + dx + p.shape[1]]
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        if not (dy == 0 and dx == 0)
    ])
    nmax = jnp.max(neigh, axis=0)
    return jnp.where(p >= nmax, p, 0.0)


def peak_scores_reference(logits: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp reference for tests / non-TPU fallback."""
    return _mask_to_peaks(jax.nn.sigmoid(logits.astype(jnp.float32)))


def peak_mask_scores_reference(scores: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp twin of `peak_mask_scores_pallas`."""
    return _mask_to_peaks(scores.astype(jnp.float32))
