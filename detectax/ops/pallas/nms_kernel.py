"""Greedy NMS suppression as a Pallas TPU kernel.

The whole candidate set lives in VMEM laid out as coordinate *rows*
(`[8, K]`: y1,x1,y2,x2,area — lane-dim = candidates), and the sequential
greedy sweep computes each round's suppression row on the fly with VPU
vector ops — the `[K, K]` IoU matrix is never materialized (SURVEY.md
§7.2.11c). Input must be score-descending; returns the keep mask.

Numerics match `detectax.ops.nms._suppression_mask` (oracle-tested against
the reference's `cpu_nms`, `RetinaNet/retinanet_module.py:453-481`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detectax.ops.pallas._common import on_tpu, round_up

LANE = 128


def _nms_kernel(rows_ref, keep_ref, iou_thresh, class_aware=False):
    k = rows_ref.shape[1]
    y1 = rows_ref[0:1, :]
    x1 = rows_ref[1:2, :]
    y2 = rows_ref[2:3, :]
    x2 = rows_ref[3:4, :]
    area = rows_ref[4:5, :]
    valid = rows_ref[5:6, :]  # 1.0 for real candidates, 0.0 for padding
    cls = rows_ref[6:7, :]    # class id as float (class-aware mode)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    keep_ref[:] = valid

    def body(i, _):
        # Extract candidate i's scalars via one-hot reductions — Mosaic has
        # no dynamic lane-indexed scalar load, but [1,K] reductions are
        # cheap VPU ops.
        onehot = (idx == i).astype(jnp.float32)
        by1 = jnp.sum(y1 * onehot)
        bx1 = jnp.sum(x1 * onehot)
        by2 = jnp.sum(y2 * onehot)
        bx2 = jnp.sum(x2 * onehot)
        barea = jnp.sum(area * onehot)
        keep_i = jnp.sum(keep_ref[0:1, :] * onehot)

        ih = jnp.maximum(0.0, jnp.minimum(y2, by2) - jnp.maximum(y1, by1))
        iw = jnp.maximum(0.0, jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1))
        inter = ih * iw
        iou = inter / (area + barea - inter + 1e-8)

        sup = (
            (iou > iou_thresh)
            & (idx > i)
            & (keep_i > 0.5)
        )
        if class_aware:
            bcls = jnp.sum(cls * onehot)
            sup = sup & (jnp.abs(cls - bcls) < 0.5)
        keep_ref[:] = keep_ref[:] * (1.0 - sup.astype(jnp.float32))
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def suppression_mask_pallas(
    boxes: jnp.ndarray,
    iou_thresh: float,
    valid: jnp.ndarray | None = None,
    classes: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Keep mask for score-descending corner boxes ``[K, 4]``.

    ``classes`` (int ``[K]``): when given, suppression only acts between
    same-class candidates (class-aware NMS) — the cross-class IoU masking
    happens inside the kernel, no [K, K] matrix anywhere.
    """
    if interpret is None:
        interpret = not on_tpu()
    k = boxes.shape[0]
    kp = round_up(k, LANE)
    b = jnp.pad(boxes.astype(jnp.float32), ((0, kp - k), (0, 0)))
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    if valid is None:
        v = jnp.pad(jnp.ones((k,), jnp.float32), (0, kp - k))
    else:
        v = jnp.pad(valid.astype(jnp.float32), (0, kp - k))
    if classes is None:
        c = jnp.zeros((kp,), jnp.float32)
    else:
        # padding gets class -1 so it can never alias a real class
        c = jnp.pad(
            classes.astype(jnp.float32), (0, kp - k), constant_values=-1.0
        )
    rows = jnp.stack(
        [b[:, 0], b[:, 1], b[:, 2], b[:, 3], area, v, c,
         jnp.zeros_like(v)],
        axis=0,
    )  # [8, Kp]
    keep = pl.pallas_call(
        functools.partial(
            _nms_kernel, iou_thresh=iou_thresh,
            class_aware=classes is not None,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        interpret=interpret,
    )(rows)
    return keep[0, :k] > 0.5
