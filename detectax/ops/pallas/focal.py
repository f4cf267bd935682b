"""Fused stable focal loss as a Pallas TPU kernel.

One VMEM-resident pass computes the stable-BCE decomposition, focal
weighting, optional mask, and the partial reduction — the elementwise chain
never round-trips to HBM (SURVEY.md §7.2.11a). Numerics match
`detectax.ops.losses.focal_loss` (itself parity-tested against the
reference formulation, `FCOS/fcos.py:443-462`).

The backward pass is an analytic closed form (custom_vjp), so the kernel is
usable inside the jitted train step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detectax.ops.pallas._common import on_tpu, round_up

LANE = 128
SUBLANE = 8
TILE_ROWS = 256  # rows of the [M, 128] layout processed per grid step


def _focal_kernel(labels_ref, logits_ref, wmask_ref, out_ref, alpha, gamma):
    z = labels_ref[:]
    x = logits_ref[:]
    w = wmask_ref[:]
    log1p_term = jnp.log1p(jnp.exp(-jnp.abs(x)))
    pos_ce = log1p_term - jnp.minimum(x, 0.0)
    neg_ce = log1p_term + jnp.maximum(x, 0.0)
    p = 1.0 / (1.0 + jnp.exp(-x))
    loss = (
        z * alpha * jnp.power(1.0 - p, gamma) * pos_ce
        + (1.0 - z) * (1.0 - alpha) * jnp.power(p, gamma) * neg_ce
    )
    partial = jnp.sum(loss * w)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += partial


def _pallas_forward(labels, logits, weights, alpha, gamma, interpret):
    n = logits.size
    m = round_up(pl.cdiv(n, LANE), SUBLANE)
    # pad rows to a whole number of grid tiles: a partial final block would
    # read undefined memory (weight padding keeps the extra rows inert)
    if m > TILE_ROWS:
        m = round_up(m, TILE_ROWS)
    pad = m * LANE - n

    def to_tiles(t):
        flat = t.astype(jnp.float32).reshape(-1)
        return jnp.pad(flat, (0, pad)).reshape(m, LANE)

    z = to_tiles(labels)
    x = to_tiles(logits)
    if weights is None:
        w_flat = jnp.ones((n,), jnp.float32)
    else:
        w_flat = jnp.broadcast_to(
            weights.astype(jnp.float32), logits.shape
        ).reshape(-1)
    w = jnp.pad(w_flat, (0, pad)).reshape(m, LANE)  # padding -> weight 0

    rows = min(TILE_ROWS, m)
    grid = pl.cdiv(m, rows)
    out = pl.pallas_call(
        functools.partial(_focal_kernel, alpha=alpha, gamma=gamma),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(z, x, w)
    return out[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def focal_loss_pallas(
    labels, logits, weights=None, alpha=0.25, gamma=2.0, interpret=None
):
    """Sum-reduced stable sigmoid focal loss (Pallas fused).

    Drop-in for `detectax.ops.losses.focal_loss`. `interpret=None`
    auto-selects: compiled on TPU, interpreter elsewhere (tests).
    """
    if interpret is None:
        interpret = not on_tpu()
    return _pallas_forward(labels, logits, weights, alpha, gamma, interpret)


def _fwd(labels, logits, weights, alpha, gamma, interpret):
    out = focal_loss_pallas(labels, logits, weights, alpha, gamma, interpret)
    return out, (labels, logits, weights)


def _bwd(alpha, gamma, interpret, res, g):
    """Analytic gradient of the stable focal loss w.r.t. logits.

    For z=1: L = α (1-p)^γ ce_pos, dL/dx = -α (1-p)^γ (γ p ce_pos + (1-p)).
    For z=0: L = (1-α) p^γ ce_neg, dL/dx = (1-α) p^γ (γ (1-p) ce_neg + p).
    (ce_pos = -log p, ce_neg = -log(1-p), dp/dx = p(1-p).)
    """
    labels, logits, weights = res
    z = labels.astype(jnp.float32)
    x = logits.astype(jnp.float32)
    log1p_term = jnp.log1p(jnp.exp(-jnp.abs(x)))
    ce_pos = log1p_term - jnp.minimum(x, 0.0)
    ce_neg = log1p_term + jnp.maximum(x, 0.0)
    p = jax.nn.sigmoid(x)
    dpos = -alpha * jnp.power(1.0 - p, gamma) * (
        gamma * p * ce_pos + (1.0 - p)
    )
    dneg = (1.0 - alpha) * jnp.power(p, gamma) * (
        gamma * (1.0 - p) * ce_neg + p
    )
    grad = z * dpos + (1.0 - z) * dneg
    if weights is not None:
        grad = grad * jnp.broadcast_to(
            weights.astype(jnp.float32), grad.shape
        )
    return (None, g * grad, None)


focal_loss_pallas.defvjp(_fwd, _bwd)
