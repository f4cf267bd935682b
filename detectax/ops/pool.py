"""3x3/stride-2 max pool with a select-and-scatter-free backward.

XLA differentiates ``lax.reduce_window``(max) into ``select-and-scatter``,
which the r4 per-op profile measured at 324 GB/s — 40% of HBM peak — and
0.52 ms of the flagship step (BASELINE.md r4: the stem maxpool backward is
one of the named worst ops). Select-and-scatter is a windowed *scatter*:
TPU executes it with serialized window writes instead of a vector pass.

This module reformulates the backward as pure elementwise algebra on the
pooled grid using a parity (space-to-depth) decomposition, so XLA lowers
it as ordinary vectorized loop fusions (the op class the same profile
measured at 835 GB/s ≈ HBM peak):

For a 3x3/stride-2 window, input row ``i`` belongs to at most 2 windows
per axis, determined by parity: ``i = 2k`` is covered by windows
``p ∈ {k-1, k}``, ``i = 2k+1`` only by ``p = k``. Splitting the input
into its 4 parity planes ``x[u::2, v::2]`` makes every (input, covering
window) pair a *static shift* on the pooled grid:

    dx[i,j] = Σ_{(p,q) covering} [x[i,j] == y[p,q]] · dy[p,q] / cnt[p,q]

where ``cnt`` (the per-window tie count) is 9 shifted comparisons on the
pooled grid, and the mask uses ``y[p,q] <= x[i,j]`` (equivalent to
equality, since the window max dominates its members). Total traffic:
x, y, dy read once, dx written once — the bandwidth floor for the op.

Tie semantics differ deliberately from select-and-scatter: gradient for
a tied window is *split* ``dy/cnt`` across the tied maxima instead of
all-to-the-first-in-scan-order. Both are valid subgradients of max; for
ReLU-preceded stems ties at 0 are common and the split version is the
symmetric choice. For tie-free inputs the gradients are identical
(tested against XLA's in ``tests/test_pool_vjp.py``).

Opt-in via ``DETECTAX_POOL_VJP=1`` (or ``tied_vjp=True``) until the A/B
is recorded in BASELINE.md; forward is bit-identical either way.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn


def _shift_pooled(a, dk, dl, fill):
    """a[k+dk, l+dl] with `fill` outside, on [..., K, L, C] pooled planes."""
    if dk:
        pad = [(0, 0)] * a.ndim
        if dk > 0:  # read ahead: a[k+dk]
            a = jnp.concatenate(
                [a[..., dk:, :, :], jnp.full_like(a[..., :dk, :, :], fill)],
                axis=-3,
            )
        else:
            a = jnp.concatenate(
                [jnp.full_like(a[..., :(-dk), :, :], fill),
                 a[..., :dk, :, :]],
                axis=-3,
            )
        del pad
    if dl:
        if dl > 0:
            a = jnp.concatenate(
                [a[..., :, dl:, :], jnp.full_like(a[..., :, :dl, :], fill)],
                axis=-2,
            )
        else:
            a = jnp.concatenate(
                [jnp.full_like(a[..., :, :(-dl), :], fill),
                 a[..., :, :dl, :]],
                axis=-2,
            )
    return a


def _pool_fwd_raw(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


def _pool_bwd_raw(x, y, dy):
    """The parity-decomposed backward. x: [B,H,W,C] with H,W even;
    y, dy: [B,H/2,W/2,C]."""
    neg = jnp.asarray(-jnp.inf, x.dtype)
    # parity planes on the pooled grid
    xp = {
        (u, v): x[..., u::2, v::2, :]
        for u in (0, 1)
        for v in (0, 1)
    }
    # window (p,q) covers rows {2p, 2p+1, 2p+2} = parity terms
    # (u=0, dk=0), (u=1, dk=0), (u=0, dk=+1); same for columns.
    ROW_TERMS = ((0, 0), (1, 0), (0, 1))

    # cnt[p,q] = number of window members equal to the max
    cnt = None
    for (u, dk) in ROW_TERMS:
        for (v, dl) in ROW_TERMS:
            member = _shift_pooled(xp[(u, v)], dk, dl, neg)
            eq = (member >= y).astype(jnp.float32)
            cnt = eq if cnt is None else cnt + eq
    w = dy.astype(jnp.float32) / cnt

    # dx parity planes: input (2k+u, 2l+v) is covered by windows
    # (k - dk, l - dl) for the same (u, dk) terms, read-shifted down.
    zero = jnp.asarray(0.0, jnp.float32)
    planes = {}
    for (u, v), xuv in xp.items():
        acc = None
        for (uu, dk) in ROW_TERMS:
            if uu != u:
                continue
            for (vv, dl) in ROW_TERMS:
                if vv != v:
                    continue
                y_c = _shift_pooled(y, -dk, -dl, neg)
                w_c = _shift_pooled(w, -dk, -dl, zero)
                take = (y_c <= xuv).astype(jnp.float32) * w_c
                acc = take if acc is None else acc + take
        planes[(u, v)] = acc

    # interleave the 4 parity planes back to input resolution
    b = x.shape[:-3]
    k, l, c = planes[(0, 0)].shape[-3:]
    rows0 = jnp.stack([planes[(0, 0)], planes[(0, 1)]], axis=-2)
    rows1 = jnp.stack([planes[(1, 0)], planes[(1, 1)]], axis=-2)
    # [..., K, L, 2, C] -> [..., K, 2L, C]
    rows0 = rows0.reshape(*b, k, 2 * l, c)
    rows1 = rows1.reshape(*b, k, 2 * l, c)
    dx = jnp.stack([rows0, rows1], axis=-3).reshape(*b, 2 * k, 2 * l, c)
    return dx.astype(x.dtype)


@jax.custom_vjp
def _max_pool_s2_tied(x):
    return _pool_fwd_raw(x)


def _tied_fwd(x):
    y = _pool_fwd_raw(x)
    return y, (x, y)


def _tied_bwd(res, dy):
    x, y = res
    return (_pool_bwd_raw(x, y, dy),)


_max_pool_s2_tied.defvjp(_tied_fwd, _tied_bwd)


def max_pool_3x3_s2(x, *, tied_vjp: bool | None = None):
    """``nn.max_pool(x, (3,3), strides=(2,2), padding="SAME")`` with an
    optional select-and-scatter-free backward (module docstring).

    ``tied_vjp=None`` consults ``DETECTAX_POOL_VJP=1``. The custom path
    requires even spatial dims (true for every stem in this codebase);
    odd dims fall back to the XLA derivative.
    """
    if tied_vjp is None:
        tied_vjp = os.environ.get("DETECTAX_POOL_VJP") == "1"
    if tied_vjp and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0:
        return _max_pool_s2_tied(x)
    return _pool_fwd_raw(x)
