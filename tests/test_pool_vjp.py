"""ops/pool.py: select-and-scatter-free 3x3/s2 max-pool backward.

Forward must be bit-identical to ``nn.max_pool``; the custom backward
must match XLA's derivative exactly on tie-free inputs, and on tied
inputs must remain a valid subgradient: per-window gradient mass
preserved (Σ dx == Σ dy) and split evenly across tied maxima.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from detectax.ops.pool import _max_pool_s2_tied, max_pool_3x3_s2


def _xla_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 12, 16, 5)])
def test_forward_matches_xla(shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_max_pool_s2_tied(x)), np.asarray(_xla_pool(x))
    )


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 12, 16, 5), (3, 6, 6, 2)])
def test_grad_matches_xla_when_tie_free(shape):
    # continuous random input: ties have probability zero
    x = jnp.asarray(np.random.default_rng(1).normal(size=shape), jnp.float32)
    dy = np.random.default_rng(2).normal(
        size=_xla_pool(x).shape).astype(np.float32)
    g_ours = jax.grad(lambda t: jnp.sum(_max_pool_s2_tied(t) * dy))(x)
    g_xla = jax.grad(lambda t: jnp.sum(_xla_pool(t) * dy))(x)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_xla),
                               rtol=1e-6, atol=1e-6)


def test_grad_mass_preserved_with_ties():
    # all-equal input: every window fully tied (the post-ReLU zero plateau
    # case the stem actually hits)
    x = jnp.zeros((1, 8, 8, 2), jnp.float32)
    dy = np.abs(np.random.default_rng(3).normal(
        size=_xla_pool(x).shape)).astype(np.float32)
    g = jax.grad(lambda t: jnp.sum(_max_pool_s2_tied(t) * dy))(x)
    np.testing.assert_allclose(float(jnp.sum(g)), float(np.sum(dy)),
                               rtol=1e-5)
    # interior fully-tied window: gradient split evenly across 9 members
    x2 = jnp.zeros((1, 6, 6, 1), jnp.float32)
    dy2 = np.zeros((1, 3, 3, 1), np.float32)
    dy2[0, 1, 1, 0] = 9.0  # window covering rows/cols 2..4 exactly
    g2 = np.asarray(jax.grad(
        lambda t: jnp.sum(_max_pool_s2_tied(t) * dy2))(x2))
    np.testing.assert_allclose(g2[0, 2:5, 2:5, 0], np.ones((3, 3)),
                               rtol=1e-6)


def test_bf16_forward_and_finite_grad():
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 8, 8, 4)),
                    jnp.bfloat16)
    y = _max_pool_s2_tied(x)
    assert y.dtype == jnp.bfloat16
    g = jax.grad(lambda t: jnp.sum(
        _max_pool_s2_tied(t).astype(jnp.float32)))(x)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_env_flag_and_odd_dims_fallback(monkeypatch):
    monkeypatch.setenv("DETECTAX_POOL_VJP", "1")
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 7, 7, 2)),
                    jnp.float32)
    # odd dims: falls back to XLA pool (no crash), same forward
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2(x)), np.asarray(_xla_pool(x))
    )
    x2 = jnp.asarray(np.random.default_rng(6).normal(size=(1, 8, 8, 2)),
                     jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2(x2)), np.asarray(_xla_pool(x2))
    )


def test_backbone_grads_unchanged_with_flag(monkeypatch):
    """ResNet tiny backbone: loss grads with the flag on equal XLA's on
    tie-free input (the swap is gradient-transparent in the model)."""
    from detectax.models.backbones import ResNet

    x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 16, 16, 3)),
                    jnp.float32)
    model = ResNet(stage_sizes=(1, 1), width=8)
    params = model.init(jax.random.key(0), x, train=False)

    def loss(p, flag):
        monkeypatch.setenv("DETECTAX_POOL_VJP", "1" if flag else "0")
        taps = model.apply(p, x, train=False)
        taps = taps if isinstance(taps, (list, tuple)) else [taps]
        leaves = jax.tree.leaves(taps)
        return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in leaves)

    g_on = jax.grad(lambda p: loss(p, True))(params)
    g_off = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
