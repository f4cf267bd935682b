"""detectax BatchNorm drop-in vs flax nn.BatchNorm parity + subset mode."""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from detectax.models import layers as L


def _apply(mod_cls, x, train, variables=None, **kw):
    m = mod_cls(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                **kw)
    if variables is None:
        variables = m.init(jax.random.PRNGKey(0), x)
    if train:
        y, mut = m.apply(variables, x, mutable=["batch_stats"])
        return y, {**variables, "batch_stats": mut["batch_stats"]}
    return m.apply(variables, x), variables


@pytest.mark.parametrize("train", [True, False])
def test_matches_flax_batchnorm(rng, train):
    x = jnp.asarray(rng.normal(size=(8, 6, 6, 16)).astype(np.float32))
    y_ref, v_ref = _apply(nn.BatchNorm, x, train)
    y_got, v_got = _apply(L.BatchNorm, x, train)
    np.testing.assert_allclose(
        np.asarray(y_got), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(v_got["batch_stats"]["mean"]),
            np.asarray(v_ref["batch_stats"]["mean"]), rtol=1e-6,
        )


def test_param_structure_identical(rng):
    x = jnp.zeros((2, 4, 4, 8))
    v_ref = nn.BatchNorm(use_running_average=False).init(
        jax.random.PRNGKey(0), x
    )
    v_got = L.BatchNorm(use_running_average=False).init(
        jax.random.PRNGKey(0), x
    )
    assert jax.tree_util.tree_structure(v_ref) == \
        jax.tree_util.tree_structure(v_got)


def test_subset_stats_mode(rng, monkeypatch):
    monkeypatch.setenv("DETECTAX_BN_STAT_SUBSET", "4")
    x_np = rng.normal(size=(8, 6, 6, 16)).astype(np.float32)
    x = jnp.asarray(x_np)
    y, v = _apply(L.BatchNorm, x, train=True)
    # stats must come from the first 2 examples only
    sub = x_np[:2].astype(np.float64)
    mean = sub.mean(axis=(0, 1, 2))
    var = (sub ** 2).mean(axis=(0, 1, 2)) - mean ** 2
    expect = (x_np - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=2e-4, atol=2e-4)
    # running stats updated from the subset statistics
    np.testing.assert_allclose(
        np.asarray(v["batch_stats"]["mean"]), 0.1 * mean, rtol=2e-4,
        atol=1e-6,
    )
    # eval path ignores the subset knob
    y_eval, _ = _apply(L.BatchNorm, x, train=False, variables=v)
    assert np.isfinite(np.asarray(y_eval)).all()


def test_subset_disabled_matches_full(rng, monkeypatch):
    x = jnp.asarray(rng.normal(size=(4, 5, 5, 8)).astype(np.float32))
    monkeypatch.delenv("DETECTAX_BN_STAT_SUBSET", raising=False)
    y0, _ = _apply(L.BatchNorm, x, train=True)
    monkeypatch.setenv("DETECTAX_BN_STAT_SUBSET", "1")
    y1, _ = _apply(L.BatchNorm, x, train=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
