"""Real-TPU exactness tests for the assignment one-hot contractions.

The r4 gather→one-hot-matmul rewrite (`ops/assign.py::_select_rows`) is
exact only if the contraction does not demote the stacked table to bf16:
TPU DEFAULT f32 matmul does exactly that, rounding pixel coordinates
(>2^8) and areas (~1e5) — measured on v5e: 409601.0 selected at DEFAULT
precision returns 409600.0. These tests pin the HIGHEST-precision fix by
running the real kernels on hardware against a numpy gather oracle.
"""
import numpy as np
import jax
import jax.numpy as jnp

from detectax.ops.assign import _select_rows, fcos_assign


def test_select_rows_exact_large_values_on_tpu():
    rng = np.random.default_rng(0)
    n = 16
    owner = jnp.asarray(rng.integers(0, n, (37, 53)).astype(np.int32))
    # bf16-hostile values: large areas, odd pixel coords, halves
    area = jnp.asarray(
        (rng.uniform(100, 640, n) * rng.uniform(100, 640, n))
        .astype(np.float32)
    )
    coord = jnp.asarray(
        (rng.integers(0, 1280, n) + 0.5).astype(np.float32)
    )
    flag = jnp.asarray(rng.integers(0, 2, n).astype(bool))
    idx = jnp.asarray(rng.integers(0, 4096, n).astype(np.int32))
    mat = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 1e4)

    got = jax.jit(_select_rows)(owner, area, coord, flag, idx, mat)
    own = np.asarray(owner)
    expected = [
        np.asarray(area)[own], np.asarray(coord)[own],
        np.asarray(flag)[own], np.asarray(idx)[own], np.asarray(mat)[own],
    ]
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(np.asarray(g), e)


def test_fcos_assign_matches_cpu_oracle_on_tpu():
    """Full assigner on hardware == the same assigner on CPU (the config
    every oracle/TF-parity suite validates)."""
    rng = np.random.default_rng(1)
    n, nc, img = 16, 8, 384
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0.2, 0.8, n)
    boxes[:, 1] = rng.uniform(0.2, 0.8, n)
    boxes[:, 2] = rng.uniform(0.05, 0.6, n)
    boxes[:, 3] = rng.uniform(0.05, 0.6, n)
    labels = rng.integers(0, nc, n).astype(np.int32)
    valid = np.ones(n, bool)
    valid[10:] = False

    def run(device):
        with jax.default_device(device):
            outs, _ = jax.jit(
                lambda b, l, v: fcos_assign(
                    b, l, v, img_dim=(img, img), num_classes=nc
                )
            )(jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid))
        return [np.asarray(o) for o in jax.tree_util.tree_leaves(outs)]

    tpu_out = run(jax.devices()[0])
    cpu_out = run(jax.devices("cpu")[0])
    # 1e-6: the centerness channel is sqrt(divide(...)) and may differ by
    # ulps across backends; every selected/geometric value must agree far
    # tighter than bf16 demotion error (which is ~1e-3 relative).
    for t, c in zip(tpu_out, cpu_out):
        np.testing.assert_allclose(t, c, rtol=1e-6, atol=1e-6)
