"""Pallas kernel A/B numerics tests (interpreter mode on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from detectax.ops import losses as L
from detectax.ops import nms as N
from detectax.ops.pallas.focal import focal_loss_pallas
from detectax.ops.pallas.nms_kernel import suppression_mask_pallas
from detectax.ops.pallas.peak_decode import (
    peak_scores_pallas,
    peak_scores_reference,
)


def test_focal_pallas_matches_xla(rng):
    labels = (rng.uniform(size=(4, 24, 24, 21)) < 0.05).astype(np.float32)
    logits = rng.normal(scale=4.0, size=(4, 24, 24, 21)).astype(np.float32)
    want = float(L.focal_loss(jnp.asarray(labels), jnp.asarray(logits)))
    got = float(focal_loss_pallas(jnp.asarray(labels), jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, rtol=2e-4)  # fp32 sum order


def test_focal_pallas_weighted(rng):
    labels = (rng.uniform(size=(8, 33)) < 0.2).astype(np.float32)
    logits = rng.normal(size=(8, 33)).astype(np.float32)
    weights = (rng.uniform(size=(8, 33)) < 0.5).astype(np.float32)
    want = float(
        L.focal_loss(jnp.asarray(labels), jnp.asarray(logits),
                     weights=jnp.asarray(weights))
    )
    got = float(
        focal_loss_pallas(jnp.asarray(labels), jnp.asarray(logits),
                          jnp.asarray(weights))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4)  # fp32 sum order


def test_focal_pallas_gradient_matches_xla(rng):
    labels = jnp.asarray(
        (rng.uniform(size=(128,)) < 0.3).astype(np.float32)
    )
    logits = jnp.asarray(rng.normal(scale=3.0, size=(128,)).astype(np.float32))
    g_want = jax.grad(lambda x: L.focal_loss(labels, x))(logits)
    g_got = jax.grad(lambda x: focal_loss_pallas(labels, x))(logits)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), atol=1e-5
    )


def test_nms_pallas_matches_xla_mask(rng):
    k = 64
    boxes = rng.uniform(0, 80, size=(k, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(k, 2))
    scores = np.sort(rng.uniform(size=(k,)).astype(np.float32))[::-1]
    from detectax.ops.boxes import pairwise_iou_corners

    iou = pairwise_iou_corners(jnp.asarray(boxes), jnp.asarray(boxes))
    want = np.asarray(N._suppression_mask(iou, 0.45))
    got = np.asarray(
        suppression_mask_pallas(jnp.asarray(boxes), 0.45)
    )
    np.testing.assert_array_equal(got, want)


def test_nms_pallas_valid_mask(rng):
    boxes = np.array(
        [[0, 0, 10, 10], [20, 20, 30, 30], [0, 0, 10, 10]], np.float32
    )
    valid = jnp.asarray([True, True, False])
    got = np.asarray(
        suppression_mask_pallas(jnp.asarray(boxes), 0.5, valid=valid)
    )
    np.testing.assert_array_equal(got, [True, True, False])


def test_peak_decode_matches_reference(rng):
    logits = rng.normal(scale=2.0, size=(32, 32, 5)).astype(np.float32)
    want = np.asarray(peak_scores_reference(jnp.asarray(logits)))
    got = np.asarray(peak_scores_pallas(jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # peaks are sparse: strictly fewer nonzeros than cells
    assert (got > 0).sum() < 32 * 32 * 5 * 0.5


def test_peak_decode_finds_injected_peak():
    logits = np.full((16, 16, 1), -8.0, np.float32)
    logits[5, 7, 0] = 4.0
    got = np.asarray(peak_scores_pallas(jnp.asarray(logits)))
    ys, xs, cs = np.nonzero(got > 0.5)
    assert list(zip(ys, xs)) == [(5, 7)]


def test_nms_pallas_class_aware_matches_xla(rng):
    k = 96
    boxes = rng.uniform(0, 60, size=(k, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(k, 2))
    classes = rng.integers(0, 3, size=(k,)).astype(np.int32)
    from detectax.ops.boxes import pairwise_iou_corners

    iou = pairwise_iou_corners(jnp.asarray(boxes), jnp.asarray(boxes))
    iou = iou * (classes[:, None] == classes[None, :])
    want = np.asarray(N._suppression_mask(iou, 0.45))
    got = np.asarray(
        suppression_mask_pallas(
            jnp.asarray(boxes), 0.45, classes=jnp.asarray(classes)
        )
    )
    np.testing.assert_array_equal(got, want)


def test_nms_use_pallas_flag_equals_default(rng):
    k = 128
    boxes = rng.uniform(0, 60, size=(k, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(k, 2))
    scores = rng.uniform(size=(k,)).astype(np.float32)
    classes = rng.integers(0, 4, size=(k,)).astype(np.int32)
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))
    for class_aware in (True, False):
        a = N.nms(*args, iou_thresh=0.4, class_aware=class_aware,
                  max_outputs=k, use_pallas=False)
        b = N.nms(*args, iou_thresh=0.4, class_aware=class_aware,
                  max_outputs=k, use_pallas=True)
        assert int(a["num_valid"]) == int(b["num_valid"])
        np.testing.assert_array_equal(
            np.asarray(a["valid"]), np.asarray(b["valid"])
        )
        np.testing.assert_allclose(
            np.asarray(a["boxes"]), np.asarray(b["boxes"])
        )


def test_nms_pallas_under_vmap(rng):
    k = 64
    boxes = rng.uniform(0, 60, size=(2, k, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 40, size=(2, k, 2))
    scores = rng.uniform(size=(2, k)).astype(np.float32)
    classes = rng.integers(0, 3, size=(2, k)).astype(np.int32)
    f = jax.vmap(
        lambda b, s, c: N.nms(b, s, c, max_outputs=16, use_pallas=True)
    )
    g = jax.vmap(
        lambda b, s, c: N.nms(b, s, c, max_outputs=16, use_pallas=False)
    )
    a = f(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))
    b = g(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))
    np.testing.assert_array_equal(
        np.asarray(a["valid"]), np.asarray(b["valid"])
    )
