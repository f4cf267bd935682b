"""Fused dense NMS (one-kernel selection+suppression) equivalence tests.

The fused path must match the two-stage ``select_top_k -> nms`` pipeline
exactly when ``top_k >= M`` (iterative argmax == stable descending sort
for greedy hard NMS). Reference behavior anchor: numpy NMS over all
decoded cells, `/root/reference/CenterNet/tf_centernet_resnet_s8.py:44-85`.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from detectax.ops.nms import dense_nms, nms, select_top_k
from detectax.ops.pallas.nms_kernel import (
    dense_nms_pallas,
    dense_nms_reference,
)


def _dense_candidates(rng, m=300, nc=8, span=500.0):
    y = rng.uniform(0, span, size=(m,)).astype(np.float32)
    x = rng.uniform(0, span, size=(m,)).astype(np.float32)
    h = rng.uniform(10, 90, size=(m,)).astype(np.float32)
    w = rng.uniform(10, 90, size=(m,)).astype(np.float32)
    boxes = np.stack([y, x, y + h, x + w], axis=-1)
    scores = rng.uniform(0, 1, size=(m,)).astype(np.float32)
    classes = rng.integers(0, nc, size=(m,)).astype(np.int32)
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes)


@pytest.mark.parametrize("class_aware", [True, False])
@pytest.mark.parametrize("score_thresh", [0.0, 0.3])
def test_dense_matches_two_stage(rng, class_aware, score_thresh):
    boxes, scores, classes = _dense_candidates(rng)
    m = boxes.shape[0]
    ref = nms(
        *select_top_k(boxes, jnp.eye(8)[classes] * scores[:, None], m),
        iou_thresh=0.5, score_thresh=score_thresh, max_outputs=50,
        class_aware=class_aware, use_pallas=False,
    )
    got = dense_nms(
        boxes, scores, classes, iou_thresh=0.5, score_thresh=score_thresh,
        max_outputs=50, class_aware=class_aware, use_pallas=False,
    )
    assert int(got["num_valid"]) == int(ref["num_valid"])
    nv = int(got["num_valid"])
    np.testing.assert_allclose(
        np.asarray(got["boxes"])[:nv], np.asarray(ref["boxes"])[:nv],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["scores"])[:nv], np.asarray(ref["scores"])[:nv],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got["classes"])[:nv], np.asarray(ref["classes"])[:nv]
    )
    assert not np.asarray(got["valid"])[nv:].any()


@pytest.mark.parametrize("class_aware", [True, False])
def test_pallas_interpret_matches_reference_twin(rng, class_aware):
    boxes, scores, classes = _dense_candidates(rng, m=200)
    a = dense_nms_pallas(
        boxes, scores, classes, iou_thresh=0.5, score_thresh=0.1,
        max_outputs=40, class_aware=class_aware, interpret=True,
    )
    b = dense_nms_reference(
        boxes, scores, classes, iou_thresh=0.5, score_thresh=0.1,
        max_outputs=40, class_aware=class_aware,
    )
    for key in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(
            np.asarray(a[key], np.float32), np.asarray(b[key], np.float32),
            rtol=1e-5, atol=1e-6,
        )
    assert int(a["num_valid"]) == int(b["num_valid"])


def test_all_below_threshold_yields_empty(rng):
    boxes, scores, classes = _dense_candidates(rng, m=100)
    out = dense_nms(
        boxes, scores * 0.01, classes, score_thresh=0.5, max_outputs=20,
        use_pallas=False,
    )
    assert int(out["num_valid"]) == 0
    assert not np.asarray(out["valid"]).any()
    assert (np.asarray(out["classes"]) == -1).all()


def test_max_outputs_truncation(rng):
    # many well-separated boxes: more survivors than max_outputs
    g = 8
    ys, xs = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    y = (ys * 200.0).ravel().astype(np.float32)
    x = (xs * 200.0).ravel().astype(np.float32)
    boxes = jnp.asarray(np.stack([y, x, y + 50, x + 50], axis=-1))
    scores = jnp.asarray(
        np.linspace(0.9, 0.1, g * g).astype(np.float32)
    )
    classes = jnp.zeros((g * g,), jnp.int32)
    out = dense_nms(
        boxes, scores, classes, max_outputs=10, use_pallas=False
    )
    assert int(out["num_valid"]) == 10
    # survivors come out in descending score order
    s = np.asarray(out["scores"])
    assert (np.diff(s) <= 1e-6).all()
    np.testing.assert_allclose(s[0], 0.9, rtol=1e-6)


def test_detections_from_dense_fused_matches_two_stage(rng):
    from detectax.infer import predict as P

    m, nc, b = 150, 8, 2
    boxes = []
    probs = []
    for _ in range(b):
        bx, sc, cl = _dense_candidates(rng, m=m, nc=nc)
        pr = np.zeros((m, nc), np.float32)
        pr[np.arange(m), np.asarray(cl)] = np.asarray(sc)
        boxes.append(np.asarray(bx))
        probs.append(pr)
    boxes = jnp.asarray(np.stack(boxes))
    probs = jnp.asarray(np.stack(probs))

    ref = P.detections_from_dense(
        boxes, probs, top_k=m, max_outputs=30, score_thresh=0.05,
        fused=False,
    )
    got = P.detections_from_dense(
        boxes, probs, top_k=m, max_outputs=30, score_thresh=0.05,
        fused=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got["num_valid"]), np.asarray(ref["num_valid"])
    )
    for i in range(b):
        nv = int(np.asarray(ref["num_valid"])[i])
        np.testing.assert_allclose(
            np.asarray(got["boxes"])[i, :nv],
            np.asarray(ref["boxes"])[i, :nv], rtol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(got["classes"])[i, :nv],
            np.asarray(ref["classes"])[i, :nv],
        )
