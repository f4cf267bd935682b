import jax.numpy as jnp
import numpy as np

from detectax.ops import nms as N


def _np_greedy_nms(boxes, scores, thresh):
    """Pure-python greedy NMS oracle (mirrors reference
    RetinaNet/retinanet_module.py:453-481 cpu_nms)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores)
    keep = []
    while len(order) > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        ovr = inter / (areas[i] + areas[order[1:]] - inter + 1e-8)
        order = order[1:][ovr <= thresh]
    return keep


def _random_dets(rng, k=64, c=3):
    boxes = rng.uniform(0, 80, size=(k, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(k, 2))
    scores = rng.uniform(size=(k,)).astype(np.float32)
    classes = rng.integers(0, c, size=(k,)).astype(np.int32)
    return boxes, scores, classes


def test_class_agnostic_nms_matches_cpu_oracle(rng):
    boxes, scores, classes = _random_dets(rng)
    out = N.nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        iou_thresh=0.4, class_aware=False, max_outputs=64,
    )
    keep = _np_greedy_nms(boxes, scores, 0.4)
    got_n = int(out["num_valid"])
    assert got_n == len(keep)
    want_boxes = boxes[keep]  # oracle returns score-descending order
    np.testing.assert_allclose(
        np.asarray(out["boxes"])[:got_n], want_boxes, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["scores"])[:got_n], scores[keep], atol=1e-6
    )


def test_class_aware_keeps_overlapping_different_classes():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.asarray([0, 1], dtype=jnp.int32)
    out_aware = N.nms(boxes, scores, classes, class_aware=True, max_outputs=4)
    assert int(out_aware["num_valid"]) == 2
    out_agn = N.nms(boxes, scores, classes, class_aware=False, max_outputs=4)
    assert int(out_agn["num_valid"]) == 1


def test_class_wise_nms_matches_per_class_oracle(rng):
    boxes, scores, classes = _random_dets(rng, k=96, c=4)
    out = N.nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        iou_thresh=0.45, class_aware=True, max_outputs=96,
    )
    want = set()
    for c in np.unique(classes):
        idx = np.where(classes == c)[0]
        for k in _np_greedy_nms(boxes[idx], scores[idx], 0.45):
            want.add(idx[k])
    assert int(out["num_valid"]) == len(want)


def test_score_threshold_filters():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], dtype=jnp.float32
    )
    scores = jnp.asarray([0.9, 0.4, 0.05])
    classes = jnp.zeros(3, dtype=jnp.int32)
    out = N.nms(boxes, scores, classes, score_thresh=0.3, max_outputs=3)
    assert int(out["num_valid"]) == 2
    assert bool(np.all(np.asarray(out["valid"])[:2]))


def test_soft_nms_decays_overlaps():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.zeros(3, dtype=jnp.int32)
    out = N.nms(
        boxes, scores, classes, mode="soft", soft_sigma=0.3,
        class_aware=False, max_outputs=3, score_thresh=0.0,
    )
    s = np.asarray(out["scores"])
    # overlapping 2nd box decayed but kept; far box untouched
    assert int(out["num_valid"]) == 3
    assert s[0] == np.float32(0.9)
    decayed = [v for v in s if 0 < v < 0.7]
    assert len(decayed) == 1


def test_select_top_k_modes(rng):
    boxes, _, _ = _random_dets(rng, k=32)
    cls_scores = rng.uniform(size=(32, 5)).astype(np.float32)
    b, s, c = N.select_top_k(jnp.asarray(boxes), jnp.asarray(cls_scores), 8)
    assert b.shape == (8, 4) and s.shape == (8,) and c.shape == (8,)
    want = np.sort(cls_scores.max(-1))[::-1][:8]
    np.testing.assert_allclose(np.sort(np.asarray(s))[::-1], want, atol=1e-6)
    # class-aware candidates may select one box under several classes
    b2, s2, c2 = N.select_top_k(
        jnp.asarray(boxes), jnp.asarray(cls_scores), 8, class_aware_candidates=True
    )
    want2 = np.sort(cls_scores.ravel())[::-1][:8]
    np.testing.assert_allclose(np.sort(np.asarray(s2))[::-1], want2, atol=1e-6)


def test_batched_nms_shape(rng):
    boxes, scores, classes = _random_dets(rng, k=16)
    bb = jnp.stack([jnp.asarray(boxes)] * 2)
    bs = jnp.stack([jnp.asarray(scores)] * 2)
    bc = jnp.stack([jnp.asarray(classes)] * 2)
    out = N.batched_nms(bb, bs, bc, max_outputs=10)
    assert out["boxes"].shape == (2, 10, 4)
    assert out["valid"].shape == (2, 10)


def test_num_valid_clamped_to_max_outputs(rng):
    boxes, scores, classes = _random_dets(rng, k=64)
    # spread boxes far apart so nothing suppresses
    boxes = boxes + np.arange(64, dtype=np.float32)[:, None] * 1000.0
    out = N.nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        class_aware=False, max_outputs=10,
    )
    assert int(out["num_valid"]) == 10
    assert bool(np.all(np.asarray(out["valid"])))


def test_class_aware_exact_at_high_class_ids():
    """Cross-class masking is exact (the old class-offset-coordinate trick
    quantized small boxes at COCO-scale class ids, ADVICE r1)."""
    # two tiny, heavily overlapping boxes, same high class id -> suppress
    boxes = jnp.asarray(
        [[100.0, 100.0, 101.5, 101.5], [100.2, 100.2, 101.7, 101.7],
         [100.2, 100.2, 101.7, 101.7]], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([79, 79, 78], dtype=jnp.int32)
    out = N.nms(boxes, scores, classes, iou_thresh=0.3, class_aware=True,
                max_outputs=4)
    assert int(out["num_valid"]) == 2  # same-class dup gone, class-78 kept
    kept = np.asarray(out["classes"])[np.asarray(out["valid"])]
    assert set(kept.tolist()) == {79, 78}
    # kept boxes are bit-exact (no coordinate shifting round trip)
    np.testing.assert_array_equal(
        np.asarray(out["boxes"])[0], np.asarray(boxes)[0])
