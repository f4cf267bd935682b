import os

import jax.numpy as jnp
import numpy as np

from detectax.infer import predict as P
from detectax.infer.visualize import save_heatmap, visualize_detections
from detectax.ops import anchors as A
from detectax.ops import assign

NC = 4
IMG = (256, 256)


def _pad_gt(boxes, labels, n=16):
    gt = np.zeros((n, 4), np.float32)
    lb = np.zeros((n,), np.int32)
    vd = np.zeros((n,), bool)
    gt[: len(boxes)] = boxes
    lb[: len(labels)] = labels
    vd[: len(boxes)] = True
    return jnp.asarray(gt), jnp.asarray(lb), jnp.asarray(vd)


def _logit(p):
    return float(np.log(p / (1 - p)))


def test_fcos_gt_roundtrip_through_nms():
    """Encode GT -> build pseudo-logit maps -> decode -> NMS recovers GT.

    The exact version of the reference's visual GT-decode sanity check
    (train_fcos_center_voc.py:85-98 runs NMS on ground-truth maps).
    """
    boxes = [[0.5, 0.5, 0.3, 0.2], [0.2, 0.75, 0.1, 0.08]]
    labels = [1, 3]
    gt, lb, vd = _pad_gt(boxes, labels)
    maps, _ = assign.fcos_assign(gt, lb, vd, img_dim=IMG, num_classes=NC)

    # targets -> pseudo logits: one-hot {0,1} * 12 - 6 gives p≈0.998/0.002
    pseudo = []
    for m in maps:
        reg = m[..., :4]
        cen = m[..., 4:5] * 12.0 - 6.0
        cls = m[..., 5:] * 12.0 - 6.0
        pseudo.append(jnp.concatenate([reg, cen, cls], -1)[None])
    bx, pr = P.fcos_decode(pseudo, use_centerness=False)
    out = P.detections_from_dense(
        bx, pr, iou_thresh=0.5, score_thresh=0.5, max_outputs=8
    )
    n = int(out["num_valid"][0])
    assert n == 2
    got = np.asarray(out["boxes"][0][:n])
    want = []
    for y, x, h, w in boxes:
        want.append([
            (y - h / 2) * 256, (x - w / 2) * 256,
            (y + h / 2) * 256, (x + w / 2) * 256,
        ])
    # match by score order (classes distinguish them)
    got_cls = list(np.asarray(out["classes"][0][:n]))
    for wbox, wcls in zip(want, labels):
        idx = got_cls.index(wcls)
        # unclamped interior cells decode exactly; boundary cells up to
        # half a stride off -> NMS survivor is the max-score (center) cell
        np.testing.assert_allclose(got[idx], wbox, atol=17.0)


def test_fcos_center_v1_gt_roundtrip():
    boxes = [[0.4, 0.6, 0.3, 0.2]]
    gt, lb, vd = _pad_gt(boxes, [2])
    maps, _ = assign.fcos_center_v1_assign(
        gt, lb, vd, img_dim=IMG, num_classes=NC
    )
    pseudo = []
    for m in maps:
        reg = m[..., :4]
        rest = m[..., 4:] * 12.0 - 6.0
        pseudo.append(jnp.concatenate([reg, rest], -1)[None])
    box_scales = [32.0, 64.0, 128.0, 256.0, 256.0]
    bx, pr = P.fcos_center_v1_decode(pseudo, box_scales=box_scales)
    out = P.detections_from_dense(bx, pr, score_thresh=0.5, max_outputs=4)
    assert int(out["num_valid"][0]) == 1
    got = np.asarray(out["boxes"][0][0])
    want = [0.25 * 256, 0.5 * 256, 0.55 * 256, 0.7 * 256]
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_centernet_s8_gt_roundtrip():
    boxes = [[0.5, 0.5, 0.5, 0.25]]
    gt, lb, vd = _pad_gt(boxes, [1])
    scales = (32.0, 64.0, 128.0, 256.0, 512.0)
    m, _ = assign.centernet_scale_slot_assign(
        gt, lb, vd, img_dim=IMG, num_classes=NC, box_scales=scales
    )
    pseudo = jnp.concatenate(
        [m[..., :4], m[..., 4:] * 12.0 - 6.0], -1
    )[None]
    bx, pr = P.centernet_s8_decode(pseudo, box_scales=scales)
    out = P.detections_from_dense(bx, pr, score_thresh=0.5, max_outputs=4)
    assert int(out["num_valid"][0]) == 1
    got = np.asarray(out["boxes"][0][0])
    want = [0.25 * 256, 0.375 * 256, 0.75 * 256, 0.625 * 256]
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_retinanet_gt_roundtrip():
    anchors = A.anchor_shapes_per_level()
    boxes = [[0.5, 0.5, 0.25, 0.25]]
    gt, lb, vd = _pad_gt(boxes, [2])
    maps, _ = assign.retinanet_assign(
        gt, lb, vd, img_dim=IMG, num_classes=NC, anchors_per_level=anchors
    )
    pseudo = [
        jnp.concatenate([m[..., :4], m[..., 4:] * 12.0 - 6.0], -1)[None]
        for m in maps
    ]
    bx, pr = P.retinanet_decode(pseudo, anchors_per_level=anchors)
    out = P.detections_from_dense(bx, pr, score_thresh=0.5, max_outputs=8)
    assert int(out["num_valid"][0]) >= 1
    got = np.asarray(out["boxes"][0][0])
    np.testing.assert_allclose(got, [96, 96, 160, 160], atol=0.1)


def test_hourglass_decode_shapes():
    out = jnp.zeros((2, 16, 16, 4, 5 + NC))
    bx, pr = P.hourglass_decode(out, box_scales=(16, 32, 64, 128))
    assert bx.shape == (2, 16 * 16 * 4, 4)
    assert pr.shape == (2, 16 * 16 * 4, NC)


def test_visualize_outputs_files(tmp_path):
    img = np.random.default_rng(0).uniform(-1, 1, (64, 64, 3))
    f1 = visualize_detections(
        img, [[10, 10, 40, 40]], [1], [0.9],
        {1: "cat"}, out_file=str(tmp_path / "det.jpg"),
    )
    f2 = save_heatmap(
        np.random.default_rng(0).uniform(0, 1, (16, 16)),
        out_file=str(tmp_path / "hm.jpg"), image=img,
    )
    assert os.path.getsize(f1) > 1000
    assert os.path.getsize(f2) > 1000


def test_centernet_heatmap_decode_peaks():
    """Peak mask keeps only 3x3 local maxima; boxes decode ltrb at s8."""
    h = w = 16
    c = NC + 1  # objectness slot at 0
    out = np.full((1, h, w, 5 + c), -8.0, np.float32)
    # a clear peak for class 2 (real class 1 after slot drop) at cell (4, 5)
    out[0, 3:6, 4:7, 5 + 2] = _logit(0.6)
    out[0, 4, 5, 5 + 2] = _logit(0.9)
    out[0, 4, 5, 4] = _logit(0.9)   # centerness
    out[0, 4, 5, :4] = [2.0, 2.0, 3.0, 3.0]  # t,b,l,r in stride units
    boxes, probs = P.centernet_heatmap_decode(jnp.asarray(out))
    assert boxes.shape == (1, h * w, 4)
    assert probs.shape == (1, h * w, NC)
    pr = np.asarray(probs)[0].reshape(h, w, NC)
    # only the peak cell survives for class 1; neighbors masked to 0
    assert pr[4, 5, 1] > 0.5
    assert pr[3, 5, 1] == 0.0 and pr[4, 6, 1] == 0.0
    bx = np.asarray(boxes)[0].reshape(h, w, 4)
    # cell center (4.5, 5.5) * 8, minus/plus ltrb * 8
    np.testing.assert_allclose(
        bx[4, 5], [(4.5 - 2) * 8, (5.5 - 3) * 8, (4.5 + 2) * 8, (5.5 + 3) * 8]
    )
    # fed through the standard NMS path it yields exactly one detection
    dets = P.detections_from_dense(boxes, probs, score_thresh=0.3,
                                   max_outputs=8, top_k=64)
    assert int(dets["num_valid"][0]) == 1
    assert int(dets["classes"][0][0]) == 1


def test_detections_class_aware_candidates():
    """One box scoring high under two classes surfaces twice (TF
    combined-NMS semantics) only with class_aware_candidates=True."""
    boxes = jnp.asarray([[[10.0, 10.0, 50.0, 50.0]]])  # [1,1,4]
    probs = jnp.asarray([[[0.9, 0.8, 0.01, 0.01]]])    # [1,1,4]
    d_max = P.detections_from_dense(boxes, probs, top_k=4, max_outputs=4,
                                    score_thresh=0.1)
    assert int(d_max["num_valid"][0]) == 1
    d_all = P.detections_from_dense(boxes, probs, top_k=4, max_outputs=4,
                                    score_thresh=0.1,
                                    class_aware_candidates=True)
    assert int(d_all["num_valid"][0]) == 2
    kept = np.asarray(d_all["classes"][0][: 2])
    assert set(kept.tolist()) == {0, 1}
