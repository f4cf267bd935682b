"""Direct numeric parity against the ACTUAL TensorFlow reference code.

Imports the reference modules from /root/reference (TF 2.x eager), feeds
identical random inputs to both the reference functions and the detectax
ops, and asserts agreement within fp32 tolerance. This closes the loop the
hand-transcribed numpy oracles cannot: the same misreading can't be encoded
twice when one side is the reference itself.

Functions diffed end-to-end:
  * `FCOS/fcos.py` focal_loss / smooth_l1_loss / iou_loss /
    prediction_to_corners / format_data
  * `FCOS/fcos_center_v1.py` prediction_to_corners
  * `CenterNet/tf_centernet_resnet_s8.py` format_data / nms (hard + soft)
  * `RetinaNet/retinanet_module.py` format_data (ratio-1 anchors; the
    reference's anchor (h,w)-transposition quirk for ratio != 1 is
    documented in PARITY.md)

Documented deviations masked out here: overlapping-GT overwrite order
(boxes kept non-overlapping) and multi-GT anchor collisions (single GT).
"""
from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from detectax.ops import anchors as anchor_lib  # noqa: E402
from detectax.ops import assign  # noqa: E402
from detectax.ops import boxes as box_lib  # noqa: E402
from detectax.ops import losses as loss_lib  # noqa: E402
from detectax.ops import nms as nms_lib  # noqa: E402

REF = "/root/reference"


def _load(name: str, path: str, extra_sys_path=()):
    added = [p for p in extra_sys_path if p not in sys.path]
    sys.path[0:0] = added
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        for p in added:
            sys.path.remove(p)
        # keep the per-directory 'utils' from leaking between families
        sys.modules.pop("utils", None)
    return mod


@pytest.fixture(scope="module")
def ref_fcos():
    return _load("ref_fcos", f"{REF}/FCOS/fcos.py")


@pytest.fixture(scope="module")
def ref_fcos_v1():
    return _load("ref_fcos_v1", f"{REF}/FCOS/fcos_center_v1.py")


@pytest.fixture(scope="module")
def ref_s8():
    return _load(
        "ref_s8", f"{REF}/CenterNet/tf_centernet_resnet_s8.py"
    )


@pytest.fixture(scope="module")
def ref_retinanet():
    # the 2021-era reference uses the `np.int` alias (removed in numpy
    # 1.24, retinanet_module.py:304); restore it for the legacy code only
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    # classification_models (ResNeXt zoo) is not installed; the module
    # imports it at top level but format_data never touches it.
    if "classification_models" not in sys.modules:
        pkg = types.ModuleType("classification_models")
        sub = types.ModuleType("classification_models.tfkeras")
        sub.Classifiers = None
        pkg.tfkeras = sub
        sys.modules["classification_models"] = pkg
        sys.modules["classification_models.tfkeras"] = sub
    return _load(
        "ref_retinanet",
        f"{REF}/RetinaNet/retinanet_module.py",
        extra_sys_path=(f"{REF}/RetinaNet",),
    )


def test_focal_loss_matches_reference(ref_fcos):
    rng = np.random.default_rng(0)
    labels = (rng.uniform(size=(6, 7, 9)) > 0.8).astype(np.float32)
    logits = rng.normal(scale=6.0, size=(6, 7, 9)).astype(np.float32)
    logits[0, 0, :3] = [40.0, -40.0, 0.0]  # extremes
    want = float(ref_fcos.focal_loss(
        tf.constant(labels), tf.constant(logits)
    ))
    got = float(loss_lib.focal_loss(jnp.asarray(labels), jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_l1_matches_reference(ref_fcos):
    rng = np.random.default_rng(1)
    y_true = rng.normal(size=(5, 5, 4)).astype(np.float32)
    y_pred = rng.normal(size=(5, 5, 4)).astype(np.float32)
    mask = (rng.uniform(size=(5, 5)) > 0.5).astype(np.float32)
    want = float(ref_fcos.smooth_l1_loss(
        tf.constant(y_true), tf.constant(y_pred), mask=tf.constant(mask)
    ))
    got = float(loss_lib.smooth_l1_loss(
        jnp.asarray(y_true), jnp.asarray(y_pred), mask=jnp.asarray(mask)
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_iou_loss_matches_reference(ref_fcos):
    rng = np.random.default_rng(2)
    ltrb_true = rng.uniform(0.2, 4.0, size=(6, 6, 4)).astype(np.float32)
    ltrb_pred = rng.uniform(0.2, 4.0, size=(6, 6, 4)).astype(np.float32)
    mask = (rng.uniform(size=(6, 6)) > 0.4).astype(np.float32)
    want = float(ref_fcos.iou_loss(
        tf.constant(ltrb_true), tf.constant(ltrb_pred), tf.constant(mask)
    ))
    got = float(loss_lib.iou_loss(
        jnp.asarray(ltrb_true), jnp.asarray(ltrb_pred), jnp.asarray(mask)
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_fcos_decode_matches_reference(ref_fcos):
    rng = np.random.default_rng(3)
    pred = rng.uniform(0.0, 5.0, size=(8, 10, 4)).astype(np.float32)
    want = np.asarray(
        ref_fcos.prediction_to_corners(tf.constant(pred), 16)
    )
    got = np.asarray(box_lib.ltrb_to_corners(jnp.asarray(pred), 16.0))
    # reference corner order is (y1, x1, y2, x2) via indices 0,1,2,3
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fcos_center_v1_decode_matches_reference(ref_fcos_v1):
    rng = np.random.default_rng(4)
    pred = rng.uniform(0.0, 1.0, size=(8, 10, 4)).astype(np.float32)
    want = np.asarray(
        ref_fcos_v1.prediction_to_corners(tf.constant(pred), 64.0, 8)
    )
    got = np.asarray(
        box_lib.offset_scale_to_corners(jnp.asarray(pred), 64.0, 8.0)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def _pad(gt_yxhw, labels, n=16):
    g = np.zeros((n, 4), np.float32)
    l = np.zeros((n,), np.int32)
    v = np.zeros((n,), bool)
    k = len(gt_yxhw)
    if k:
        g[:k] = gt_yxhw
        l[:k] = labels
        v[:k] = True
    return jnp.asarray(g), jnp.asarray(l), jnp.asarray(v)


# Non-overlapping, interior, well-sized boxes — masks out the documented
# overwrite-order deviation so parity is exact.
FCOS_BOXES = [
    [0.20, 0.20, 0.10, 0.12],   # small -> low level
    [0.65, 0.30, 0.30, 0.28],   # medium
    [0.55, 0.75, 0.08, 0.06],   # small, elsewhere
]
FCOS_LABELS = [1, 3, 0]


def test_fcos_format_data_matches_reference(ref_fcos):
    nc = 4
    img_dim = (256, 256)
    gt = np.asarray(
        [b + [float(c)] for b, c in zip(FCOS_BOXES, FCOS_LABELS)],
        np.float32,
    )
    want_maps, want_counts = ref_fcos.format_data(
        tf.constant(gt), list(img_dim), nc
    )
    g, l, v = _pad(FCOS_BOXES, FCOS_LABELS)
    got_maps, _ = assign.fcos_assign(
        g, l, v, img_dim=img_dim, num_classes=nc
    )
    assert len(want_maps) == len(got_maps) == 5
    for lvl, (want, got) in enumerate(zip(want_maps, got_maps)):
        got = np.asarray(got)
        want = np.asarray(want)
        assert got.shape == want.shape, lvl
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4,
            err_msg=f"fcos level {lvl}",
        )


def test_centernet_s8_format_data_matches_reference(ref_s8):
    nc = 3
    img_dim = [256, 256]
    box_scales = [32.0, 64.0, 128.0, 256.0, 512.0]
    boxes = [
        [0.30, 0.40, 0.10, 0.12],
        [0.70, 0.60, 0.45, 0.40],
        [0.15, 0.80, 0.05, 0.07],
    ]
    labels = [0, 2, 1]
    gt = np.asarray(
        [b + [float(c)] for b, c in zip(boxes, labels)], np.float32
    )
    want, want_n = ref_s8.format_data(
        tf.constant(gt), box_scales, img_dim, nc
    )
    g, l, v = _pad(boxes, labels)
    got, got_n = assign.centernet_scale_slot_assign(
        g, l, v, img_dim=tuple(img_dim), num_classes=nc,
        box_scales=box_scales,
    )
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert int(np.asarray(got_n)) == int(want_n)


def test_centernet_s8_format_data_center_pad_matches_reference(ref_s8):
    nc = 2
    img_dim = [192, 192]
    img_pad = [256, 256]
    box_scales = [32.0, 64.0, 128.0, 256.0]
    boxes = [[0.45, 0.55, 0.20, 0.25]]
    labels = [1]
    gt = np.asarray(
        [b + [float(c)] for b, c in zip(boxes, labels)], np.float32
    )
    want, _ = ref_s8.format_data(
        tf.constant(gt), box_scales, img_dim, nc, img_pad=img_pad
    )
    g, l, v = _pad(boxes, labels)
    got, _ = assign.centernet_scale_slot_assign(
        g, l, v, img_dim=tuple(img_dim), img_pad=tuple(img_pad),
        num_classes=nc, box_scales=box_scales,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def _random_dets(rng, k=24, c=3, span=80.0):
    # (xmin, ymin, width, height, score, class) — the reference nms layout
    x = rng.uniform(0, span, size=(k,)).astype(np.float32)
    y = rng.uniform(0, span, size=(k,)).astype(np.float32)
    w = rng.uniform(4, 24, size=(k,)).astype(np.float32)
    h = rng.uniform(4, 24, size=(k,)).astype(np.float32)
    s = rng.uniform(0.05, 1.0, size=(k,)).astype(np.float32)
    cls = rng.integers(0, c, size=(k,)).astype(np.float32)
    return np.stack([x, y, w, h, s, cls], axis=-1)


def _ours_from_ref_layout(dets):
    # reference layout -> corner boxes (y1, x1, y2, x2) + scores + classes
    x1 = dets[:, 0]
    y1 = dets[:, 1]
    x2 = dets[:, 0] + dets[:, 2]
    y2 = dets[:, 1] + dets[:, 3]
    boxes = np.stack([y1, x1, y2, x2], axis=-1)
    return (
        jnp.asarray(boxes),
        jnp.asarray(dets[:, 4]),
        jnp.asarray(dets[:, 5].astype(np.int32)),
    )


def test_hard_nms_matches_reference(ref_s8):
    rng = np.random.default_rng(7)
    dets = _random_dets(rng)
    want = ref_s8.nms(dets.copy(), 0.4, method="nms")
    boxes, scores, classes = _ours_from_ref_layout(dets)
    got = nms_lib.nms(
        boxes, scores, classes, iou_thresh=0.4, class_aware=True,
        max_outputs=dets.shape[0],
    )
    nv = int(got["num_valid"])
    assert nv == len(want)
    # compare kept (score, class) multisets (reference returns corner-ized
    # rows (x1, y1, x2, y2, score, class))
    want_keys = sorted((round(float(r[4]), 5), int(r[5])) for r in want)
    got_keys = sorted(
        (round(float(s), 5), int(c))
        for s, c in zip(
            np.asarray(got["scores"])[:nv], np.asarray(got["classes"])[:nv]
        )
    )
    assert got_keys == want_keys


def test_soft_nms_matches_reference(ref_s8):
    """Soft-NMS decayed scores AND the >0 drop rule match
    `tf_centernet_resnet_s8.py:76-85` (r1 VERDICT weak #5)."""
    rng = np.random.default_rng(8)
    dets = _random_dets(rng, k=16, c=2, span=40.0)  # denser -> real decay
    want = ref_s8.nms(dets.copy(), 0.4, sigma=0.3, method="soft-nms")
    boxes, scores, classes = _ours_from_ref_layout(dets)
    got = nms_lib.nms(
        boxes, scores, classes, class_aware=True, mode="soft",
        soft_sigma=0.3, max_outputs=dets.shape[0], score_thresh=0.0,
    )
    nv = int(got["num_valid"])
    assert nv == len(want)
    want_scores = sorted(round(float(r[4]), 4) for r in want)
    got_scores = sorted(
        round(float(s), 4) for s in np.asarray(got["scores"])[:nv]
    )
    assert got_scores == want_scores


def test_retinanet_format_data_matches_reference(ref_retinanet):
    """Anchor-IoU assignment vs the reference method (ratio-1.0 anchors,
    single GT — masks the documented multi-GT collision deviation and the
    reference's anchor (h,w) transposition for ratio != 1)."""
    nc = 3
    img_dim = [256, 256]
    anchor_sizes = [20.0, 40.0, 80.0, 160.0, 320.0]
    ratios = [1.0]
    scales = [2.0 ** x for x in (0.0, 1.0 / 3.0, 2.0 / 3.0)]

    stub = types.SimpleNamespace(
        anchor_sizes=anchor_sizes,
        aspect_ratios=ratios,
        anchor_scales=scales,
        n_class=nc,
        strides=[8, 16, 32, 64, 128],
        n_anchors=len(ratios) * len(scales),
        box_areas=sorted(x ** 2 for x in anchor_sizes),
        id_2_label={i: str(i) for i in range(nc)},
    )
    anchor_boxes = []
    for area in stub.box_areas:
        level = []
        for ratio in ratios:
            ah = float(np.sqrt(area / ratio))
            aw = area / ah
            for sc in scales:
                level.append(sc * np.array([ah, aw]))
        anchor_boxes.append(level)
    stub.anchor_boxes = anchor_boxes
    stub.get_anchors = ref_retinanet.RetinaNet.get_anchors.__get__(stub)

    boxes = [[0.45, 0.55, 0.25, 0.25]]
    labels = [2]
    gt = np.asarray(
        [b + [float(c)] for b, c in zip(boxes, labels)], np.float32
    )
    want_all, want_n = ref_retinanet.RetinaNet.format_data(
        stub, tf.constant(gt), img_dim
    )

    anchors = anchor_lib.anchor_shapes_per_level(
        anchor_sizes=anchor_sizes, aspect_ratios=ratios,
        anchor_scales=scales,
    )
    g, l, v = _pad(boxes, labels)
    got_all, got_n = assign.retinanet_assign(
        g, l, v, img_dim=tuple(img_dim), num_classes=nc,
        anchors_per_level=anchors,
    )
    assert int(np.asarray(got_n)) == int(want_n) > 0
    for lvl in range(5):
        got_lvl = np.asarray(got_all[lvl])  # [hm, wm, A, 4+nc]
        for a in range(stub.n_anchors):
            want = np.asarray(want_all[lvl][a])
            got = got_lvl[:, :, a, :]
            np.testing.assert_allclose(
                got, want, rtol=1e-4, atol=1e-4,
                err_msg=f"retinanet level {lvl} anchor {a}",
            )
