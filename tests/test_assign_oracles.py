"""Loop-oracle parity tests for the centroid/anchor assigners.

Each oracle is a literal numpy transcription of the reference's per-image
loop with the documented ownership semantics (smallest-area wins; see
detectax.ops.assign module docstring).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from detectax.ops import anchors as A
from detectax.ops import assign

NC = 3


def _pad(boxes, labels, n=16):
    gt = np.zeros((n, 4), np.float32)
    lb = np.zeros((n,), np.int32)
    vd = np.zeros((n,), bool)
    gt[: len(boxes)] = boxes
    lb[: len(labels)] = labels
    vd[: len(boxes)] = True
    return jnp.asarray(gt), jnp.asarray(lb), jnp.asarray(vd)


def _np_scale_slot_oracle(boxes, labels, img_dim, img_pad, scales, nc, stride=8):
    """Mirror of CenterNet/tf_centernet_resnet_s8.py:243-330 with
    smallest-area-last write order (largest processed first)."""
    hm, wm = img_pad[0] // stride, img_pad[1] // stride
    pad_y = int((img_pad[0] - img_dim[0]) / 2.0)
    pad_x = int((img_pad[1] - img_dim[1]) / 2.0)
    out = np.zeros((hm, wm, len(scales), 4 + nc), np.float64)
    areas = [b[2] * img_dim[0] * b[3] * img_dim[1] for b in boxes]
    order = list(np.argsort(areas)[::-1])  # largest first, smallest last
    for i in order:
        y, x, h, w = boxes[i]
        y_c, x_c = y * img_dim[0], x * img_dim[1]
        bh, bw = h * img_dim[0], w * img_dim[1]
        box_d = max(bh, bw)
        fits = [s for s in range(len(scales)) if box_d < scales[s]]
        slot = min(fits) if fits else len(scales) - 1
        jy = int((pad_y + y_c) / stride)
        jx = int((pad_x + x_c) / stride)
        if not (0 <= jy < hm and 0 <= jx < wm):
            continue
        y_off = (pad_y + y_c - jy * stride) / stride
        x_off = (pad_x + x_c - jx * stride) / stride
        out[jy, jx, slot, :] = 0.0
        out[jy, jx, slot, :4] = [y_off, x_off, bh / scales[slot], bw / scales[slot]]
        out[jy, jx, slot, 4 + labels[i]] = 1.0
    return out


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_scale_slot_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 8
    boxes = np.stack([
        rng.uniform(0.2, 0.8, k), rng.uniform(0.2, 0.8, k),
        rng.uniform(0.05, 0.7, k), rng.uniform(0.05, 0.7, k),
    ], axis=-1).astype(np.float32)
    labels = rng.integers(0, NC, k)
    img_dim, img_pad = (192, 192), (256, 256)
    scales = (32.0, 64.0, 128.0, 256.0)
    gt, lb, vd = _pad(boxes, labels)
    got, n = assign.centernet_scale_slot_assign(
        gt, lb, vd, img_dim=img_dim, img_pad=img_pad, num_classes=NC,
        box_scales=scales,
    )
    want = _np_scale_slot_oracle(boxes, labels, img_dim, img_pad, scales, NC)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _np_retina_oracle(boxes, labels, img_dim, anchors_hw, stride, nc, thresh=0.5):
    """Anchor matching oracle: every anchor with IoU>thresh is assigned to
    its max-IoU GT (the build's documented semantics)."""
    hm, wm = img_dim[0] // stride, img_dim[1] // stride
    a = len(anchors_hw)
    out = np.zeros((hm, wm, a, 4 + nc), np.float64)
    gt_px = []
    for (y, x, h, w) in boxes:
        gt_px.append([y * img_dim[0], x * img_dim[1], h * img_dim[0], w * img_dim[1]])

    def iou(c1, c2):
        b1 = [c1[0] - c1[2] / 2, c1[1] - c1[3] / 2, c1[0] + c1[2] / 2, c1[1] + c1[3] / 2]
        b2 = [c2[0] - c2[2] / 2, c2[1] - c2[3] / 2, c2[0] + c2[2] / 2, c2[1] + c2[3] / 2]
        ih = max(0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
        iw = max(0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
        inter = ih * iw
        union = c1[2] * c1[3] + c2[2] * c2[3] - inter
        return inter / (union + 1e-8)

    for jy in range(hm):
        for jx in range(wm):
            for ja in range(a):
                anc = [jy * stride, jx * stride, anchors_hw[ja][0], anchors_hw[ja][1]]
                ious = [iou(g, anc) for g in gt_px]
                best = int(np.argmax(ious))
                if ious[best] > thresh:
                    g = gt_px[best]
                    out[jy, jx, ja, 0] = (anc[0] - g[0]) / anc[2]
                    out[jy, jx, ja, 1] = (anc[1] - g[1]) / anc[3]
                    out[jy, jx, ja, 2] = g[2] / anc[2]
                    out[jy, jx, ja, 3] = g[3] / anc[3]
                    out[jy, jx, ja, 4 + labels[best]] = 1.0
    return out


@pytest.mark.parametrize("seed", [1, 5])
def test_retinanet_level_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 5
    boxes = np.stack([
        rng.uniform(0.3, 0.7, k), rng.uniform(0.3, 0.7, k),
        rng.uniform(0.15, 0.5, k), rng.uniform(0.15, 0.5, k),
    ], axis=-1).astype(np.float32)
    labels = rng.integers(0, NC, k)
    img_dim = (128, 128)
    anchors_hw = np.asarray(A.anchor_shapes_per_level()[2])  # 128-area level
    gt, lb, vd = _pad(boxes, labels)
    got, n = assign.retinanet_assign_level(
        gt, lb, vd, img_dim=img_dim, img_pad=img_dim, num_classes=NC,
        stride=32, anchors_hw=jnp.asarray(anchors_hw),
    )
    want = _np_retina_oracle(boxes, labels, img_dim, anchors_hw, 32, NC)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    assert int(n) == int((want[..., 4:].max(-1) > 0).sum())


def _np_hourglass_oracle(boxes, labels, img_dim, scales, nc, stride=8):
    hm, wm = img_dim[0] // stride, img_dim[1] // stride
    out = np.zeros((hm, wm, len(scales), 5 + nc), np.float64)
    areas = [b[2] * img_dim[0] * b[3] * img_dim[1] for b in boxes]
    for i in np.argsort(areas)[::-1]:
        y, x, h, w = boxes[i]
        y_c, x_c = y * img_dim[0], x * img_dim[1]
        bh, bw = h * img_dim[0], w * img_dim[1]
        fits = [s for s in range(len(scales)) if bh < scales[s] and bw < scales[s]]
        slot = min(fits) if fits else len(scales) - 1
        jy, jx = int(y_c / stride), int(x_c / stride)
        if not (0 <= jy < hm and 0 <= jx < wm):
            continue
        out[jy, jx, slot, :] = 0.0
        out[jy, jx, slot, :5] = [
            (y_c - jy * stride) / stride, (x_c - jx * stride) / stride,
            bh / scales[slot], bw / scales[slot], 1.0,
        ]
        out[jy, jx, slot, 5 + labels[i]] = 1.0
    return out


@pytest.mark.parametrize("seed", [2, 4])
def test_hourglass_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 6
    boxes = np.stack([
        rng.uniform(0.2, 0.8, k), rng.uniform(0.2, 0.8, k),
        rng.uniform(0.05, 0.8, k), rng.uniform(0.05, 0.8, k),
    ], axis=-1).astype(np.float32)
    labels = rng.integers(0, NC, k)
    img = (256, 256)
    scales = (32.0, 64.0, 128.0, 256.0)
    gt, lb, vd = _pad(boxes, labels)
    got, _ = assign.hourglass_assign(
        gt, lb, vd, img_dim=img, num_classes=NC, box_scales=scales
    )
    want = _np_hourglass_oracle(boxes, labels, img, scales, NC)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _np_stacked_hourglass_oracle(boxes, labels, img_dim, nc, stride=4,
                                 img_pad=None):
    """Mirror of CenterNet/tf_centernet_hourglass.py:379-455 format_data
    with the smallest-area-wins intent (its comment) rather than its
    buggy ascending-argsort write order, at the model's true stride 4."""
    img_pad = img_pad or img_dim
    hm, wm = img_pad[0] // stride, img_pad[1] // stride
    pad_y = int((img_pad[0] - img_dim[0]) / 2.0)
    pad_x = int((img_pad[1] - img_dim[1]) / 2.0)
    out = np.zeros((hm, wm, 4 + nc), np.float64)
    areas = [b[2] * img_dim[0] * b[3] * img_dim[1] for b in boxes]
    for i in np.argsort(areas)[::-1]:  # largest first, smallest last wins
        y, x, h, w = boxes[i]
        y_c, x_c = y * img_dim[0], x * img_dim[1]
        bh, bw = h * img_dim[0], w * img_dim[1]
        y_lo, y_hi = y_c - bh / 2, y_c + bh / 2
        x_lo, x_hi = x_c - bw / 2, x_c + bw / 2
        jy = int((pad_y + y_c) / stride)
        jx = int((pad_x + x_c) / stride)
        if not (0 <= jy < hm and 0 <= jx < wm):
            continue
        out[jy, jx, :] = 0.0
        out[jy, jx, 0] = jy + 0.5 - (pad_y + y_lo) / stride
        out[jy, jx, 1] = (pad_y + y_hi) / stride - jy - 0.5
        out[jy, jx, 2] = jx + 0.5 - (pad_x + x_lo) / stride
        out[jy, jx, 3] = (pad_x + x_hi) / stride - jx - 0.5
        out[jy, jx, 4 + labels[i]] = 1.0
    return out


@pytest.mark.parametrize("seed", [3, 7])
def test_stacked_hourglass_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 6
    boxes = np.stack([
        rng.uniform(0.2, 0.8, k), rng.uniform(0.2, 0.8, k),
        rng.uniform(0.05, 0.8, k), rng.uniform(0.05, 0.8, k),
    ], axis=-1).astype(np.float32)
    labels = rng.integers(0, NC, k)
    img = (256, 256)
    gt, lb, vd = _pad(boxes, labels)
    got, n = assign.stacked_hourglass_assign(
        gt, lb, vd, img_dim=img, num_classes=NC
    )
    want = _np_stacked_hourglass_oracle(boxes, labels, img, NC)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    assert int(n) == k


def test_stacked_hourglass_assign_decode_roundtrip():
    """Targets fed through stacked_hourglass_decode recover the GT boxes
    (stride-4 grid quantization bounds the error)."""
    from detectax.infer import predict as P

    boxes = np.asarray(
        [[0.5, 0.5, 0.4, 0.3], [0.25, 0.7, 0.12, 0.2]], np.float32
    )
    labels = np.asarray([1, 2])
    img = (256, 256)
    gt, lb, vd = _pad(boxes, labels)
    target, _ = assign.stacked_hourglass_assign(
        gt, lb, vd, img_dim=img, num_classes=NC
    )
    dec_boxes, probs = P.stacked_hourglass_decode(
        np.asarray(target)[None], stride=4
    )
    dec_boxes = np.asarray(dec_boxes[0])
    probs = np.asarray(probs[0])
    # positives are cells whose class prob is sigmoid(1.0)
    pos = probs.max(-1) > 0.7
    assert pos.sum() == len(boxes)
    got = dec_boxes[pos]
    want = np.stack([
        (boxes[:, 0] - boxes[:, 2] / 2) * img[0],
        (boxes[:, 1] - boxes[:, 3] / 2) * img[1],
        (boxes[:, 0] + boxes[:, 2] / 2) * img[0],
        (boxes[:, 1] + boxes[:, 3] / 2) * img[1],
    ], axis=-1)
    # match by nearest center
    for wbox in want:
        d = np.abs(got - wbox[None]).max(-1)
        assert d.min() < 1e-3, (got, wbox)
