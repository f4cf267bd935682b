import jax.numpy as jnp
import numpy as np

from detectax.ops import boxes as B


def test_swap_xy_roundtrip(rng):
    x = rng.uniform(size=(7, 4)).astype(np.float32)
    out = np.asarray(B.swap_xy(jnp.asarray(x)))
    np.testing.assert_allclose(out[:, [1, 0, 3, 2]], x)
    np.testing.assert_allclose(np.asarray(B.swap_xy(B.swap_xy(x))), x)


def test_center_corner_roundtrip(rng):
    corners = rng.uniform(size=(10, 4)).astype(np.float32)
    corners[:, 2:] = corners[:, :2] + np.abs(corners[:, 2:])
    center = B.corners_to_center(jnp.asarray(corners))
    back = np.asarray(B.center_to_corners(center))
    np.testing.assert_allclose(back, corners, atol=1e-6)


def _np_iou(b1, b2):
    lo = np.maximum(b1[:, None, :2], b2[None, :, :2])
    hi = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.maximum(hi - lo, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / (a1[:, None] + a2[None, :] - inter + 1e-8)


def test_pairwise_iou_matches_numpy(rng):
    b1 = rng.uniform(0, 50, size=(12, 4)).astype(np.float32)
    b1[:, 2:] = b1[:, :2] + rng.uniform(1, 30, size=(12, 2))
    b2 = rng.uniform(0, 50, size=(9, 4)).astype(np.float32)
    b2[:, 2:] = b2[:, :2] + rng.uniform(1, 30, size=(9, 2))
    got = np.asarray(B.pairwise_iou_corners(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, _np_iou(b1, b2), atol=1e-5)
    # identical boxes have IoU ~ 1
    self_iou = np.asarray(B.pairwise_iou_corners(jnp.asarray(b1), jnp.asarray(b1)))
    np.testing.assert_allclose(np.diag(self_iou), 1.0, atol=1e-4)


def test_ltrb_decode_matches_reference_formula():
    """prediction_to_corners parity (FCOS/fcos.py:112-134): grid+0.5 centers,
    (t,b,l,r) channel order, scaled by stride."""
    h, w, stride = 4, 6, 8
    ltrb = np.zeros((h, w, 4), dtype=np.float32)
    ltrb[2, 3] = [1.0, 2.0, 0.5, 1.5]  # t, b, l, r
    out = np.asarray(B.ltrb_to_corners(jnp.asarray(ltrb), stride))
    gy, gx = 2.5, 3.5
    np.testing.assert_allclose(
        out[2, 3],
        [stride * (gy - 1.0), stride * (gx - 0.5),
         stride * (gy + 2.0), stride * (gx + 1.5)],
    )


def test_offset_scale_decode_matches_reference_formula():
    """fcos_center_v1 decode parity (FCOS/fcos_center_v1.py:125-147)."""
    h, w, stride, box_sc = 4, 4, 16, 64.0
    reg = np.zeros((h, w, 4), dtype=np.float32)
    reg[1, 2] = [0.25, 0.75, 0.5, 1.0]  # y_off, x_off, h/sc, w/sc
    out = np.asarray(B.offset_scale_to_corners(jnp.asarray(reg), box_sc, stride))
    cy, cx = (1 + 0.25) * stride, (2 + 0.75) * stride
    bh, bw = 0.5 * box_sc, 1.0 * box_sc
    np.testing.assert_allclose(
        out[1, 2], [cy - bh / 2, cx - bw / 2, cy + bh / 2, cx + bw / 2]
    )


def test_flip_boxes_horizontal():
    b = np.array([[0.1, 0.2, 0.4, 0.5]], dtype=np.float32)  # x1 y1 x2 y2
    out = np.asarray(B.flip_boxes_horizontal(jnp.asarray(b)))
    np.testing.assert_allclose(out, [[0.6, 0.2, 0.9, 0.5]], atol=1e-6)
