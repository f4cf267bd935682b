import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectax.ops import anchors as A
from detectax.ops import assign
from detectax.ops import boxes as B

NC = 4
IMG = (256, 256)


def _pad_gt(boxes, labels, n=16):
    """Pad (y,x,h,w) boxes + labels to fixed N with validity mask."""
    k = len(boxes)
    gt = np.zeros((n, 4), dtype=np.float32)
    lb = np.zeros((n,), dtype=np.int32)
    vd = np.zeros((n,), dtype=bool)
    if k:
        gt[:k] = boxes
        lb[:k] = labels
        vd[:k] = True
    return jnp.asarray(gt), jnp.asarray(lb), jnp.asarray(vd)


def _np_fcos_oracle(boxes, labels, img_dim, num_classes, stride, bin_lo, bin_hi):
    """Numpy loop oracle mirroring reference FCOS/fcos.py:136-378 with
    smallest-area-wins ordering (processed largest->smallest so the
    smallest box is written last)."""
    hm, wm = img_dim[0] // stride, img_dim[1] // stride
    h_ratio, w_ratio = img_dim[0] / stride, img_dim[1] / stride
    out = np.zeros((hm, wm, num_classes + 5), dtype=np.float64)
    sel = [
        i for i in range(len(boxes))
        if bin_lo <= max(boxes[i][2] * img_dim[0], boxes[i][3] * img_dim[1]) < bin_hi
    ]
    areas = [boxes[i][2] * img_dim[0] * boxes[i][3] * img_dim[1] for i in sel]
    order = [sel[i] for i in np.argsort(areas)[::-1]]  # largest first
    for i in order:
        y, x, h, w = boxes[i]
        coord = [
            (y - h / 2) * img_dim[0], (x - w / 2) * img_dim[1],
            (y + h / 2) * img_dim[0], (x + w / 2) * img_dim[1],
        ]
        y_lo = max(0, int((y - h / 2) * h_ratio) + 1)
        x_lo = max(0, int((x - w / 2) * w_ratio) + 1)
        y_hi = min(int((y + h / 2) * h_ratio) + 1, hm)
        x_hi = min(int((x + w / 2) * w_ratio) + 1, wm)
        y_cen = min(int(0.5 * (y_lo + y_hi)), hm - 1)
        x_cen = min(int(0.5 * (x_lo + x_hi)), wm - 1)
        cls = 5 + labels[i]
        deg_y, deg_x = y_hi <= y_lo, x_hi <= x_lo
        ys = [y_cen] if deg_y else list(range(y_lo, y_hi))
        xs = [x_cen] if deg_x else list(range(x_lo, x_hi))
        for jy in ys:
            for jx in xs:
                gy, gx = jy + 0.5, jx + 0.5
                t = max(0.0, gy - coord[0] / stride)
                b = max(0.0, coord[2] / stride - gy)
                l = max(0.0, gx - coord[1] / stride)
                r = max(0.0, coord[3] / stride - gx)
                out[jy, jx, :4] = [t, b, l, r]
                ry = 1.0 if deg_y else (min(t, b) + 1e-8) / (max(t, b) + 1e-8)
                rx = 1.0 if deg_x else (min(l, r) + 1e-8) / (max(l, r) + 1e-8)
                out[jy, jx, 4] = np.sqrt(ry * rx)
                out[jy, jx, 5:] = 0.0
                out[jy, jx, cls] = 1.0
        out[y_cen, x_cen, 4] = 1.0
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fcos_assign_matches_loop_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 6
    boxes = np.stack(
        [
            rng.uniform(0.2, 0.8, k),  # y
            rng.uniform(0.2, 0.8, k),  # x
            rng.uniform(0.05, 0.6, k),  # h
            rng.uniform(0.05, 0.6, k),  # w
        ],
        axis=-1,
    ).astype(np.float32)
    labels = rng.integers(0, NC, size=k)
    gt, lb, vd = _pad_gt(boxes, labels)
    outs, counts = assign.fcos_assign(
        gt, lb, vd, img_dim=IMG, num_classes=NC
    )
    bounds = assign._bin_bounds(assign.FCOS_BIN_EDGES, 5)
    for li, (stride, (lo, hi)) in enumerate(zip(assign.FCOS_STRIDES, bounds)):
        want = _np_fcos_oracle(boxes, labels, IMG, NC, stride, lo, hi)
        got = np.asarray(outs[li])
        # Cells contested between equal bins can differ on argmin ties;
        # require exact match (random floats make ties measure-zero).
        np.testing.assert_allclose(got, want, atol=1e-4)
    assert int(np.sum(np.asarray(counts))) == k


def test_fcos_assign_single_box_geometry():
    # One 64x64 box centered at (128,128) in a 256 image -> level 2 (stride 32)
    gt, lb, vd = _pad_gt([[0.5, 0.5, 0.25, 0.25]], [2])
    outs, counts = assign.fcos_assign(gt, lb, vd, img_dim=IMG, num_classes=NC)
    assert [int(c) for c in np.asarray(counts)] == [0, 0, 1, 0, 0]
    lvl = np.asarray(outs[2])  # stride 32: 8x8 map
    pos = lvl[..., 5:].max(-1) > 0
    assert pos.sum() > 0
    # center cell should have centerness forced to 1
    assert lvl[..., 4].max() == pytest.approx(1.0)
    # decode round-trip: cells with unclamped ltrb reconstruct the GT box
    # exactly; cells on the (+1-shifted) boundary clamp a distance to 0 and
    # decode within half a stride (reference FCOS/fcos.py:222-257 behavior).
    ys, xs = np.where(pos)
    dec = np.asarray(B.ltrb_to_corners(jnp.asarray(lvl[..., :4]), 32))
    exact_checked = 0
    for jy, jx in zip(ys, xs):
        y1, x1, y2, x2 = dec[jy, jx]
        np.testing.assert_allclose(
            [y1, x1, y2, x2], [96, 96, 160, 160], atol=16 + 1e-3
        )
        if np.all(lvl[jy, jx, :4] > 0):
            np.testing.assert_allclose(
                [y1, x1, y2, x2], [96, 96, 160, 160], atol=1e-3
            )
            exact_checked += 1
    assert exact_checked >= 1


def test_fcos_center_assign_3x3_scores():
    gt, lb, vd = _pad_gt([[0.5, 0.5, 0.25, 0.25]], [1])
    outs, _ = assign.fcos_center_assign(gt, lb, vd, img_dim=IMG, num_classes=NC)
    lvl = np.asarray(outs[2])  # stride 32
    cen = lvl[..., 4]
    yc, xc = np.unravel_index(np.argmax(cen), cen.shape)
    assert cen[yc, xc] == pytest.approx(1.0)
    # 3x3 neighborhood: edges 0.5, corners 0.25
    assert cen[yc - 1, xc] == pytest.approx(0.5)
    assert cen[yc, xc + 1] == pytest.approx(0.5)
    assert cen[yc - 1, xc - 1] == pytest.approx(0.25)
    assert (cen > 0).sum() == 9
    # class one-hot present on all 9 cells
    assert (lvl[..., 5 + 1] > 0).sum() == 9


def test_fcos_center_assign_center_only():
    gt, lb, vd = _pad_gt([[0.5, 0.5, 0.25, 0.25]], [1])
    outs, _ = assign.fcos_center_assign(
        gt, lb, vd, img_dim=IMG, num_classes=NC, center_only=True
    )
    cen = np.asarray(outs[2])[..., 4]
    assert (cen > 0).sum() == 1


def test_fcos_center_v1_assign_roundtrip():
    boxes = [[0.4, 0.6, 0.3, 0.2]]  # y x h w -> max side 76.8 px -> level 2
    gt, lb, vd = _pad_gt(boxes, [3])
    outs, counts = assign.fcos_center_v1_assign(gt, lb, vd, img_dim=IMG, num_classes=NC)
    assert [int(c) for c in np.asarray(counts)] == [0, 0, 1, 0, 0]
    lvl = np.asarray(outs[2])  # stride 32, box_scale 128
    pos = lvl[..., 4] > 0
    assert pos.sum() == 1
    jy, jx = [int(v) for v in np.where(pos)]
    # reference formula: cell = int(c_px / stride)
    assert jy == int(0.4 * 256 / 32) and jx == int(0.6 * 256 / 32)
    dec = np.asarray(
        B.offset_scale_to_corners(jnp.asarray(lvl[..., :4]), 128.0, 32)
    )
    y1, x1, y2, x2 = dec[jy, jx]
    np.testing.assert_allclose(
        [y1, x1, y2, x2],
        [0.4 * 256 - 0.15 * 256, 0.6 * 256 - 0.1 * 256,
         0.4 * 256 + 0.15 * 256, 0.6 * 256 + 0.1 * 256],
        atol=1e-3,
    )


def test_centernet_scale_slot_assign_with_padding():
    img_dim, img_pad = (192, 192), (256, 256)
    boxes = [[0.5, 0.5, 0.5, 0.25]]  # 96x48 px -> first scale > 96 is 128 (slot 2)
    gt, lb, vd = _pad_gt(boxes, [1])
    out, n = assign.centernet_scale_slot_assign(
        gt, lb, vd, img_dim=img_dim, img_pad=img_pad, num_classes=NC
    )
    out = np.asarray(out)
    assert out.shape == (32, 32, 5, 4 + NC)
    assert int(n) == 1
    pos = out[..., 4:].max(-1) > 0
    cells = np.argwhere(pos)
    assert len(cells) == 1
    jy, jx, slot = cells[0]
    assert slot == 2
    # center-padded: pad = 32 px; center at (96+32)/8 = 16
    assert jy == 16 and jx == 16
    # h regression = 96/128
    np.testing.assert_allclose(out[jy, jx, slot, 2], 96 / 128, atol=1e-5)


def test_centernet_scale_slot_gaussian_cls():
    img = (256, 256)
    boxes = [[0.5, 0.5, 0.5, 0.25]]  # 128x64 px -> slot 3 (scale 256)
    gt, lb, vd = _pad_gt(boxes, [1])
    hard, _ = assign.centernet_scale_slot_assign(
        gt, lb, vd, img_dim=img, num_classes=NC
    )
    soft, _ = assign.centernet_scale_slot_assign(
        gt, lb, vd, img_dim=img, num_classes=NC, gaussian_cls=True
    )
    hard, soft = np.asarray(hard), np.asarray(soft)
    # regression channels identical (centroid-only either way)
    np.testing.assert_array_equal(hard[..., :4], soft[..., :4])
    # the one-hot peak survives at exactly 1.0, same cell/slot/class
    peak_hard = np.argwhere(hard[..., 4:] >= 1.0)
    peak_soft = np.argwhere(soft[..., 4:] >= 1.0)
    np.testing.assert_array_equal(peak_hard, peak_soft)
    assert len(peak_soft) == 1
    jy, jx, slot, c = peak_soft[0]
    # neighbors in the same slot/class carry Gaussian tails in (0, 1)
    tail = soft[jy, jx + 2, slot, 4 + c]
    assert 0.0 < tail < 1.0
    assert hard[jy, jx + 2, slot, 4 + c] == 0.0
    # other slots stay empty
    other = np.delete(soft[..., 4:], slot, axis=2)
    assert other.max() == 0.0
    # loss positives: only the peak counts
    from detectax.train.losses import centernet_s8_loss

    m = centernet_s8_loss(
        jnp.asarray(soft[None]), jnp.asarray(np.zeros_like(soft)[None])
    )
    assert int(m["num_pos"]) == 1


def test_hourglass_assign_layout():
    img = (256, 256)
    boxes = [[0.5, 0.5, 0.2, 0.2], [0.25, 0.25, 0.9, 0.9]]
    gt, lb, vd = _pad_gt(boxes, [0, 3])
    out, n = assign.hourglass_assign(gt, lb, vd, img_dim=img, num_classes=NC)
    out = np.asarray(out)
    assert out.shape == (32, 32, 4, 5 + NC)
    assert int(n) == 2
    # objectness channel marks exactly 2 cells
    assert (out[..., 4] > 0).sum() == 2
    # small box (51px) in slot (scales 32,64,128,256): both dims < 64 -> slot 1
    slots = np.argwhere(out[..., 4] > 0)[:, 2]
    assert set(slots.tolist()) == {1, 3}


def test_centernet_heatmap_assign():
    boxes = [[0.5, 0.5, 0.5, 0.5]]
    gt, lb, vd = _pad_gt(boxes, [2])
    out, _ = assign.centernet_heatmap_assign(
        gt, lb, vd, img_dim=IMG, num_classes=NC
    )
    out = np.asarray(out)
    assert out.shape == (32, 32, 5 + NC)
    cen = out[..., 4]
    assert cen.max() == pytest.approx(1.0)
    # pseudo-gaussian decays away from center; grid centers sit at ±0.5
    # around the integer μ so up to 4 cells tie at the 1.0 peak (same
    # symmetry as reference center_dist_2d, tf_centernet.py:11-18)
    assert (cen >= 1.0 - 1e-6).sum() <= 4
    yc, xc = np.unravel_index(np.argmax(cen), cen.shape)
    if cen[yc + 2, xc] > 0:
        assert cen[yc + 2, xc] < 1.0
    # ltrb channels cover the shrunken region with positive extents
    assert (out[..., :4].sum(-1) > 0).sum() >= 1
    # gaussian variant also valid
    out_g, _ = assign.centernet_heatmap_assign(
        gt, lb, vd, img_dim=IMG, num_classes=NC, heatmap_kind="gaussian"
    )
    assert np.asarray(out_g)[..., 4].max() == pytest.approx(1.0)


def test_retinanet_assign_recovers_gt():
    anchors = A.anchor_shapes_per_level()
    boxes = [[0.5, 0.5, 0.25, 0.25]]  # 64x64 box
    gt, lb, vd = _pad_gt(boxes, [2])
    outs, n = assign.retinanet_assign(
        gt, lb, vd, img_dim=IMG, num_classes=NC, anchors_per_level=anchors
    )
    assert int(n) > 0
    total_pos = 0
    for li, (out, stride) in enumerate(zip(outs, assign.FCOS_STRIDES)):
        out = np.asarray(out)
        hm = IMG[0] // stride
        assert out.shape == (hm, hm, 9, 4 + NC)
        pos = out[..., 4:].max(-1) > 0
        total_pos += pos.sum()
        if pos.sum() == 0:
            continue
        # decode assigned anchors back to the GT box
        ab = np.asarray(A.anchor_boxes_level(hm, hm, stride, anchors[li]))
        dec = np.asarray(
            A.decode_anchor_regression(jnp.asarray(out[..., :4]), jnp.asarray(ab))
        )
        for jy, jx, ja in np.argwhere(pos):
            np.testing.assert_allclose(
                dec[jy, jx, ja], [96, 96, 160, 160], atol=1e-2
            )
    assert total_pos == int(n)


def test_assign_is_jittable_and_vmappable():
    def fn(gt, lb, vd):
        outs, n = assign.fcos_assign(gt, lb, vd, img_dim=IMG, num_classes=NC)
        return outs[0], n

    gt, lb, vd = _pad_gt([[0.5, 0.5, 0.25, 0.25]], [1])
    jit_out, _ = jax.jit(fn)(gt, lb, vd)
    assert jit_out.shape == (32, 32, 5 + NC)
    # batched via vmap
    bgt = jnp.stack([gt, gt])
    blb = jnp.stack([lb, lb])
    bvd = jnp.stack([vd, vd])
    vout, vn = jax.vmap(fn)(bgt, blb, bvd)
    assert vout.shape == (2, 32, 32, 5 + NC)


def test_empty_gt_produces_zero_maps():
    gt, lb, vd = _pad_gt([], [])
    outs, counts = assign.fcos_assign(gt, lb, vd, img_dim=IMG, num_classes=NC)
    for o in outs:
        assert float(jnp.abs(o).sum()) == 0.0
    assert int(np.asarray(counts).sum()) == 0


def test_has_anchor_targets_np_matches_device_assignment():
    """Host predicate agrees with the on-device anchor matcher about
    whether any positive exists (reference skip-zero-target composition,
    train_retinanet_coco.py:198-205)."""
    rng = np.random.default_rng(3)
    anchors = A.anchor_shapes_per_level(anchor_sizes=[20, 40, 80, 160, 320])
    canvas = (256, 256)
    for trial in range(12):
        n = int(rng.integers(0, 4))
        yxhw, xyxy = [], []
        for _ in range(n):
            h = rng.uniform(0.01, 0.6)
            w = rng.uniform(0.01, 0.6)
            y = rng.uniform(h / 2, 1 - h / 2)
            x = rng.uniform(w / 2, 1 - w / 2)
            yxhw.append([y, x, h, w])
            xyxy.append([x - w / 2, y - h / 2, x + w / 2, y + h / 2])
        gt, lb, vd = _pad_gt(yxhw, [0] * n)
        _, count = assign.retinanet_assign(
            gt, lb, vd, img_dim=canvas, num_classes=2,
            anchors_per_level=anchors,
        )
        want = int(np.asarray(count)) > 0
        got = A.has_anchor_targets_np(
            np.asarray(xyxy, np.float32), canvas,
            anchor_sizes=[20, 40, 80, 160, 320],
        )
        assert got == want, (trial, xyxy)
