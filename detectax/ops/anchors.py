"""RetinaNet anchor generation.

Parity with reference `RetinaNet/retinanet_module.py:168-246`: five levels
keyed by sorted ``anchor_sizes**2`` areas; per level, anchors enumerate
aspect ratios (outer) × scales (inner); anchor height = sqrt(area/ratio),
width = area/height, both multiplied by the scale. Anchor centers sit at
``cell_index * stride`` (the reference's grid convention).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

DEFAULT_SIZES = (32.0, 64.0, 128.0, 256.0, 512.0)
DEFAULT_RATIOS = (0.5, 1.0, 2.0)
DEFAULT_SCALES = tuple(2.0 ** x for x in (0.0, 1.0 / 3.0, 2.0 / 3.0))


def anchor_shapes_per_level(
    anchor_sizes: Sequence[float] = DEFAULT_SIZES,
    aspect_ratios: Sequence[float] = DEFAULT_RATIOS,
    anchor_scales: Sequence[float] = DEFAULT_SCALES,
) -> list[jnp.ndarray]:
    """Return a list (one per level) of ``[A, 2]`` anchor (h, w) tables."""
    areas = sorted(float(s) ** 2 for s in anchor_sizes)
    per_level = []
    for area in areas:
        shapes = []
        for ratio in aspect_ratios:
            ah = math.sqrt(area / ratio)
            aw = area / ah
            for sc in anchor_scales:
                shapes.append((sc * ah, sc * aw))
        per_level.append(jnp.asarray(shapes, dtype=jnp.float32))
    return per_level


def anchor_boxes_level(
    hm: int, wm: int, stride: int, anchors_hw: jnp.ndarray
) -> jnp.ndarray:
    """Dense center-format anchor boxes ``[hm, wm, A, 4] = (y, x, h, w)``."""
    ay = (jnp.arange(hm, dtype=jnp.float32) * stride)[:, None, None]
    ax = (jnp.arange(wm, dtype=jnp.float32) * stride)[None, :, None]
    n_anchor = anchors_hw.shape[0]
    return jnp.stack(
        [
            jnp.broadcast_to(ay, (hm, wm, n_anchor)),
            jnp.broadcast_to(ax, (hm, wm, n_anchor)),
            jnp.broadcast_to(anchors_hw[None, None, :, 0], (hm, wm, n_anchor)),
            jnp.broadcast_to(anchors_hw[None, None, :, 1], (hm, wm, n_anchor)),
        ],
        axis=-1,
    )


def has_anchor_targets_np(
    boxes_xyxy_norm,
    canvas: tuple[int, int],
    *,
    anchor_sizes: Sequence[float] = DEFAULT_SIZES,
    aspect_ratios: Sequence[float] = DEFAULT_RATIOS,
    anchor_scales: Sequence[float] = DEFAULT_SCALES,
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    iou_thresh: float = 0.5,
) -> bool:
    """Host-side (numpy) predicate: would anchor-IoU assignment produce at
    least one positive for this image on a stretched canvas — under BOTH
    flip orientations?

    Mirrors the reference trainer's skip-zero-target batch composition
    (`RetinaNet/train_retinanet_coco.py:198-205`: images whose
    ``format_data`` yields ``n_labels == 0`` are excluded from every
    batch). Assignment under ``stretch`` geometry is deterministic, but
    the anchor grid at ``k * stride`` is NOT mirror-symmetric (the mirror
    of the x=0 anchor column lands off-grid at ``wm * stride``), so a box
    matched only by an edge anchor could lose all positives on flipped
    steps. The predicate therefore checks the horizontally mirrored boxes
    too and requires positives in both orientations, so no flipped step
    can see a zero-positive image after the up-front filter.
    """
    import numpy as np

    boxes = np.asarray(boxes_xyxy_norm, np.float32).reshape(-1, 4)
    if len(boxes) == 0:
        return False
    ch, cw = canvas
    shapes = [
        np.asarray(a) for a in anchor_shapes_per_level(
            anchor_sizes, aspect_ratios, anchor_scales
        )
    ]

    def any_positive(gx1, gy1, gx2, gy2):
        g_area = np.maximum(0.0, gx2 - gx1) * np.maximum(0.0, gy2 - gy1)
        for stride, anchors_hw in zip(strides, shapes):
            hm, wm = ch // stride, cw // stride
            ay = (np.arange(hm, dtype=np.float32) * stride)[:, None, None]
            ax = (np.arange(wm, dtype=np.float32) * stride)[None, :, None]
            ah = anchors_hw[None, None, :, 0]
            aw = anchors_hw[None, None, :, 1]
            # broadcast (hm, wm, A) fully before flattening
            sh = (hm, wm, len(anchors_hw))
            ay1 = np.broadcast_to(ay - ah / 2, sh).reshape(-1, 1)
            ax1 = np.broadcast_to(ax - aw / 2, sh).reshape(-1, 1)
            ay2 = np.broadcast_to(ay + ah / 2, sh).reshape(-1, 1)
            ax2 = np.broadcast_to(ax + aw / 2, sh).reshape(-1, 1)
            ih = np.maximum(
                0.0,
                np.minimum(ay2, gy2[None, :]) - np.maximum(ay1, gy1[None, :]),
            )
            iw = np.maximum(
                0.0,
                np.minimum(ax2, gx2[None, :]) - np.maximum(ax1, gx1[None, :]),
            )
            inter = ih * iw
            a_area = (ay2 - ay1) * (ax2 - ax1)
            iou = inter / np.maximum(a_area + g_area[None, :] - inter, 1e-8)
            if (iou > iou_thresh).any():
                return True
        return False

    # GT corners in pixels (stretch: normalized * canvas)
    gx1 = boxes[:, 0] * cw
    gy1 = boxes[:, 1] * ch
    gx2 = boxes[:, 2] * cw
    gy2 = boxes[:, 3] * ch
    if not any_positive(gx1, gy1, gx2, gy2):
        return False
    # horizontally mirrored orientation (the flip augment's geometry)
    return any_positive(cw - gx2, gy1, cw - gx1, gy2)


def decode_anchor_regression(
    reg: jnp.ndarray, anchor_boxes: jnp.ndarray
) -> jnp.ndarray:
    """Invert the anchor encoding of `assign.retinanet_assign_level`.

    ``reg[..., :2] = (anchor_yx - gt_yx) / anchor_hw`` and
    ``reg[..., 2:] = gt_hw / anchor_hw`` (reference
    `RetinaNet/retinanet_module.py:428-451`), so
    ``gt_yx = anchor_yx - reg[..., :2] * anchor_hw``. Returns pixel corner
    boxes ``(y1, x1, y2, x2)``.
    """
    a_yx = anchor_boxes[..., :2]
    a_hw = anchor_boxes[..., 2:]
    c_yx = a_yx - reg[..., :2] * a_hw
    hw = reg[..., 2:] * a_hw
    return jnp.concatenate([c_yx - hw * 0.5, c_yx + hw * 0.5], axis=-1)
