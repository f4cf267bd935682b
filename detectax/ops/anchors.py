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
