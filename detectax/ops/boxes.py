"""Box geometry — pure jnp, jit/vmap-safe, one canonical copy.

Replaces the three duplicated utility modules of the reference
(`FCOS/utils.py:6-68`, `CenterNet/utils.py:6-68`, `RetinaNet/utils.py:42-83`)
with a single library. All functions are shape-polymorphic over leading batch
dimensions and contain no Python-level data-dependent control flow, so they
compile cleanly under `jax.jit` on TPU.

Conventions
-----------
* "corners":  ``[..., 4] = (lo0, lo1, hi0, hi1)`` — axis-agnostic min/max
  corner pairs (works for xyxy and yxyx alike).
* "center":   ``[..., 4] = (c0, c1, s0, s1)`` — centroid + size.
* "ltrb":     per-cell distances ``(top, bottom, left, right)`` in feature
  stride units, the FCOS regression parameterization
  (reference `FCOS/fcos.py:112-134`).
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def swap_xy(boxes: jnp.ndarray) -> jnp.ndarray:
    """Swap the two coordinate axes: (a1,b1,a2,b2) -> (b1,a1,b2,a2).

    Parity with reference `FCOS/utils.py:6-14`.
    """
    return jnp.stack(
        [boxes[..., 1], boxes[..., 0], boxes[..., 3], boxes[..., 2]],
        axis=-1,
    )


def corners_to_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """(lo0,lo1,hi0,hi1) -> (c0,c1,s0,s1). Reference `FCOS/utils.py:16-27`."""
    lo = boxes[..., :2]
    hi = boxes[..., 2:]
    return jnp.concatenate([(lo + hi) * 0.5, hi - lo], axis=-1)


def center_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(c0,c1,s0,s1) -> (lo0,lo1,hi0,hi1). Reference `FCOS/utils.py:29-40`."""
    c = boxes[..., :2]
    s = boxes[..., 2:]
    return jnp.concatenate([c - s * 0.5, c + s * 0.5], axis=-1)


def box_area_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    wh = jnp.maximum(boxes[..., 2:] - boxes[..., :2], 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou_corners(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Pairwise IoU of two corner-format box sets.

    Args:
      boxes1: ``[..., N, 4]``; boxes2: ``[..., M, 4]``.
    Returns:
      ``[..., N, M]`` IoU matrix.

    Same math as reference `RetinaNet/utils.py:42-83` (numpy) and
    `FCOS/utils.py:42-68` (TF), one vectorized implementation.
    """
    b1 = boxes1[..., :, None, :]
    b2 = boxes2[..., None, :, :]
    lo = jnp.maximum(b1[..., :2], b2[..., :2])
    hi = jnp.minimum(b1[..., 2:], b2[..., 2:])
    inter_wh = jnp.maximum(hi - lo, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area1 = box_area_corners(boxes1)[..., :, None]
    area2 = box_area_corners(boxes2)[..., None, :]
    union = area1 + area2 - inter
    return inter / (union + EPS)


def pairwise_iou_center(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Pairwise IoU for center-format boxes (reference uses this layout for
    anchor matching, `RetinaNet/retinanet_module.py:292-297`)."""
    return pairwise_iou_corners(
        center_to_corners(boxes1), center_to_corners(boxes2)
    )


def elementwise_iou_corners(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """IoU of corresponding boxes: ``[..., 4] x [..., 4] -> [...]``."""
    lo = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    hi = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    inter_wh = jnp.maximum(hi - lo, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area_corners(boxes1) + box_area_corners(boxes2) - inter
    return inter / (union + EPS)


def cell_centers(h: int, w: int, offset: float = 0.5) -> jnp.ndarray:
    """Grid of feature-map cell centers ``[h, w, 2] = (y, x)`` in cell units.

    ``offset=0.5`` matches the reference decode grid
    (`FCOS/fcos.py:119-123`); ``offset=0.0`` matches its IoU-loss grid
    (`FCOS/fcos.py:402-406`).
    """
    ys = jnp.arange(h, dtype=jnp.float32) + offset
    xs = jnp.arange(w, dtype=jnp.float32) + offset
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gy, gx], axis=-1)


def ltrb_to_corners(ltrb: jnp.ndarray, stride: float) -> jnp.ndarray:
    """Decode per-cell (t,b,l,r) stride-unit distances into pixel corner
    boxes ``(y1,x1,y2,x2)``.

    Parity with reference `FCOS/fcos.py:112-134` `prediction_to_corners`:
    grid centers at cell+0.5, result scaled by stride.
    """
    h, w = ltrb.shape[-3], ltrb.shape[-2]
    grid = cell_centers(h, w, offset=0.5)
    gy, gx = grid[..., 0], grid[..., 1]
    y1 = gy - ltrb[..., 0]
    y2 = gy + ltrb[..., 1]
    x1 = gx - ltrb[..., 2]
    x2 = gx + ltrb[..., 3]
    return stride * jnp.stack([y1, x1, y2, x2], axis=-1)


def offset_scale_to_corners(
    reg: jnp.ndarray, box_scale: float, stride: float
) -> jnp.ndarray:
    """Decode (y_off, x_off, h/box_scale, w/box_scale) per-cell regression
    into pixel corner boxes ``(y1,x1,y2,x2)``.

    Parity with reference `FCOS/fcos_center_v1.py:125-147` and
    `CenterNet/tf_centernet_resnet_s8.py:210-241`: centers at
    ``(cell + offset) * stride``, sizes at ``pred * box_scale``.
    """
    h, w = reg.shape[-3], reg.shape[-2]
    grid = cell_centers(h, w, offset=0.0)
    cy = (grid[..., 0] + reg[..., 0]) * stride
    cx = (grid[..., 1] + reg[..., 1]) * stride
    bh = reg[..., 2] * box_scale
    bw = reg[..., 3] * box_scale
    return jnp.stack(
        [cy - bh * 0.5, cx - bw * 0.5, cy + bh * 0.5, cx + bw * 0.5],
        axis=-1,
    )


def flip_boxes_horizontal(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Flip normalized corner boxes (x1,y1,x2,y2) left-right.

    Parity with reference `FCOS/data_preprocess.py:24-41`.
    """
    return jnp.stack(
        [
            1.0 - boxes_xyxy[..., 2],
            boxes_xyxy[..., 1],
            1.0 - boxes_xyxy[..., 0],
            boxes_xyxy[..., 3],
        ],
        axis=-1,
    )
