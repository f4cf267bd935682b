"""Inference: jitted forward → decode → fixed-shape NMS.

Replaces the reference's decode paths (`FCOS/infer_fcos.py:27-62`,
`RetinaNet/retinanet_module.py:483-530` — whose per-cell Python list-comps
were its worst hot spot, SURVEY.md §3.5 — and
`CenterNet/tf_centernet_resnet_s8.py:446-599`) with one compiled pipeline:
per-level decode (ops.boxes / ops.anchors), candidate top-k, and the shared
deterministic NMS (ops.nms). Everything static-shape; batch-first.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from detectax.ops import anchors as anchor_lib
from detectax.ops import nms as nms_lib
from detectax.ops.boxes import ltrb_to_corners, offset_scale_to_corners

FCOS_STRIDES = (8, 16, 32, 64, 128)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def fcos_decode(
    outputs: Sequence[jnp.ndarray],
    *,
    strides: Sequence[int] = FCOS_STRIDES,
    use_centerness: bool = True,
):
    """FCOS ltrb decode (`infer_fcos.py:27-57`): per level ltrb→corners at
    grid+0.5, scores = σ(cls) [× σ(cen)]. Returns (boxes [B,M,4] pixels
    yxyx, probs [B,M,nc])."""
    all_boxes, all_probs = [], []
    for out, stride in zip(outputs, strides):
        reg = out[..., :4]
        cen = out[..., 4]
        cls = out[..., 5:]
        boxes = ltrb_to_corners(reg, float(stride))
        probs = _sigmoid(cls)
        if use_centerness:
            probs = probs * _sigmoid(cen)[..., None]
        b = out.shape[0]
        all_boxes.append(boxes.reshape(b, -1, 4))
        all_probs.append(probs.reshape(b, -1, probs.shape[-1]))
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_probs, axis=1)


def fcos_center_v1_decode(
    outputs: Sequence[jnp.ndarray],
    *,
    strides: Sequence[int] = FCOS_STRIDES,
    box_scales: Sequence[float],
):
    """Offset+scale decode (`fcos_center_v1.py:125-147`)."""
    all_boxes, all_probs = [], []
    for out, stride, sc in zip(outputs, strides, box_scales):
        reg = out[..., :4]
        cen = out[..., 4]
        cls = out[..., 5:]
        boxes = offset_scale_to_corners(reg, float(sc), float(stride))
        probs = _sigmoid(cls) * _sigmoid(cen)[..., None]
        b = out.shape[0]
        all_boxes.append(boxes.reshape(b, -1, 4))
        all_probs.append(probs.reshape(b, -1, probs.shape[-1]))
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_probs, axis=1)


def centernet_s8_decode(
    output: jnp.ndarray,
    *,
    box_scales: Sequence[float],
    stride: int = 8,
):
    """Scale-slot decode (`tf_centernet_resnet_s8.py:210-241`): output
    [B,h,w,S,4+nc], reg already sigmoid-activated by the model."""
    b, h, w, s, _ = output.shape
    all_boxes, all_probs = [], []
    for slot in range(s):
        reg = output[:, :, :, slot, :4]
        cls = output[:, :, :, slot, 4:]
        boxes = offset_scale_to_corners(
            reg, float(box_scales[slot]), float(stride)
        )
        all_boxes.append(boxes.reshape(b, -1, 4))
        all_probs.append(_sigmoid(cls).reshape(b, -1, cls.shape[-1]))
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_probs, axis=1)


def hourglass_decode(
    output: jnp.ndarray,
    *,
    box_scales: Sequence[float],
    stride: int = 8,
):
    """Hourglass decode (`tf_hourglass_net.py:451-615` semantics): output
    [B,h,w,4,5+nc] with sigmoid reg, ch4 objectness logit; score =
    σ(obj)·σ(cls)."""
    b, h, w, s, _ = output.shape
    all_boxes, all_probs = [], []
    for slot in range(s):
        reg = output[:, :, :, slot, :4]
        obj = output[:, :, :, slot, 4]
        cls = output[:, :, :, slot, 5:]
        boxes = offset_scale_to_corners(
            reg, float(box_scales[slot]), float(stride)
        )
        probs = _sigmoid(cls) * _sigmoid(obj)[..., None]
        all_boxes.append(boxes.reshape(b, -1, 4))
        all_probs.append(probs.reshape(b, -1, probs.shape[-1]))
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_probs, axis=1)


def stacked_hourglass_decode(
    output: jnp.ndarray,
    *,
    stride: int = 4,
):
    """Stacked-hourglass decode (`tf_centernet_hourglass.py:355-377`
    ``prediction_to_corners``): output ``[B,h,w,4+nc]`` with RAW (t,b,l,r)
    reg in stride units from the cell center (+0.5); corners =
    ``stride * (grid ∓ reg)``; scores = σ(cls). Default stride 4 — the
    model's true output stride (see `models.StackedHourglass`)."""
    b, h, w, _ = output.shape
    boxes = ltrb_to_corners(output[..., :4], float(stride))
    probs = _sigmoid(output[..., 4:].astype(jnp.float32))
    return boxes.reshape(b, -1, 4), probs.reshape(b, h * w, probs.shape[-1])


def centernet_heatmap_decode(
    output: jnp.ndarray,
    *,
    stride: int = 8,
    use_centerness: bool = True,
    peak_mask: bool = True,
    skip_background: bool = True,
    use_pallas: bool | None = None,
):
    """Single-map heatmap decode for `CenterNetFPNSingle` / the reference's
    orphaned `CenterNet/tf_centernet.py` model: output ``[B,h,w,4+1+C]``
    with raw ltrb reg (stride units), a center-prior channel, and C class
    logits (objectness slot at index 0 per the reference COCO ETL
    convention — dropped when ``skip_background``).

    Pipeline: sigmoid → (×σ(center)) → 3x3 local-peak mask (the CenterNet
    maxpool-equals NMS-free trick, fused as a Pallas TPU kernel) → dense
    (boxes, probs) for `detections_from_dense` / plain top-k.
    """
    from detectax.ops.pallas import (
        peak_mask_scores_pallas,
        peak_mask_scores_reference,
    )

    b, h, w, _ = output.shape
    reg = output[..., :4]
    cen = output[..., 4]
    cls = output[..., 5:]
    boxes = ltrb_to_corners(reg, float(stride))
    probs = _sigmoid(cls.astype(jnp.float32))
    if skip_background:
        probs = probs[..., 1:]
    if use_centerness:
        probs = probs * _sigmoid(cen.astype(jnp.float32))[..., None]
    if peak_mask:
        c = probs.shape[-1]
        # fold batch into the plane axis so one pallas_call covers all
        # [B*C] class planes (grid over planes; no vmap needed)
        planes = jnp.transpose(probs, (1, 2, 0, 3)).reshape(h, w, b * c)
        if use_pallas is None:
            # per-platform lowering (multi-platform export safe, r3 ADVICE)
            planes = jax.lax.platform_dependent(
                planes,
                tpu=lambda p: peak_mask_scores_pallas(p, interpret=False),
                default=peak_mask_scores_reference,
            )
        else:
            fn = (peak_mask_scores_pallas if use_pallas
                  else peak_mask_scores_reference)
            planes = fn(planes)
        probs = jnp.transpose(planes.reshape(h, w, b, c), (2, 0, 1, 3))
    return boxes.reshape(b, -1, 4), probs.reshape(b, h * w, probs.shape[-1])


def retinanet_decode(
    outputs: Sequence[jnp.ndarray],
    *,
    anchors_per_level: Sequence[jnp.ndarray],
    strides: Sequence[int] = FCOS_STRIDES,
):
    """Anchor-relative decode (`retinanet_module.py:428-451`)."""
    all_boxes, all_probs = [], []
    for out, stride, anchors_hw in zip(outputs, strides, anchors_per_level):
        b, h, w, a, _ = out.shape
        reg = out[..., :4]
        cls = out[..., 4:]
        ab = anchor_lib.anchor_boxes_level(h, w, stride, anchors_hw)
        boxes = anchor_lib.decode_anchor_regression(reg, ab[None])
        all_boxes.append(boxes.reshape(b, -1, 4))
        all_probs.append(_sigmoid(cls).reshape(b, -1, cls.shape[-1]))
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_probs, axis=1)


@partial(
    jax.jit,
    static_argnames=(
        "top_k", "iou_thresh", "score_thresh", "max_outputs",
        "class_aware", "mode", "soft_sigma", "class_aware_candidates",
        "fused", "pallas",
    ),
)
def detections_from_dense(
    boxes: jnp.ndarray,
    probs: jnp.ndarray,
    *,
    top_k: int = 1024,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.05,
    max_outputs: int = 100,
    class_aware: bool = True,
    mode: str = "hard",
    soft_sigma: float = 0.3,
    class_aware_candidates: bool = False,
    fused: bool | None = None,
    pallas: bool | None = None,
):
    """Batched candidate selection + NMS over dense (boxes, probs).

    ``fused`` selects the one-kernel selection+suppression path
    (`ops.nms.dense_nms`): no top-k stage — greedy NMS runs directly on
    the full dense set via iterative argmax, strictly more complete than
    any ``top_k`` truncation (identical when ``top_k >= M``). Default
    ``None`` auto-enables it on TPU for the hard / argmax-class
    configuration it covers (Pallas kernel, A/B in BASELINE.md); soft-NMS
    and combined-NMS candidate semantics always use the two-stage path.

    ``class_aware_candidates=True`` ranks all M*C (box, class) pairs so one
    box can surface under several classes — TF
    ``combined_non_max_suppression`` semantics, the reference FCOS infer
    path (`FCOS/infer_fcos.py:58-61`). False ranks each box only under its
    argmax class (the reference `cpu_nms` path,
    `RetinaNet/retinanet_module.py:510-524`).

    ``pallas=False`` keeps the whole graph free of Pallas primitives (the
    pure-XLA/jnp twins everywhere) — required for multi-platform
    ``jax.export`` artifacts, where JAX lowers every platform rule of a
    pallas_call eqn even inside an unselected `platform_dependent` branch.
    """
    # f32 from here on: NMS geometry needs the precision, and the fused /
    # two-stage platform branches must agree on output avals.
    boxes = boxes.astype(jnp.float32)
    probs = probs.astype(jnp.float32)

    def fused_single(bx, pr):
        return nms_lib.dense_nms(
            bx, jnp.max(pr, axis=-1),
            jnp.argmax(pr, axis=-1).astype(jnp.int32),
            iou_thresh=iou_thresh, score_thresh=score_thresh,
            max_outputs=max_outputs, class_aware=class_aware,
            use_pallas=pallas,
        )

    def twostage_single(bx, pr):
        cb, cs, cc = nms_lib.select_top_k(
            bx, pr, top_k, class_aware_candidates=class_aware_candidates
        )
        return nms_lib.nms(
            cb, cs, cc,
            iou_thresh=iou_thresh, score_thresh=score_thresh,
            max_outputs=max_outputs, class_aware=class_aware,
            mode=mode, soft_sigma=soft_sigma, use_pallas=pallas,
        )

    if fused is None:
        if pallas is False:
            single = twostage_single  # pallas-free: two-stage everywhere
        elif mode == "hard" and not class_aware_candidates:
            # Per-platform structure choice via `lax.platform_dependent`
            # (not a trace-time `on_tpu()` pick): preserves the measured
            # defaults — fused one-kernel NMS on TPU, two-stage elsewhere —
            # while letting a multi-platform `jax.export` artifact lower
            # every requested platform (r3 ADVICE.md medium).
            def single(bx, pr):
                return jax.lax.platform_dependent(
                    bx, pr, tpu=fused_single, default=twostage_single
                )
        else:
            single = twostage_single  # soft/combined: two-stage only
    else:
        single = fused_single if fused else twostage_single

    return jax.vmap(single)(boxes, probs)


def class_heatmap(probs: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Max class probability per cell for the heatmap jpg dumps
    (`infer_fcos.py:64-116`). probs: [M, nc] flattened from a single level
    of shape hw. Returns [h, w]."""
    return jnp.max(probs, axis=-1).reshape(hw)
