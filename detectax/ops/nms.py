"""Fixed-shape, deterministic NMS for TPU.

One kernel (+ flags) replaces the reference's three NMS variants
(SURVEY.md §2.5.6):

* TF ``combined_non_max_suppression`` — batched, class-aware
  (`FCOS/infer_fcos.py:58-61`) → ``class_aware=True``.
* numpy class-wise NMS with soft-NMS option
  (`CenterNet/tf_centernet_resnet_s8.py:44-85`) → ``class_aware=True`` +
  ``mode="soft"``.
* pure-python class-agnostic ``cpu_nms``
  (`RetinaNet/retinanet_module.py:453-481`) → ``class_aware=False``.

Everything is static-shape: callers pre-select K candidates with
`select_top_k`, suppression runs over a ``[K, K]`` IoU matrix with a
`lax.fori_loop`, and results come back padded to ``max_outputs`` with a
validity mask. Class-aware mode zeroes cross-class entries of the IoU
matrix directly (exact — no coordinate-offset precision loss) rather than
running a per-class Python loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from detectax.ops.boxes import pairwise_iou_corners

# Candidate-count threshold above which hard-NMS suppression runs as the
# Pallas kernel (never materializes the [K, K] IoU matrix) instead of the
# XLA fori-loop over a precomputed matrix. Pinned from the round-3 TPU A/B
# (benchmarks/pallas_ab.py device-chained protocol, TPU v5e, table in
# BASELINE.md): Pallas wins at every K measured — 1.29x @K=256, 1.46x @512,
# 1.83x @1024, 2.11x @2048 — so the kernel is on from the smallest shape
# measured; below 256 both paths sit under the relay dispatch floor and the
# XLA path is kept for simplicity.
PALLAS_SUPPRESSION_MIN_K = 256


def _use_pallas_suppression(k: int) -> bool:
    try:
        from detectax.ops.pallas._common import on_tpu

        return on_tpu() and k >= PALLAS_SUPPRESSION_MIN_K
    except Exception:  # pragma: no cover
        return False


def select_top_k(
    boxes: jnp.ndarray,
    cls_scores: jnp.ndarray,
    k: int,
    class_aware_candidates: bool = False,
):
    """Select the top-k candidate (box, score, class) triples.

    Args:
      boxes: ``[M, 4]`` corner boxes.
      cls_scores: ``[M, C]`` per-class probabilities.
      k: static number of candidates to keep.
      class_aware_candidates: if True, rank all ``M*C`` (box, class) pairs
        (TF combined-NMS semantics, a box can surface under several
        classes); if False, rank boxes by their max-prob class (the
        reference's `cpu_nms` path, `retinanet_module.py:510-524`).

    Returns:
      (boxes ``[k, 4]``, scores ``[k]``, classes ``[k]`` int32)
    """
    m, c = cls_scores.shape
    if class_aware_candidates:
        flat = cls_scores.reshape(-1)  # [M*C]
        k_eff = min(k, m * c)
        scores, idx = jax.lax.top_k(flat, k_eff)
        box_idx = idx // c
        classes = (idx % c).astype(jnp.int32)
        out_boxes = boxes[box_idx]
    else:
        best = jnp.max(cls_scores, axis=-1)
        k_eff = min(k, m)
        scores, box_idx = jax.lax.top_k(best, k_eff)
        classes = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)[box_idx]
        out_boxes = boxes[box_idx]
    if k_eff < k:
        pad = k - k_eff
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, (0, pad), constant_values=-1.0)
        classes = jnp.pad(classes, (0, pad))
    return out_boxes, scores, classes


def _suppression_mask(iou: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Greedy hard-NMS keep mask for score-descending candidates.

    ``keep[i] = no kept j < i has iou[j, i] > thresh`` — the classic greedy
    rule, evaluated with a sequential `fori_loop` whose body is a full
    vector op (O(K) steps of O(K) VPU work).
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        row_sup = (iou[i] > thresh) & (idx > i) & keep[i]
        return keep & ~row_sup

    return jax.lax.fori_loop(0, k, body, jnp.ones(k, dtype=bool))


def _soft_nms_scores(
    iou: jnp.ndarray, scores: jnp.ndarray, sigma: float
) -> jnp.ndarray:
    """Soft-NMS rescoring (Bodla et al. 2017), Gaussian decay.

    Parity with reference `CenterNet/tf_centernet_resnet_s8.py:76-81`:
    ``score *= exp(-iou^2 / sigma)`` against each selected box, applied in
    score order. Returns the decayed scores; callers threshold afterwards.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(_, state):
        scores_cur, done = state
        masked = jnp.where(done, -jnp.inf, scores_cur)
        i = jnp.argmax(masked)
        weight = jnp.exp(-(iou[i] ** 2) / sigma)
        others = ~done & (idx != i)
        scores_new = jnp.where(others, scores_cur * weight, scores_cur)
        return scores_new, done.at[i].set(True)

    scores_out, _ = jax.lax.fori_loop(
        0, k, body, (scores, jnp.zeros(k, dtype=bool))
    )
    return scores_out


@partial(
    jax.jit,
    static_argnames=(
        "iou_thresh",
        "score_thresh",
        "max_outputs",
        "class_aware",
        "mode",
        "soft_sigma",
        "use_pallas",
    ),
)
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    *,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.0,
    max_outputs: int = 100,
    class_aware: bool = True,
    mode: str = "hard",
    soft_sigma: float = 0.3,
    use_pallas: bool | None = None,
):
    """Deterministic fixed-shape NMS over K pre-selected candidates.

    Args:
      boxes: ``[K, 4]`` corner boxes (any consistent axis order).
      scores: ``[K]``; classes: ``[K]`` int32.

    Returns:
      dict of ``boxes [max_outputs, 4]``, ``scores [max_outputs]``,
      ``classes [max_outputs]``, ``valid [max_outputs]`` bool, and
      ``num_valid`` scalar — sorted by final score descending.
    """
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    classes_s = classes[order]

    def _xla_keep(bx, cl):
        iou = pairwise_iou_corners(bx, bx)
        if class_aware:
            same_class = cl[:, None] == cl[None, :]
            iou = iou * same_class.astype(iou.dtype)
        return _suppression_mask(iou, iou_thresh)

    def _pallas_keep(bx, cl):
        from detectax.ops.pallas.nms_kernel import suppression_mask_pallas

        return suppression_mask_pallas(
            bx, iou_thresh, classes=cl if class_aware else None,
            interpret=False,
        )

    if use_pallas is None and mode == "hard" and (
        boxes.shape[0] >= PALLAS_SUPPRESSION_MIN_K
    ):
        # Per-platform lowering (not a trace-time `on_tpu()` pick): every
        # platform of a multi-platform `jax.export` artifact gets a branch
        # it can actually lower — the Pallas sweep on TPU, the [K, K]
        # fori-loop elsewhere (r3 ADVICE.md medium).
        keep = jax.lax.platform_dependent(
            boxes_s, classes_s, tpu=_pallas_keep, default=_xla_keep
        )
        keep = keep & (scores_s >= score_thresh)
        return _compact(boxes_s, scores_s, classes_s, keep, max_outputs)

    if use_pallas is None:
        use_pallas = mode == "hard" and _use_pallas_suppression(
            boxes.shape[0]
        )

    if mode == "soft":
        iou = pairwise_iou_corners(boxes_s, boxes_s)
        if class_aware:
            same_class = classes_s[:, None] == classes_s[None, :]
            iou = iou * same_class.astype(iou.dtype)
        new_scores = _soft_nms_scores(iou, scores_s, soft_sigma)
        # Re-rank by decayed score; keep everything above threshold
        # (reference drops boxes decayed to <= 0,
        # tf_centernet_resnet_s8.py:83-84).
        reorder = jnp.argsort(-new_scores)
        boxes_s = boxes_s[reorder]
        classes_s = classes_s[reorder]
        scores_s = new_scores[reorder]
        keep = scores_s > jnp.maximum(score_thresh, 0.0)
    elif use_pallas:
        # Pallas sweep: no [K, K] IoU matrix is ever materialized; class
        # masking happens inside the kernel.
        from detectax.ops.pallas.nms_kernel import suppression_mask_pallas

        keep = suppression_mask_pallas(
            boxes_s, iou_thresh,
            classes=classes_s if class_aware else None,
        )
        keep = keep & (scores_s >= score_thresh)
    else:
        iou = pairwise_iou_corners(boxes_s, boxes_s)
        if class_aware:
            same_class = classes_s[:, None] == classes_s[None, :]
            iou = iou * same_class.astype(iou.dtype)
        keep = _suppression_mask(iou, iou_thresh)
        keep = keep & (scores_s >= score_thresh)

    return _compact(boxes_s, scores_s, classes_s, keep, max_outputs)


def _compact(boxes_s, scores_s, classes_s, keep, max_outputs: int):
    """Compact kept entries to the front, pad to max_outputs."""
    k = boxes_s.shape[0]
    rank = jnp.where(keep, jnp.cumsum(keep) - 1, k)
    out_idx = jnp.argsort(
        jnp.where(keep, rank, k + jnp.arange(k))
    )[:max_outputs]
    valid = keep[out_idx]
    vf = valid.astype(boxes_s.dtype)
    return {
        "boxes": boxes_s[out_idx] * vf[:, None],
        "scores": scores_s[out_idx] * vf,
        "classes": jnp.where(valid, classes_s[out_idx], -1),
        "valid": valid,
        # survivors actually returned (keep count clamped to max_outputs)
        "num_valid": jnp.minimum(
            jnp.sum(keep.astype(jnp.int32)), max_outputs
        ),
    }


def batched_nms(boxes, scores, classes, **kwargs):
    """vmap of `nms` over a leading batch axis (TF combined-NMS shape)."""
    return jax.vmap(lambda b, s, c: nms(b, s, c, **kwargs))(
        boxes, scores, classes
    )


@partial(
    jax.jit,
    static_argnames=(
        "iou_thresh", "score_thresh", "max_outputs", "class_aware",
        "use_pallas",
    ),
)
def dense_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    *,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.0,
    max_outputs: int = 100,
    class_aware: bool = True,
    use_pallas: bool | None = None,
):
    """Fused selection+suppression hard NMS over the FULL dense candidate
    set ``[M]`` — no top-k stage, no sort, no [K, K] matrix.

    Equivalent to ``nms(select_top_k(...), mode="hard")`` with ``top_k=M``
    (iterative argmax == stable descending sort for greedy NMS); strictly
    more complete than any top-k truncation. On TPU this runs as one
    Pallas kernel in which the candidates never leave VMEM between
    selection and suppression (`ops/pallas/nms_kernel.py::dense_nms_pallas`,
    A/B numbers in BASELINE.md); elsewhere as the pure-jnp twin. Reference
    behavior anchor: the numpy NMS over all decoded cells,
    `/root/reference/CenterNet/tf_centernet_resnet_s8.py:44-85`.
    """
    from detectax.ops.pallas.nms_kernel import (
        dense_nms_pallas,
        dense_nms_reference,
    )

    kw = dict(
        iou_thresh=iou_thresh, score_thresh=score_thresh,
        max_outputs=max_outputs, class_aware=class_aware,
    )
    if use_pallas is None:
        # Per-platform lowering so multi-platform exports work (see `nms`):
        # identical algorithm on both branches — the Pallas kernel on TPU,
        # its pure-jnp twin elsewhere — so artifact numerics agree across
        # platforms.
        return jax.lax.platform_dependent(
            boxes, scores, classes,
            tpu=lambda b, s, c: dense_nms_pallas(b, s, c, interpret=False,
                                                 **kw),
            default=lambda b, s, c: dense_nms_reference(b, s, c, **kw),
        )
    fn = dense_nms_pallas if use_pallas else dense_nms_reference
    return fn(boxes, scores, classes, **kw)
