"""Greedy NMS suppression as a Pallas TPU kernel.

The whole candidate set lives in VMEM laid out as coordinate *rows*
(`[8, K]`: y1,x1,y2,x2,area — lane-dim = candidates), and the sequential
greedy sweep computes each round's suppression row on the fly with VPU
vector ops — the `[K, K]` IoU matrix is never materialized (SURVEY.md
§7.2.11c). Input must be score-descending; returns the keep mask.

Numerics match `detectax.ops.nms._suppression_mask` (oracle-tested against
the reference's `cpu_nms`, `RetinaNet/retinanet_module.py:453-481`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detectax.ops.pallas._common import on_tpu, round_up

LANE = 128


def _nms_kernel(rows_ref, keep_ref, iou_thresh, class_aware=False):
    k = rows_ref.shape[1]
    y1 = rows_ref[0:1, :]
    x1 = rows_ref[1:2, :]
    y2 = rows_ref[2:3, :]
    x2 = rows_ref[3:4, :]
    area = rows_ref[4:5, :]
    valid = rows_ref[5:6, :]  # 1.0 for real candidates, 0.0 for padding
    cls = rows_ref[6:7, :]    # class id as float (class-aware mode)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    keep_ref[:] = valid

    def body(i, _):
        # Extract candidate i's scalars via one-hot reductions — Mosaic has
        # no dynamic lane-indexed scalar load, but [1,K] reductions are
        # cheap VPU ops.
        onehot = (idx == i).astype(jnp.float32)
        by1 = jnp.sum(y1 * onehot)
        bx1 = jnp.sum(x1 * onehot)
        by2 = jnp.sum(y2 * onehot)
        bx2 = jnp.sum(x2 * onehot)
        barea = jnp.sum(area * onehot)
        keep_i = jnp.sum(keep_ref[0:1, :] * onehot)

        ih = jnp.maximum(0.0, jnp.minimum(y2, by2) - jnp.maximum(y1, by1))
        iw = jnp.maximum(0.0, jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1))
        inter = ih * iw
        iou = inter / (area + barea - inter + 1e-8)

        sup = (
            (iou > iou_thresh)
            & (idx > i)
            & (keep_i > 0.5)
        )
        if class_aware:
            bcls = jnp.sum(cls * onehot)
            sup = sup & (jnp.abs(cls - bcls) < 0.5)
        keep_ref[:] = keep_ref[:] * (1.0 - sup.astype(jnp.float32))
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def suppression_mask_pallas(
    boxes: jnp.ndarray,
    iou_thresh: float,
    valid: jnp.ndarray | None = None,
    classes: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Keep mask for score-descending corner boxes ``[K, 4]``.

    ``classes`` (int ``[K]``): when given, suppression only acts between
    same-class candidates (class-aware NMS) — the cross-class IoU masking
    happens inside the kernel, no [K, K] matrix anywhere.
    """
    if interpret is None:
        interpret = not on_tpu()
    k = boxes.shape[0]
    kp = round_up(k, LANE)
    b = jnp.pad(boxes.astype(jnp.float32), ((0, kp - k), (0, 0)))
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    if valid is None:
        v = jnp.pad(jnp.ones((k,), jnp.float32), (0, kp - k))
    else:
        v = jnp.pad(valid.astype(jnp.float32), (0, kp - k))
    if classes is None:
        c = jnp.zeros((kp,), jnp.float32)
    else:
        # padding gets class -1 so it can never alias a real class
        c = jnp.pad(
            classes.astype(jnp.float32), (0, kp - k), constant_values=-1.0
        )
    rows = jnp.stack(
        [b[:, 0], b[:, 1], b[:, 2], b[:, 3], area, v, c,
         jnp.zeros_like(v)],
        axis=0,
    )  # [8, Kp]
    keep = pl.pallas_call(
        functools.partial(
            _nms_kernel, iou_thresh=iou_thresh,
            class_aware=classes is not None,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        interpret=interpret,
    )(rows)
    return keep[0, :k] > 0.5


# ---------------------------------------------------------------------------
# Fused dense NMS: selection + suppression in ONE kernel (ROADMAP #3).
#
# Instead of the two-stage XLA-top-k -> greedy-sweep pipeline, this kernel
# runs greedy NMS *directly on the dense candidate set*: each of the
# `max_outputs` rounds finds the argmax of the live scores (a [1, M] VPU
# max-reduction — no sort, no top-k, no candidate gather), emits it, and
# masks everything it suppresses to -inf. Work is O(max_outputs * M) VPU
# ops vs O(M log M) sort + O(K^2) sweep, and the candidate boxes never
# leave VMEM between selection and suppression.
#
# Semantics: identical to sort-by-score-descending + greedy sweep (ties
# broken by lower index, matching stable argsort) over the FULL dense set —
# i.e. the two-stage path with top_k = M. Reference behavior anchor: the
# numpy NMS the CenterNet-S8 path runs over all decoded cells
# (`/root/reference/CenterNet/tf_centernet_resnet_s8.py:44-85`).
# ---------------------------------------------------------------------------

_BIG = 1e9


def _dense_nms_kernel(
    rows_ref, out_ref, *, iou_thresh, max_outputs, class_aware
):
    m = rows_ref.shape[1]
    op = out_ref.shape[1]
    y1 = rows_ref[0:1, :]
    x1 = rows_ref[1:2, :]
    y2 = rows_ref[2:3, :]
    x2 = rows_ref[3:4, :]
    area = rows_ref[4:5, :]
    cls = rows_ref[5:6, :]

    # Mosaic iota must be integer-typed; compare/select in int32 and only
    # cast where float math needs it.
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    out_idx = jax.lax.broadcasted_iota(jnp.int32, (1, op), 1)

    def body(t, carry):
        live, out_acc = carry  # live: [1, M] scores; out_acc: [8, Op]
        smax = jnp.max(live)
        picked = (smax > -_BIG * 0.5).astype(jnp.float32)
        # argmax with lowest-index tie-break (matches stable descending sort)
        sel = jnp.min(jnp.where(live >= smax, idx, jnp.int32(2**31 - 1)))
        onehot = (idx == sel).astype(jnp.float32)

        by1 = jnp.sum(y1 * onehot)
        bx1 = jnp.sum(x1 * onehot)
        by2 = jnp.sum(y2 * onehot)
        bx2 = jnp.sum(x2 * onehot)
        barea = jnp.sum(area * onehot)
        bcls = jnp.sum(cls * onehot)

        # emit into output column t (gated on `picked`)
        col = (out_idx == t).astype(jnp.float32) * picked  # [1, Op]
        vals = jnp.concatenate(
            [
                by1 * col, bx1 * col, by2 * col, bx2 * col,
                smax * col, bcls * col, col,  # valid flag
                jnp.zeros_like(col),
            ],
            axis=0,
        )  # [8, Op]
        out_acc = out_acc + vals

        # suppress: the selected box itself + everything it overlaps
        ih = jnp.maximum(0.0, jnp.minimum(y2, by2) - jnp.maximum(y1, by1))
        iw = jnp.maximum(0.0, jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1))
        inter = ih * iw
        iou = inter / (area + barea - inter + 1e-8)
        sup = iou > iou_thresh
        if class_aware:
            sup = sup & (jnp.abs(cls - bcls) < 0.5)
        dead = (sup & (picked > 0.5)) | (onehot > 0.5)
        live = jnp.where(dead, -_BIG, live)
        return live, out_acc

    live0 = rows_ref[6:7, :]  # pre-floored scores (-_BIG where invalid)
    out0 = jnp.zeros((8, op), jnp.float32)
    _, out_acc = jax.lax.fori_loop(0, max_outputs, body, (live0, out0))
    out_ref[:] = out_acc


def dense_nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray | None = None,
    *,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.0,
    max_outputs: int = 100,
    class_aware: bool = True,
    interpret: bool | None = None,
):
    """Fused selection+suppression greedy NMS over dense candidates.

    Args:
      boxes: ``[M, 4]`` corner boxes (unsorted — the kernel selects).
      scores: ``[M]``; candidates below ``score_thresh`` never surface.
      classes: optional int ``[M]``, reported for survivors; when
        ``class_aware`` is also True, suppression only acts within a class.

    Returns the same dict as `detectax.ops.nms.nms` (boxes/scores/classes/
    valid [max_outputs] + num_valid), survivors in pick (score) order.
    """
    if interpret is None:
        interpret = not on_tpu()
    m = boxes.shape[0]
    mp = round_up(m, LANE)
    op = round_up(max_outputs, LANE)

    b = jnp.pad(boxes.astype(jnp.float32), ((0, mp - m), (0, 0)))
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    s = jnp.pad(
        scores.astype(jnp.float32), (0, mp - m), constant_values=-_BIG
    )
    live0 = jnp.where(s >= score_thresh, s, -_BIG)
    if classes is None:
        c = jnp.zeros((mp,), jnp.float32)
    else:
        c = jnp.pad(
            classes.astype(jnp.float32), (0, mp - m), constant_values=-1.0
        )
    rows = jnp.stack(
        [b[:, 0], b[:, 1], b[:, 2], b[:, 3], area, c, live0,
         jnp.zeros_like(s)],
        axis=0,
    )  # [8, Mp]

    out = pl.pallas_call(
        functools.partial(
            _dense_nms_kernel,
            iou_thresh=iou_thresh,
            max_outputs=max_outputs,
            class_aware=class_aware and classes is not None,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, op), jnp.float32),
        interpret=interpret,
    )(rows)

    valid = out[6, :max_outputs] > 0.5
    vf = valid.astype(jnp.float32)
    return {
        "boxes": jnp.stack(
            [out[0, :max_outputs], out[1, :max_outputs],
             out[2, :max_outputs], out[3, :max_outputs]], axis=-1
        ) * vf[:, None],
        "scores": out[4, :max_outputs] * vf,
        "classes": jnp.where(
            valid, jnp.round(out[5, :max_outputs]).astype(jnp.int32), -1
        ),
        "valid": valid,
        "num_valid": jnp.sum(valid.astype(jnp.int32)),
    }


def dense_nms_reference(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray | None = None,
    *,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.0,
    max_outputs: int = 100,
    class_aware: bool = True,
):
    """Pure-jnp twin of `dense_nms_pallas` (tests / non-TPU fallback).

    Same iterative-argmax algorithm, O(max_outputs * M), no [M, M] matrix.
    """
    m = boxes.shape[0]
    b = boxes.astype(jnp.float32)
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    s = scores.astype(jnp.float32)
    live0 = jnp.where(s >= score_thresh, s, -_BIG)
    c = (jnp.zeros((m,), jnp.float32) if classes is None
         else classes.astype(jnp.float32))
    idx = jnp.arange(m, dtype=jnp.float32)

    def body(t, carry):
        live, ob, os_, oc, ov = carry
        smax = jnp.max(live)
        picked = smax > -_BIG * 0.5
        sel = jnp.argmin(jnp.where(live >= smax, idx, _BIG)).astype(jnp.int32)
        bb = b[sel]
        ih = jnp.maximum(
            0.0, jnp.minimum(b[:, 2], bb[2]) - jnp.maximum(b[:, 0], bb[0])
        )
        iw = jnp.maximum(
            0.0, jnp.minimum(b[:, 3], bb[3]) - jnp.maximum(b[:, 1], bb[1])
        )
        inter = ih * iw
        iou = inter / (area + area[sel] - inter + 1e-8)
        sup = iou > iou_thresh
        if class_aware and classes is not None:
            sup = sup & (jnp.abs(c - c[sel]) < 0.5)
        dead = (sup & picked) | (jnp.arange(m) == sel)
        live = jnp.where(dead, -_BIG, live)
        pf = picked.astype(jnp.float32)
        ob = ob.at[t].set(bb * pf)
        os_ = os_.at[t].set(smax * pf)
        oc = oc.at[t].set(jnp.where(picked, c[sel].astype(jnp.int32), -1))
        ov = ov.at[t].set(picked)
        return live, ob, os_, oc, ov

    ob = jnp.zeros((max_outputs, 4), jnp.float32)
    os_ = jnp.zeros((max_outputs,), jnp.float32)
    oc = jnp.full((max_outputs,), -1, jnp.int32)
    ov = jnp.zeros((max_outputs,), bool)
    _, ob, os_, oc, ov = jax.lax.fori_loop(
        0, max_outputs, body, (live0, ob, os_, oc, ov)
    )
    return {
        "boxes": ob,
        "scores": os_,
        "classes": oc,
        "valid": ov,
        "num_valid": jnp.sum(ov.astype(jnp.int32)),
    }
