"""Per-detector loss compositions over the shared ops.losses library.

Each mirrors a reference `model_loss` / `train_loss`:

* `fcos_loss` — `FCOS/fcos.py:464-496` (cen L1-on-sigmoid or focal
  per `FCOS/fcos_center.py:382-389`), reg smooth-L1 or -log-IoU.
* `centernet_s8_loss` — `CenterNet/tf_centernet_resnet_s8.py:368-385`:
  per-slot focal + objectness-masked smooth-L1.
* `hourglass_loss` — `CenterNet/tf_hourglass_net.py:372-388`: sigmoid-BCE
  or focal on [objectness + classes], plain L1 on reg masked by the
  objectness channel.
* `retinanet_loss` — `RetinaNet/retinanet_module.py:403-426`: focal +
  masked smooth-L1 over every (level, anchor) map.

All return per-example-sum scalars; the train step divides by batch size
(the reference's `divide_no_nan(acc, batch)` normalization,
`FCOS/train_fcos.py:179-180`).

Each dict also carries ``num_pos`` — the number of positive cells in the
batch — so the step can instead normalize by positives
(``loss_norm="pos"``, the FCOS-paper convention). The reference's
sum-over-cells losses reach O(100) with grad norms O(1000); against its
global-norm clip of 1.0 that crushes the effective step size, which the
reference survived only because its backbones start ImageNet-pretrained.
From-scratch runs (DetBench) use positive normalization.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

import os

from detectax.ops.losses import (
    focal_loss as _focal_xla,
    iou_loss,
    sigmoid_bce_loss,
    smooth_l1_loss,
)

if os.environ.get("DETECTAX_PALLAS_FOCAL", "0") == "1":
    # Pallas fused focal kernel. Numerics verified equal to the XLA path
    # (tests/test_pallas_kernels.py). Round-3 TPU v5e A/B at the flagship
    # training shape (benchmarks/pallas_ab.py, BASELINE.md): measured
    # parity — 0.94x fwd / 1.03x fwd+bwd vs XLA, i.e. XLA's fusion already
    # matches the hand kernel — so the XLA path stays default and this
    # remains opt-in.
    from detectax.ops.pallas.focal import focal_loss_pallas as focal_loss
else:
    focal_loss = _focal_xla


def fcos_loss(
    y_true: Sequence[jnp.ndarray],
    y_pred: Sequence[jnp.ndarray],
    *,
    reg_type: str = "l1",
    cen_type: str = "l1",
    cls_lambda: float = 2.5,
    reg_lambda: float = 1.0,
):
    """Multi-level FCOS loss. Layout per level: [reg(4), cen(1), cls(nc)]."""
    cls_loss = 0.0
    reg_loss = 0.0
    cen_loss = 0.0
    num_pos = 0.0
    for yt, yp in zip(y_true, y_pred):
        obj = jnp.max(yt[..., 5:], axis=-1)
        mask = (obj >= 1.0).astype(jnp.float32)
        num_pos += jnp.sum(mask)
        cls_loss += focal_loss(yt[..., 5:], yp[..., 5:])
        if cen_type == "l1":
            # reference compares sigmoid(pred) to the target with an
            # unmasked smooth-L1 (FCOS/fcos.py:483-486). jax.nn.sigmoid,
            # NOT 1/(1+exp(-x)): the naive form's VJP is 0*inf = NaN once
            # a background logit drifts below ~-88 (exp overflow) — the
            # unmasked L1 pushes background centerness there.
            cen_loss += smooth_l1_loss(
                yt[..., 4], jax.nn.sigmoid(yp[..., 4])
            )
        else:
            cen_loss += focal_loss(yt[..., 4], yp[..., 4])
        if reg_type == "iou":
            reg_loss += iou_loss(yt[..., :4], yp[..., :4], mask)
        else:
            reg_loss += smooth_l1_loss(yt[..., :4], yp[..., :4], mask=mask)
    total = cls_lambda * cls_loss + reg_lambda * (reg_loss + cen_loss)
    return {
        "cls": cls_loss, "reg": reg_loss, "cen": cen_loss, "total": total,
        "num_pos": num_pos,
    }


def centernet_s8_loss(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    *,
    cls_lambda: float = 1.0,
    reg_lambda: float = 1.0,
):
    """Scale-slot loss over [B, h, w, S, 4+nc] maps.

    Positives are cells whose class target reaches 1.0 — identical to
    (obj > 0) for the reference's one-hot targets, and keeps regression
    centroid-only under `gaussian_cls` soft targets (tails < 1.0)."""
    obj = jnp.max(y_true[..., 4:], axis=-1)
    mask = (obj >= 1.0 - 1e-6).astype(jnp.float32)
    cls_loss = focal_loss(y_true[..., 4:], y_pred[..., 4:])
    reg_loss = smooth_l1_loss(y_true[..., :4], y_pred[..., :4], mask=mask)
    total = cls_lambda * cls_loss + reg_lambda * reg_loss
    return {"cls": cls_loss, "reg": reg_loss, "total": total,
            "num_pos": jnp.sum(mask)}


def hourglass_loss(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    *,
    loss_type: str = "sigmoid",
    reg_lambda: float = 0.10,
):
    """Hourglass loss over [B, h, w, 4, 5+nc] maps; ch4 = objectness."""
    mask = y_true[..., 4]
    if loss_type == "sigmoid":
        cls_loss = sigmoid_bce_loss(y_true[..., 4:], y_pred[..., 4:])
    else:
        cls_loss = focal_loss(y_true[..., 4:], y_pred[..., 4:])
    # plain (not smooth) L1, reference tf_hourglass_net.py:386-387
    reg_loss = jnp.sum(
        jnp.abs(y_true[..., :4] - y_pred[..., :4]) * mask[..., None]
    )
    total = cls_loss + reg_lambda * reg_loss
    return {"cls": cls_loss, "reg": reg_loss, "total": total,
            "num_pos": jnp.sum(mask)}


def stacked_hourglass_loss(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    *,
    cls_lambda: float = 2.5,
    reg_lambda: float = 1.0,
):
    """Stacked-hourglass loss over [B, h, w, 4+nc] maps.

    Parity with reference `CenterNet/tf_centernet_hourglass.py:492-506`
    (``model_loss``): focal on the class channels, smooth-L1 on the raw
    (t, b, l, r) reg channels masked by cells with any class hit;
    ``cls_lambda=2.5, reg_lambda=1.0`` per its ``train_step`` defaults
    (lines 508-515)."""
    obj = jnp.max(y_true[..., 4:], axis=-1)
    mask = (obj > 0).astype(jnp.float32)
    cls_loss = focal_loss(y_true[..., 4:], y_pred[..., 4:])
    reg_loss = smooth_l1_loss(y_true[..., :4], y_pred[..., :4], mask=mask)
    total = cls_lambda * cls_loss + reg_lambda * reg_loss
    return {"cls": cls_loss, "reg": reg_loss, "total": total,
            "num_pos": jnp.sum(mask)}


def retinanet_loss(
    y_true: Sequence[jnp.ndarray],
    y_pred: Sequence[jnp.ndarray],
    *,
    cls_lambda: float = 1.0,
    reg_lambda: float = 1.0,
):
    """Anchor loss over 5 levels of [B, h, w, A, 4+nc] maps."""
    cls_loss = 0.0
    reg_loss = 0.0
    num_pos = 0.0
    for yt, yp in zip(y_true, y_pred):
        obj = jnp.max(yt[..., 4:], axis=-1)
        mask = (obj > 0).astype(jnp.float32)
        num_pos += jnp.sum(mask)
        cls_loss += focal_loss(yt[..., 4:], yp[..., 4:])
        reg_loss += smooth_l1_loss(yt[..., :4], yp[..., :4], mask=mask)
    total = cls_lambda * cls_loss + reg_lambda * reg_loss
    return {"cls": cls_loss, "reg": reg_loss, "total": total,
            "num_pos": num_pos}
