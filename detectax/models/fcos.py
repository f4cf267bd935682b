"""FCOS detector family (three assignment/head variants).

Mirrors the reference's three FCOS models as one shared-skeleton module:

* ``variant="fcos"`` — `FCOS/fcos.py:6-110`: reg head 5ch (ltrb + centerness
  in the reg head), cls head nc ch. Per-level layout ``[reg(5), cls(nc)]``
  i.e. ``[t,b,l,r,cen,classes]``.
* ``variant="center"`` — `FCOS/fcos_center.py:6-123`: cen(1) + cls(nc) from
  the cls tower, reg(4) linear. Layout ``[reg(4), cen(1), cls(nc)]``.
* ``variant="center_v1"`` — `FCOS/fcos_center_v1.py:6-123`: same heads but
  the reg output is sigmoid-activated (offset+scale parameterization).

All variants share: backbone C3-C5 taps → FPN P3-P7 → cross-level shared
4-layer towers → per-level head convs with focal bias init on class logits.
Outputs are cast to fp32 for loss stability under bf16 compute.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from detectax.models.backbones import build_backbone
from detectax.models.fpn import FPN
from detectax.models.heads import ConvTower, HeadConv

Dtype = Any


class FCOS(nn.Module):
    num_classes: int
    variant: str = "fcos"  # fcos | center | center_v1
    backbone: str = "resnet50"
    features: int = 256
    # Freeze backbone BN statistics during training (standard detection
    # practice; also removes the BN stat reductions that the round-1 trace
    # showed costing ~24% of the train step).
    freeze_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = build_backbone(self.backbone, self.dtype)(
            x, train and not self.freeze_bn
        )
        levels = FPN(self.features, dtype=self.dtype, name="fpn")(taps)

        cls_tower = ConvTower(self.features, dtype=self.dtype, name="cls_tower")
        reg_tower = ConvTower(self.features, dtype=self.dtype, name="reg_tower")

        outs = []
        for i, p in enumerate(levels):
            cf = cls_tower(p)
            rf = reg_tower(p)
            if self.variant == "fcos":
                reg = HeadConv(5, dtype=self.dtype, name=f"reg_head_{i + 1}")(rf)
                cls = HeadConv(
                    self.num_classes, focal_bias=True, dtype=self.dtype,
                    name=f"cls_head_{i + 1}",
                )(cf)
                out = jnp.concatenate([reg, cls], axis=-1)
            else:
                reg = HeadConv(4, dtype=self.dtype, name=f"reg_head_{i + 1}")(rf)
                if self.variant == "center_v1":
                    reg = nn.sigmoid(reg)
                cen = HeadConv(
                    1, focal_bias=True, dtype=self.dtype,
                    name=f"cen_head_{i + 1}",
                )(cf)
                cls = HeadConv(
                    self.num_classes, focal_bias=True, dtype=self.dtype,
                    name=f"cls_head_{i + 1}",
                )(cf)
                out = jnp.concatenate([reg, cen, cls], axis=-1)
            outs.append(out.astype(jnp.float32))
        return outs
