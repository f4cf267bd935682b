"""RetinaNet detector (anchor-based).

Mirrors reference `RetinaNet/retinanet_module.py:8-159`: backbone C3-C5 →
FPN P3-P7 → shared 4-layer towers → per-level anchor heads.

Head layout deviation (documented, SURVEY.md §7.2.10): the reference builds
**one separate 3x3 conv per (level, anchor)** — 5·9 cls + 5·9 reg convs —
purely as an artifact of its construction loop. By default we emit a single
shared-per-level conv with ``A*(4+nc)`` output channels reshaped to
``[B, h, w, A, 4+nc]`` (one big MXU-friendly matmul instead of 18 small
ones per level). Set ``per_anchor_heads=True`` for the reference's exact
parameterization.

Output: list of 5 arrays ``[B, h_l, w_l, A, 4+nc]`` with layout
``[reg(4), cls(nc)]`` where reg = anchor-relative offsets
(see `detectax.ops.assign.retinanet_assign_level`).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from detectax.models.backbones import build_backbone
from detectax.models.fpn import FPN
from detectax.models.heads import ConvTower, HeadConv

Dtype = Any


class RetinaNet(nn.Module):
    num_classes: int
    n_anchors: int = 9
    backbone: str = "resnet50"
    features: int = 256
    per_anchor_heads: bool = False
    freeze_bn: bool = False  # freeze backbone BN stats (see models/fcos.py)
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
            b, h, w, _ = cf.shape
            if self.per_anchor_heads:
                cls_list, reg_list = [], []
                for a in range(self.n_anchors):
                    cls_list.append(
                        HeadConv(
                            self.num_classes, focal_bias=True,
                            dtype=self.dtype,
                            name=f"cls_head_{i + 1}_anchor_{a + 1}",
                        )(cf)
                    )
                    reg_list.append(
                        HeadConv(
                            4, dtype=self.dtype,
                            name=f"reg_head_{i + 1}_anchor_{a + 1}",
                        )(rf)
                    )
                cls = jnp.stack(cls_list, axis=3)
                reg = jnp.stack(reg_list, axis=3)
            else:
                cls = HeadConv(
                    self.n_anchors * self.num_classes, focal_bias=True,
                    dtype=self.dtype, name=f"cls_head_{i + 1}",
                )(cf).reshape(b, h, w, self.n_anchors, self.num_classes)
                reg = HeadConv(
                    self.n_anchors * 4, dtype=self.dtype,
                    name=f"reg_head_{i + 1}",
                )(rf).reshape(b, h, w, self.n_anchors, 4)
            outs.append(
                jnp.concatenate([reg, cls], axis=-1).astype(jnp.float32)
            )
        return outs
