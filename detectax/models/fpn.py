"""Feature pyramid networks.

`FPN` mirrors the reference P3-P7 topology (`FCOS/fcos.py:48-74`): 1x1
laterals on C3-C5, nearest-neighbor x2 upsample residual adds (note the
reference adds up(P4_1x1), not up(P4_residual), at P3 — reproduced), 3x3
output convs, stride-2 P6 from C5 and P7 from relu(P6).

`S8CollapseFPN` mirrors `CenterNet/tf_centernet_resnet_s8.py:141-169`:
P6/P7 built from P5_1x1, then a full top-down residual chain
P7→P6→P5→P4→P3 collapsed into one stride-8 feature map.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from detectax.models.layers import upsample_to

Dtype = Any


class FPN(nn.Module):
    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps):
        c3, c4, c5 = taps["c3"], taps["c4"], taps["c5"]
        conv = lambda k, s, name: nn.Conv(
            self.features, (k, k), strides=(s, s), padding="SAME",
            dtype=self.dtype, name=name,
        )
        p3_1x1 = conv(1, 1, "c3_1x1")(c3)
        p4_1x1 = conv(1, 1, "c4_1x1")(c4)
        p5_1x1 = conv(1, 1, "c5_1x1")(c5)

        p4_res = p4_1x1 + upsample_to(p5_1x1, p4_1x1.shape[1:3])
        # Reference quirk kept: P3 adds up(P4_1x1), not up(P4_residual)
        # (FCOS/fcos.py:59-60).
        p3_res = p3_1x1 + upsample_to(p4_1x1, p3_1x1.shape[1:3])

        p3 = conv(3, 1, "c3_3x3")(p3_res)
        p4 = conv(3, 1, "c4_3x3")(p4_res)
        p5 = conv(3, 1, "c5_3x3")(p5_1x1)
        p6 = conv(3, 2, "c6_3x3")(c5)
        p7 = conv(3, 2, "c7_3x3")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]


class S8CollapseFPN(nn.Module):
    """Top-down chain collapsed to one stride-8 map."""

    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps):
        c3, c4, c5 = taps["c3"], taps["c4"], taps["c5"]
        conv = lambda k, s, name: nn.Conv(
            self.features, (k, k), strides=(s, s), padding="SAME",
            dtype=self.dtype, name=name,
        )
        p3_1x1 = conv(1, 1, "c3_1x1")(c3)
        p4_1x1 = conv(1, 1, "c4_1x1")(c4)
        p5_1x1 = conv(1, 1, "c5_1x1")(c5)

        p6 = conv(3, 2, "c6_3x3")(p5_1x1)
        p6_relu = nn.relu(p6)
        p7 = conv(3, 2, "c7_3x3")(p6_relu)

        p6_res = p6_relu + upsample_to(p7, p6_relu.shape[1:3])
        p5_res = p5_1x1 + upsample_to(p6_res, p5_1x1.shape[1:3])
        p4_res = p4_1x1 + upsample_to(p5_res, p4_1x1.shape[1:3])
        p3_res = p3_1x1 + upsample_to(p4_res, p3_1x1.shape[1:3])
        return conv(3, 1, "cnn_feature_map")(p3_res)
