"""Backbone zoo (Flax, from scratch, NHWC).

Mirrors the reference's backbone options — ResNet-50/101/152
(`RetinaNet/retinanet_module.py:32-52`), ResNeXt-50/101 (ibid:53-66, via
grouped convolutions), MobileNetV2 (`FCOS/fcos.py:37-41`) — but trains from
scratch with He init + BN instead of loading ImageNet Keras weights
(SURVEY.md §7.1: weight porting is a tool, not a dependency). Each backbone
returns the C3/C4/C5 taps (strides 8/16/32) the detectors consume.
"""
from __future__ import annotations

import os
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from detectax.models.layers import (
    BatchNorm,
    ConvBN,
    bn_f32_stats as _bn_f32_stats,
)
from detectax.ops.pool import max_pool_3x3_s2

Dtype = Any


class BottleneckBlock(nn.Module):
    """ResNet bottleneck: 1x1 -> 3x3 -> 1x1(x4), BN+ReLU.

    `stride_first=False` (default) puts the stride on the 3x3 (v1.5);
    `stride_first=True` puts it on the first 1x1 (Keras/original v1 —
    needed by the TF weight-port tool, `detectax/tools/port_tf_weights`).
    """

    features: int  # bottleneck width; output is `expansion`x
    stride: int = 1
    groups: int = 1
    expansion: int = 4  # ResNet 4x; ResNeXt 2x (width 128 -> out 256)
    project: bool = False
    stride_first: bool = False
    conv_bias: bool = False
    torch_pad: bool = False  # symmetric (1,1) pad on the 3x3 (torch conv)
    bn_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1 = self.stride if self.stride_first else 1
        s3 = 1 if self.stride_first else self.stride
        out_ch = self.expansion * self.features
        # XLA "SAME" pads a stride-2 3x3 asymmetrically (0,1); torch pads
        # (1,1) — explicit padding keeps ported torchvision weights exact.
        pad3 = ((1, 1), (1, 1)) if self.torch_pad else "SAME"
        shortcut = x
        if self.project:
            shortcut = ConvBN(
                out_ch, kernel=1, stride=self.stride, act=False,
                use_bias=self.conv_bias, bn_eps=self.bn_eps,
                dtype=self.dtype, name="proj",
            )(x, train)
        h = ConvBN(self.features, kernel=1, stride=s1,
                   use_bias=self.conv_bias, bn_eps=self.bn_eps,
                   dtype=self.dtype)(x, train)
        h = ConvBN(
            self.features, kernel=3, stride=s3, groups=self.groups,
            padding=pad3,
            use_bias=self.conv_bias, bn_eps=self.bn_eps, dtype=self.dtype,
        )(h, train)
        h = ConvBN(out_ch, kernel=1, act=False,
                   use_bias=self.conv_bias, bn_eps=self.bn_eps,
                   dtype=self.dtype)(h, train)
        return nn.relu(h + shortcut)


class ResNet(nn.Module):
    """ResNet / ResNeXt trunk with C3/C4/C5 taps.

    `stage_sizes`: blocks per stage (C2..C5), e.g. (3,4,6,3) for ResNet-50.
    `groups=32, width_factor=2, expansion=2` yields ResNeXt 32x4d
    (bottleneck widths 128/256/512/1024, stage outputs 256/512/1024/2048 —
    the channel plan of the reference's `Classifiers.get("resnext50")`
    backbone, `RetinaNet/retinanet_module.py:53-66`).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    groups: int = 1
    width_factor: int = 1
    expansion: int = 4
    keras_compat: bool = False  # Keras v1 conventions for weight porting
    torch_compat: bool = False  # torchvision conventions (ResNeXt port)
    s2d_stem: bool | None = None  # None: DETECTAX_S2D_STEM env decides
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.keras_compat and self.torch_compat)
        bn_eps = 1.001e-5 if self.keras_compat else 1e-5
        # Space-to-depth stem: same function, same params, ~MXU-friendly
        # evaluation (see layers._S2DConv7x7). Opt-in while the measured
        # win is being characterized; requires even input dims.
        s2d = self.s2d_stem
        if s2d is None:
            s2d = os.environ.get("DETECTAX_S2D_STEM") == "1"
        s2d = s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if self.keras_compat or self.torch_compat:
            # Keras/torch stem: explicit (3,3) pad + 7x7/2 VALID conv, then
            # (1,1) pad + 3x3/2 VALID maxpool (torch convs carry no bias;
            # zero-pad == torch's -inf pool pad because inputs are
            # post-ReLU, hence non-negative)
            h = ConvBN(
                self.width, kernel=7, stride=2,
                padding=((3, 3), (3, 3)), use_bias=self.keras_compat,
                bn_eps=bn_eps, s2d=s2d,
                dtype=self.dtype, name="stem",
            )(x, train)
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        else:
            h = ConvBN(self.width, kernel=7, stride=2, dtype=self.dtype,
                       s2d=s2d, name="stem")(x, train)
            # DETECTAX_POOL_VJP=1 swaps in the select-and-scatter-free
            # backward (ops/pool.py; r4 profile: the stem pool's S&S
            # backward runs at 324 GB/s)
            h = max_pool_3x3_s2(h)
        taps = {}
        for stage, n_blocks in enumerate(self.stage_sizes):
            feats = self.width * (2**stage) * self.width_factor
            for blk in range(n_blocks):
                stride = 2 if (blk == 0 and stage > 0) else 1
                h = BottleneckBlock(
                    feats,
                    stride=stride,
                    groups=self.groups,
                    expansion=self.expansion,
                    project=(blk == 0),
                    stride_first=self.keras_compat,
                    conv_bias=self.keras_compat,
                    torch_pad=self.torch_compat,
                    bn_eps=bn_eps,
                    dtype=self.dtype,
                    name=f"stage{stage + 2}_block{blk}",
                )(h, train)
            if stage >= 1:
                taps[f"c{stage + 2}"] = h
        return taps  # c3: stride 8, c4: stride 16, c5: stride 32


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual block."""

    features: int
    stride: int = 1
    expand: int = 6
    bn_eps: float = 1e-3  # Keras MobileNetV2 convention (weight-portable)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = ConvBN(in_ch * self.expand, kernel=1, act="relu6",
                       bn_eps=self.bn_eps, dtype=self.dtype,
                       name="expand")(h, train)
        h = nn.Conv(
            h.shape[-1], (3, 3), strides=(self.stride, self.stride),
            padding="SAME", feature_group_count=h.shape[-1], use_bias=False,
            dtype=self.dtype, name="depthwise",
        )(h)
        h = BatchNorm(
            force_float32_reductions=_bn_f32_stats(),
            use_running_average=not train, momentum=0.9,
            epsilon=self.bn_eps, dtype=self.dtype,
        )(h)
        h = nn.relu6(h)
        h = ConvBN(self.features, kernel=1, act=False, bn_eps=self.bn_eps,
                   dtype=self.dtype, name="project")(h, train)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


# (expand, channels, repeats, first-stride) per group — standard MobileNetV2
MBV2_CONFIG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    """MobileNetV2 trunk with taps at the reference's extraction points:
    stride-8 (post 32-ch group ≈ block_6_expand), stride-16 (post 96-ch
    group ≈ block_13_expand), stride-32 final 1280-ch conv (Conv_1) —
    `FCOS/fcos.py:40-41`."""

    width_mult: float = 1.0
    bn_eps: float = 1e-3  # Keras MobileNetV2 convention (weight-portable)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(ch):
            return max(8, int(ch * self.width_mult + 4) // 8 * 8)

        h = ConvBN(c(32), kernel=3, stride=2, act="relu6",
                   bn_eps=self.bn_eps, dtype=self.dtype,
                   name="stem")(x, train)
        taps = {}
        current_stride = 2
        for gi, (exp, ch, reps, s0) in enumerate(MBV2_CONFIG):
            for r in range(reps):
                stride = s0 if r == 0 else 1
                current_stride *= stride
                h = InvertedResidual(
                    c(ch), stride=stride, expand=exp, bn_eps=self.bn_eps,
                    dtype=self.dtype, name=f"group{gi}_block{r}",
                )(h, train)
            if gi == 2:
                taps["c3"] = h  # stride 8
            elif gi == 4:
                taps["c4"] = h  # stride 16
        h = ConvBN(c(1280), kernel=1, act="relu6", bn_eps=self.bn_eps,
                   dtype=self.dtype, name="head_conv")(h, train)
        taps["c5"] = h  # stride 32
        return taps


class TinyBackbone(nn.Module):
    """Minimal 3-tap trunk for tests/benchmark harnesses — not a reference
    model; exists so machinery tests (train step, sharding, checkpoints)
    compile in seconds instead of minutes on the CPU test mesh."""

    width: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(self.width, kernel=3, stride=2, dtype=self.dtype)(x, train)
        h = ConvBN(self.width, kernel=3, stride=2, dtype=self.dtype)(h, train)
        c3 = ConvBN(self.width * 2, kernel=3, stride=2, dtype=self.dtype)(h, train)
        c4 = ConvBN(self.width * 4, kernel=3, stride=2, dtype=self.dtype)(c3, train)
        c5 = ConvBN(self.width * 8, kernel=3, stride=2, dtype=self.dtype)(c4, train)
        return {"c3": c3, "c4": c4, "c5": c5}


BACKBONES = {
    "tiny": lambda dtype: TinyBackbone(dtype=dtype),
    "resnet50": lambda dtype: ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype),
    "resnet101": lambda dtype: ResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype),
    "resnet152": lambda dtype: ResNet(stage_sizes=(3, 8, 36, 3), dtype=dtype),
    "resnext50": lambda dtype: ResNet(
        stage_sizes=(3, 4, 6, 3), groups=32, width_factor=2, expansion=2,
        dtype=dtype,
    ),
    "resnext101": lambda dtype: ResNet(
        stage_sizes=(3, 4, 23, 3), groups=32, width_factor=2, expansion=2,
        dtype=dtype,
    ),
    "mobilenetv2": lambda dtype: MobileNetV2(dtype=dtype),
}


def build_backbone(name: str, dtype=jnp.float32) -> nn.Module:
    """Build a backbone by name, e.g. ``"resnet50"``.

    A ``:keras`` / ``:torch`` suffix (``"resnet50:keras"``,
    ``"resnext50:torch"``) builds the trunk with that zoo's exact
    conventions (stride placement, padding, BN eps, conv bias) so weights
    ported by `detectax.tools.port_tf_weights` reproduce the pretrained
    features bit-for-bit — the reference always trains on the pretrained
    Keras graph (`FCOS/fcos.py:30-41`), and the suffix is this build's
    equivalent. MobileNetV2 is already Keras-geometry, so ``:keras`` is a
    no-op for it.
    """
    name = name.lower()
    compat = "none"
    if ":" in name:
        name, compat = name.split(":", 1)
    try:
        bb = BACKBONES[name](dtype)
    except KeyError:
        raise ValueError(
            f"unknown backbone {name!r}; options: {sorted(BACKBONES)}"
        ) from None
    if compat == "none" or (compat == "keras" and name == "mobilenetv2"):
        return bb
    if not isinstance(bb, ResNet):
        raise ValueError(
            f"compat suffix {compat!r} unsupported for backbone {name!r}"
        )
    if compat == "keras":
        return bb.clone(keras_compat=True)
    if compat == "torch":
        return bb.clone(torch_compat=True)
    raise ValueError(f"unknown backbone compat {compat!r} (keras|torch)")
