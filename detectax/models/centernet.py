"""CenterNet family: ResNet-s8, hourglass (U-Net-ish), stacked hourglass.

Three backbones/heads matching the reference's CenterNet variants:

* `CenterNetS8` — `CenterNet/tf_centernet_resnet_s8.py:87-208`: backbone →
  top-down FPN collapsed to one stride-8 map → shared towers →
  ``n_scales`` per-scale head conv pairs → output
  ``[B, H/8, W/8, S, 4+nc]`` with layout ``[sigmoid reg(4), cls(nc)]``.
  The reference re-runs the (weight-shared) towers once per scale on the
  same input, producing identical activations S times; we compute each
  tower once — mathematically identical, S× less tower compute.
* `CenterNetFPNSingle` — `CenterNet/tf_centernet.py:42-126`: FPN collapsed
  to a single stride-8 map, towers, one cls(nc+1) + reg(4+1) head pair,
  layout ``[ltrb(4), cen(1), cls(nc+1)]`` (heatmap variant).
* `HourglassNet` — `CenterNet/tf_hourglass_net.py:115-345`: from-scratch
  6-stage encoder/decoder with residuals, multi-resolution feature concat
  at stride 8 (reference uses raw `tf.reshape`; we use coherent
  space-to-depth / depth-to-space — documented deviation), head
  ``4*(5+nc)`` reshaped to ``[B, H/8, W/8, 4, 5+nc]``, sigmoid reg,
  trainable scalar focal bias on class logits.
* `StackedHourglass` — `CenterNet/tf_centernet_hourglass.py:87-343`:
  bottleneck blocks, maxpool downsampling, ``n_stacks`` 4-level hourglass
  stacks, single-map head ``[B, H/s, W/s, 4+nc]``. Note: the reference's
  stem+stack topology actually yields output stride 4 while its assigner
  assumes 8 (latent bug in an orphaned file); we expose ``output_stride``
  (= 4 with the faithful topology) and keep assigner/decoder consistent.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from detectax.models.backbones import build_backbone
from detectax.models.fpn import S8CollapseFPN
from detectax.models.heads import ConvTower, HeadConv
from detectax.models.layers import (
    BatchNorm,
    FocalBias,
    HourglassConvBlock,
    HourglassDownsample,
    SeparableConv,
    bn_f32_stats as _bn_f32_stats,
    depth_to_space,
    space_to_depth,
    upsample2x,
)

Dtype = Any


class CenterNetS8(nn.Module):
    num_classes: int
    n_scales: int = 5
    backbone: str = "resnet50"
    features: int = 256
    freeze_bn: bool = False  # freeze backbone BN stats (see models/fcos.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = build_backbone(self.backbone, self.dtype)(
            x, train and not self.freeze_bn
        )
        feat = S8CollapseFPN(self.features, dtype=self.dtype, name="fpn")(taps)

        cf = ConvTower(self.features, dtype=self.dtype, name="cls_tower")(feat)
        rf = ConvTower(self.features, dtype=self.dtype, name="reg_tower")(feat)

        cls_outs, reg_outs = [], []
        for s in range(self.n_scales):
            cls_outs.append(
                HeadConv(
                    self.num_classes, focal_bias=True, dtype=self.dtype,
                    name=f"cls_head_{s + 1}",
                )(cf)
            )
            reg_outs.append(
                nn.sigmoid(
                    HeadConv(4, dtype=self.dtype, name=f"reg_head_{s + 1}")(rf)
                )
            )
        cls = jnp.stack(cls_outs, axis=3)  # [B, h, w, S, nc]
        reg = jnp.stack(reg_outs, axis=3)  # [B, h, w, S, 4]
        return jnp.concatenate([reg, cls], axis=-1).astype(jnp.float32)


class CenterNetFPNSingle(nn.Module):
    """Single stride-8 map heatmap variant (reference tf_centernet.py)."""

    num_classes: int  # heatmap channel count includes background slot +1
    backbone: str = "resnet50"
    features: int = 256
    freeze_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = build_backbone(self.backbone, self.dtype)(
            x, train and not self.freeze_bn
        )
        feat = S8CollapseFPN(self.features, dtype=self.dtype, name="fpn")(taps)
        cf = ConvTower(self.features, dtype=self.dtype, name="cls_tower")(feat)
        rf = ConvTower(self.features, dtype=self.dtype, name="reg_tower")(feat)
        # reg head: 4 ltrb + 1 centerness; cls head: nc+1 (objectness slot)
        reg = HeadConv(5, dtype=self.dtype, name="reg_head")(rf)
        cls = HeadConv(
            self.num_classes + 1, focal_bias=True, dtype=self.dtype,
            name="cls_head",
        )(cf)
        return jnp.concatenate([reg, cls], axis=-1).astype(jnp.float32)


class HourglassNet(nn.Module):
    num_classes: int
    n_filters: int = 16
    n_repeats: int = 2
    n_features: int = 256
    separable: bool = True
    batch_norm: bool = True
    norm_order: str = "norm_first"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.n_filters
        blk = lambda f, name: HourglassConvBlock(
            f, 3, 1, n_repeats=self.n_repeats, separable=self.separable,
            batch_norm=self.batch_norm, norm_order=self.norm_order,
            dtype=self.dtype, name=name,
        )
        down = lambda f, name: HourglassDownsample(
            f, 3, separable=self.separable, batch_norm=self.batch_norm,
            norm_order=self.norm_order, dtype=self.dtype, name=name,
        )
        stem = (
            SeparableConv(nf, 3, 1, dtype=self.dtype, name="cnn_block_0")
            if self.separable
            else nn.Conv(nf, (3, 3), padding="SAME", dtype=self.dtype,
                         name="cnn_block_0")
        )
        h = stem(x)

        # Encoder: 6 [conv block (+residual) -> downsample] stages,
        # channels nf -> 64*nf (tf_hourglass_net.py:144-219).
        enc_in, enc_out = [], []
        for i in range(1, 7):
            c = blk(nf * 2 ** (i - 1), f"cnn_block_{i}")(h, train)
            blk_in = c if i == 1 else h + c
            h = down(nf * 2**i, f"down_block_{i}")(blk_in, train)
            enc_in.append(blk_in)   # pre-downsample (stride 2^(i-1))
            enc_out.append(h)       # post-downsample (stride 2^i)

        # Decoder: 6 [bilinear up -> conv block] with encoder skip adds
        # (tf_hourglass_net.py:221-273).
        dec_outs = []
        d = h
        for i in range(1, 7):
            # dec_i's skip is blk_{8-i}_in (same stride/channels as d):
            # dec2 <- blk6_in ... dec6 <- blk2_in (tf_hourglass_net.py:231-267)
            skip_src = enc_in[7 - i] if i > 1 else None
            if skip_src is not None:
                d = skip_src + d
            d = upsample2x(d, method="bilinear")
            d = blk(nf * 2 ** (6 - i), f"dec_block_{i}")(d, train)
            dec_outs.append(d)  # stride 2^(6-i)

        # Multi-resolution concat at stride 8 (tf_hourglass_net.py:275-316):
        # every encoder output and decoder output re-laid-out to stride-8.
        def to_s8(t, stride):
            if stride > 8:
                return depth_to_space(t, stride // 8)
            if stride < 8:
                return space_to_depth(t, 8 // stride)
            return t

        feats = []
        for i, t in enumerate(enc_out):  # strides 2, 4, 8, 16, 32, 64
            feats.append(to_s8(t, 2 ** (i + 1)))
        for i, t in enumerate(dec_outs):  # strides 32, 16, 8, 4, 2, 1
            feats.append(to_s8(t, 2 ** (5 - i)))
        feat = jnp.concatenate(feats, axis=-1)

        feat = blk(self.n_features, "final_out")(feat, train)
        head = nn.Conv(
            4 * (5 + self.num_classes), (3, 3), padding="SAME",
            dtype=self.dtype, name="head_out",
        )(feat)
        b, hh, ww, _ = head.shape
        head = head.reshape(b, hh, ww, 4, 5 + self.num_classes)
        reg = nn.sigmoid(head[..., :4])
        cls = FocalBias(name="b_focal")(head[..., 4:])
        return jnp.concatenate([reg, cls], axis=-1).astype(jnp.float32)


class BottleneckHGBlock(nn.Module):
    """Stacked-hourglass bottleneck block (tf_centernet_hourglass.py:87-156):
    n_repeats of [BN -> 1x1(nf) -> kxk(nf) -> 1x1(2nf) -> relu] with
    residual adds on repeats > 0."""

    n_filters: int
    kernel: int = 3
    n_repeats: int = 2
    separable: bool = True
    batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        for i in range(self.n_repeats):
            h = inp
            if self.batch_norm:
                h = BatchNorm(
                    force_float32_reductions=_bn_f32_stats(),
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}",
                )(h)
            conv = (
                lambda f, k, name: SeparableConv(f, k, 1, dtype=self.dtype, name=name)
            ) if self.separable else (
                lambda f, k, name: nn.Conv(
                    f, (k, k), padding="SAME", dtype=self.dtype, name=name
                )
            )
            h = conv(self.n_filters, 1, f"bot_{i}")(h)
            h = conv(self.n_filters, self.kernel, f"cnn_{i}")(h)
            h = conv(2 * self.n_filters, 1, f"out_{i}")(h)
            h = nn.relu(h)
            inp = h if i == 0 else h + inp
        return inp


class StackedHourglass(nn.Module):
    num_classes: int
    n_filters: int = 128
    n_stacks: int = 1
    n_repeats: int = 2
    separable: bool = True
    batch_norm: bool = True
    dtype: Dtype = jnp.float32

    # Stem = 7x7/2 conv + block + 2x2 maxpool => stack I/O at stride 4
    output_stride: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.n_filters
        blk = lambda name: BottleneckHGBlock(
            nf, 3, n_repeats=self.n_repeats, separable=self.separable,
            batch_norm=self.batch_norm, dtype=self.dtype, name=name,
        )
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2), padding="SAME")

        stem = (
            SeparableConv(nf, 7, 2, dtype=self.dtype, name="cnn_block_0")
            if self.separable
            else nn.Conv(nf, (7, 7), strides=(2, 2), padding="SAME",
                         dtype=self.dtype, name="cnn_block_0")
        )
        h = stem(x)
        h = blk("cnn_block_1")(h, train)
        h = pool(h)

        for s in range(self.n_stacks):
            pre = f"stack_{s + 1}_"
            # Encoder: 4 levels of [block + residual -> maxpool].
            e_in = []
            cur = h
            for lvl in range(1, 5):
                if lvl < 4:
                    c = blk(pre + f"enc_block_{lvl}")(cur, train)
                else:
                    c = blk(pre + "enc_block_4a")(cur, train)
                    c = blk(pre + "enc_block_4b")(c, train)
                    c = blk(pre + "enc_block_4")(c, train)
                res = cur + c
                e_in.append(cur)
                cur = pool(res)
            # Decoder: 4 levels of [bilinear up + skip block -> out block].
            d = cur
            for lvl in range(1, 5):
                up = upsample2x(d, method="bilinear")
                skip = blk(pre + f"dec_block_{lvl}")(e_in[4 - lvl], train)
                d = blk(pre + f"dec_out_{lvl}")(skip + up, train)
            h = d

        head = nn.Conv(
            4 + self.num_classes, (3, 3), padding="SAME", dtype=self.dtype,
            name="cnn_out",
        )(h)
        # reg heads are RAW (no sigmoid): parity with
        # `tf_centernet_hourglass.py:340-352` — targets are ltrb
        # half-extents in stride units, unbounded above 1.
        reg = head[..., :4]
        cls = FocalBias(name="b_focal")(head[..., 4:])
        return jnp.concatenate([reg, cls], axis=-1).astype(jnp.float32)
