"""Shared NN building blocks (Flax linen, NHWC, TPU-friendly).

Conventions: parameters live in fp32 (`param_dtype`); compute dtype is
configurable (bf16 on TPU for MXU throughput). BatchNorm keeps running
statistics in the `batch_stats` collection; pass `train=True` to update.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Focal-prior bias log(0.01/0.99) used by every classification head in the
# reference (`FCOS/fcos.py:11-13`).
FOCAL_BIAS = math.log(0.01 / 0.99)


def bn_f32_stats() -> bool:
    """Whether BatchNorm statistics reduce in fp32 (flax default).

    Profiling shows the bf16->fp32 convert+reduce fusions for BN stats are
    ~24% of the flagship train step (ROADMAP r1). Setting
    ``DETECTAX_BN_BF16_STATS=1`` computes the stats in bf16 instead — an
    opt-in experiment: mean is fine in bf16 but E[x^2]-E[x]^2 variance
    loses precision, so validate the loss curve before adopting.
    """
    import os

    return os.environ.get("DETECTAX_BN_BF16_STATS", "0") != "1"


def bn_stat_subset() -> int:
    """Batch-subset divisor for BatchNorm statistics (HBM-bandwidth lever).

    With live BN statistics every ConvBN re-reads its activation for the
    E[x]/E[x^2] reduction — profiled at ~4.5 ms (24%) of the flagship
    step (BASELINE.md roofline). ``DETECTAX_BN_STAT_SUBSET=k`` computes
    the batch statistics from only the first ``B/k`` examples (the full
    batch is still normalized and the running averages still update):
    the stat pass reads 1/k of the activation bytes. Statistically this
    is ghost-batch-norm-style subsampling — at detection batch sizes the
    per-channel sample count (B/k * H * W) stays in the thousands.
    Default off (0/1): exact reference BN semantics.
    """
    import os

    try:
        return int(os.environ.get("DETECTAX_BN_STAT_SUBSET", "0"))
    except ValueError:  # pragma: no cover
        return 0


class BatchNorm(nn.Module):
    """Drop-in for `nn.BatchNorm` (same param/collection names, same
    auto-name "BatchNorm_N") restricted to the conventions this codebase
    uses (feature axis -1, scale+bias on, fast variance), plus the
    subset-statistics mode of `bn_stat_subset`.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    force_float32_reductions: bool = True

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (features,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (features,),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (features,),
        )

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            sub = bn_stat_subset()
            xs = x
            if sub > 1 and x.ndim >= 2 and x.shape[0] >= sub:
                xs = x[: x.shape[0] // sub]
            red_dtype = (
                jnp.float32 if self.force_float32_reductions else self.dtype
            )
            xr = xs.astype(red_dtype)
            axes = tuple(range(xr.ndim - 1))
            mean = jnp.mean(xr, axis=axes)
            mean2 = jnp.mean(jnp.square(xr), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (
                    m * ra_mean.value + (1 - m) * mean.astype(jnp.float32)
                )
                ra_var.value = (
                    m * ra_var.value + (1 - m) * var.astype(jnp.float32)
                )

        xd, mean_, var_, scale_, bias_ = nn.dtypes.promote_dtype(
            x, mean, var, scale, bias, dtype=self.dtype
        )
        return (xd - mean_) * jax.lax.rsqrt(var_ + self.epsilon) * scale_ \
            + bias_


def focal_bias_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, FOCAL_BIAS, dtype=dtype)


def upsample2x(x: jnp.ndarray, method: str = "nearest") -> jnp.ndarray:
    """2x spatial upsampling.

    `nearest` matches Keras UpSampling2D default (FPN residual paths,
    `FCOS/fcos.py:57-60`); `bilinear` matches the hourglass decoder
    (`CenterNet/tf_hourglass_net.py:223-224`).
    """
    b, h, w, c = x.shape
    if method == "nearest":
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def upsample_to(x: jnp.ndarray, hw: tuple, method: str = "nearest") -> jnp.ndarray:
    """Upsample to an exact spatial shape (robust when stride-2 levels
    bottom out at 1x1 and a plain 2x repeat would mismatch the lateral)."""
    b, h, w, c = x.shape
    if (h, w) == tuple(hw):
        return x
    if method == "nearest" and hw[0] == 2 * h and hw[1] == 2 * w:
        return upsample2x(x, "nearest")
    return jax.image.resize(x, (b, hw[0], hw[1], c), method=method)


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/b, W/b, C*b*b].

    TPU-friendly re-layout used for the hourglass multi-resolution feature
    concat: the reference flattens each stage to stride-8 dims with a raw
    `tf.reshape` (`CenterNet/tf_hourglass_net.py:275-316`); we use a proper
    pixel-unshuffle (same element count, spatially coherent) — documented
    deviation.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, c * block * block)


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H*b, W*b, C/(b*b)] (inverse of space_to_depth)."""
    b, h, w, c = x.shape
    cs = c // (block * block)
    x = x.reshape(b, h, w, block, block, cs)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * block, w * block, cs)


class _S2DConv7x7(nn.Module):
    """7×7/s2 conv evaluated as a 4×4/s1 conv over space-to-depth input.

    Exact reparameterization of the ResNet stem conv (the MLPerf
    space-to-depth trick): a Cin=3 7×7 conv runs the MXU at ~12 TF/s
    (measured, benchmarks/r4/profile_step.log — the worst op in the
    flagship step) because 3 input channels underfill the 128-lane
    contraction; folding the 2×2 pixel neighborhood into channels gives
    the identical function with Cin=12 and a 4×4 kernel. Param tree is
    bit-identical to `nn.Conv` (name "Conv_0", params "kernel"/"bias",
    same shapes and inits) so checkpoints and ported weights are
    unaffected — the repack below is a pure function of the 7×7 kernel,
    traced into the step and fused by XLA (9 KB of weight movement).

    `pad_low` is the spatial low-side padding of the original conv: 2 for
    XLA "SAME" on even inputs, 3 for the Keras/torch explicit-(3,3) stem.
    Requires even input H/W (every canvas is).
    """

    features: int
    pad_low: int = 2
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, c_in, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
            if self.use_bias else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        # Original output: o(i) = Σ_t W[t]·x[2i + t - pad_low]. Write the
        # input offset u = t - pad_low as u = 2p + dy (p: s2d pixel
        # offset, dy: phase); t spans 0..6, so p spans 4 values and the
        # repacked kernel index a = p - p_min satisfies t = 2a + dy + s
        # with s = pad_low + 2·p_min. pad_low=2 → p ∈ [-1, 2], s = 0;
        # pad_low=3 → p ∈ [-2, 1], s = -1.
        if self.pad_low == 2:
            w8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
            s2d_pad = (1, 2)
        elif self.pad_low == 3:
            w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            s2d_pad = (2, 1)
        else:  # pragma: no cover
            raise ValueError(f"unsupported stem pad_low {self.pad_low}")
        # [t=2a+dy, t'=2b+dx, c, f] -> [a, b, (dy, dx, c), f], matching
        # space_to_depth's (dy, dx, c) channel packing
        w4 = w8.reshape(4, 2, 4, 2, c_in, self.features)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * c_in, self.features
        )
        xs = space_to_depth(x, 2)
        out = jax.lax.conv_general_dilated(
            xs, w4, window_strides=(1, 1),
            padding=(s2d_pad, s2d_pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            out = out + bias
        return out


class ConvBN(nn.Module):
    """Conv + BatchNorm + optional ReLU.

    `padding` may be "SAME", "VALID", or explicit ((t,b),(l,r)) — the
    latter reproduces Keras's ZeroPadding2D+valid stem convention for the
    weight-port tool. `s2d=True` (7×7/s2 stems only) switches to the
    space-to-depth evaluation of the same function (`_S2DConv7x7`).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    act: Any = True  # True/"relu" | "relu6" (MobileNetV2) | False
    groups: int = 1
    padding: Any = "SAME"
    s2d: bool = False
    bn_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d:
            assert self.kernel == 7 and self.stride == 2 and self.groups == 1
            assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            pad_low = 2 if self.padding == "SAME" else self.padding[0][0]
            x = _S2DConv7x7(
                self.features, pad_low=pad_low, use_bias=self.use_bias,
                dtype=self.dtype, name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=self.padding,
                use_bias=self.use_bias,
                feature_group_count=self.groups,
                dtype=self.dtype,
            )(x)
        x = BatchNorm(
            force_float32_reductions=bn_f32_stats(),
            use_running_average=not train, momentum=0.9,
            epsilon=self.bn_eps, dtype=self.dtype,
        )(x)
        if self.act == "relu6":
            x = nn.relu6(x)
        elif self.act:
            x = nn.relu(x)
        return x


class SeparableConv(nn.Module):
    """Depthwise-separable conv (Keras SeparableConv2D equivalent)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            name="pointwise",
        )(x)
        return x


class HourglassConvBlock(nn.Module):
    """Reference `cnn_block` (CenterNet/tf_hourglass_net.py:34-79):
    `n_repeats` of [BN (norm_first) -> (separable)conv -> relu], with a
    residual add from the block input on repeats > 0."""

    features: int
    kernel: int = 3
    stride: int = 1
    n_repeats: int = 1
    separable: bool = True
    batch_norm: bool = True
    norm_order: str = "norm_first"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        for i in range(self.n_repeats):
            h = inp
            if self.batch_norm and self.norm_order == "norm_first":
                h = BatchNorm(
                    force_float32_reductions=bn_f32_stats(),
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}",
                )(h)
            conv = (
                SeparableConv(self.features, self.kernel, self.stride,
                              dtype=self.dtype, name=f"conv_{i}")
                if self.separable
                else nn.Conv(
                    self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    dtype=self.dtype, name=f"conv_{i}",
                )
            )
            h = conv(h)
            if self.batch_norm and self.norm_order == "norm_last":
                h = BatchNorm(
                    force_float32_reductions=bn_f32_stats(),
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}",
                )(h)
            h = nn.relu(h)
            out = h if i == 0 else h + inp
            inp = out
        return inp


class HourglassDownsample(nn.Module):
    """Reference `downsample_block` (tf_hourglass_net.py:81-113):
    BN -> stride-2 (separable)conv -> relu."""

    features: int
    kernel: int = 3
    separable: bool = True
    batch_norm: bool = True
    norm_order: str = "norm_first"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        if self.batch_norm and self.norm_order == "norm_first":
            h = BatchNorm(
                force_float32_reductions=bn_f32_stats(),
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(h)
        conv = (
            SeparableConv(self.features, self.kernel, 2, dtype=self.dtype)
            if self.separable
            else nn.Conv(
                self.features, (self.kernel, self.kernel), strides=(2, 2),
                padding="SAME", dtype=self.dtype,
            )
        )
        h = conv(h)
        if self.batch_norm and self.norm_order == "norm_last":
            h = BatchNorm(
                force_float32_reductions=bn_f32_stats(),
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(h)
        return nn.relu(h)


class FocalBias(nn.Module):
    """Trainable scalar bias initialized to the focal prior.

    Equivalent of the reference's `BiasLayer`
    (`CenterNet/tf_bias_layer.py:4-14`) applied to hourglass class logits.
    """

    init_value: float = FOCAL_BIAS

    @nn.compact
    def __call__(self, x):
        b = self.param(
            "bias", lambda k: jnp.asarray(self.init_value, jnp.float32)
        )
        return x + b.astype(x.dtype)
