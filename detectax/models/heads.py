"""Shared conv towers and prediction heads.

The reference builds 4-layer 256-channel towers whose convs are *shared
across FPN levels* and applied with no activation between layers — only one
ReLU after the 4th conv (`FCOS/fcos.py:16-27, 78-102`). That quirk is kept
(flag-switchable) for parity. Head convs are per-level.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from detectax.models.layers import focal_bias_init

Dtype = Any


class ConvTower(nn.Module):
    """4 x 3x3 conv (no bias) shared tower; ReLU applied once at the end by
    default (reference behavior), or between layers with `act_between`."""

    features: int = 256
    n_layers: int = 4
    act_between: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            x = nn.Conv(
                self.features, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"layer_{i + 1}",
            )(x)
            if self.act_between and i < self.n_layers - 1:
                x = nn.relu(x)
        return nn.relu(x)


class HeadConv(nn.Module):
    """3x3 prediction conv; `focal_bias=True` initializes the bias to
    log(0.01/0.99) (reference classification heads)."""

    features: int
    focal_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (3, 3), padding="SAME", use_bias=True,
            bias_init=focal_bias_init if self.focal_bias else nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
