"""Shared helpers for the Pallas TPU kernels."""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
