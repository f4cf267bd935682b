"""A/B the select-and-scatter-free maxpool backward on the flagship step.

The r4 per-op profile (benchmarks/r4/profile_step.log) measured the stem
maxpool's select-and-scatter backward at 324 GB/s — 40% of HBM peak,
0.52 ms of the FCOS-R50@384 b16 step. `DETECTAX_POOL_VJP=1` swaps in the
parity-decomposition backward (detectax/ops/pool.py), which lowers as
ordinary vectorized loop fusions. Forward is bit-identical; gradients
are exact on tie-free input (tests/test_pool_vjp.py, verified on TPU).

Usage: python benchmarks/pool_ab.py [--steps 30] [--windows 3]
Prints one JSON line per config; paste the table into BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/detectax_tpu_cache"
)

import jax
import jax.numpy as jnp

from benchmarks.mfu_breakdown import (
    PEAK_BF16_FLOPS, _flops_of, _time_fn, build,
)


def measure(args, pool_vjp: bool, freeze_bn: bool):
    os.environ["DETECTAX_POOL_VJP"] = "1" if pool_vjp else "0"
    from detectax.models import FCOS
    from detectax.ops import assign
    from detectax.train import losses as det_losses
    from detectax.train.loop import make_train_step
    from detectax.train.schedules import exponential_with_floor, \
        make_optimizer

    img, batch, nc = 384, 16, 20
    parts, state, batch_data = build(img, batch)
    del parts
    model = FCOS(num_classes=nc, backbone="resnet50",
                 dtype=jnp.bfloat16, freeze_bn=freeze_bn)
    opt = make_optimizer("sgd", exponential_with_floor(5e-4))

    def assign_fn(b, l, v):
        outs, _ = assign.fcos_assign(
            b, l, v, img_dim=(img, img), num_classes=nc
        )
        return outs

    step = make_train_step(
        model, assign_fn, det_losses.fcos_loss, opt,
        donate=False, jit=False,
    )
    jfn = jax.jit(step)
    sec = _time_fn(jfn, (state, batch_data), args.steps, args.windows,
                   True)
    flops = _flops_of(jfn.lower(state, batch_data).compile())
    row = {
        "pool_vjp": pool_vjp,
        "freeze_bn": freeze_bn,
        "ms_per_step": round(sec * 1000, 2),
        "img_per_sec": round(batch / sec, 1),
        "mfu_pct": round(100 * (flops or 0) / sec / PEAK_BF16_FLOPS, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--windows", type=int, default=3)
    args = p.parse_args(argv)
    out = {}
    # interleave A/B within one process/session so relay congestion
    # drift hits both arms equally
    for freeze_bn in (False, True):
        for pool_vjp in (False, True):
            key = (f"{'pool' if pool_vjp else 'base'}"
                   f"{'+freeze_bn' if freeze_bn else ''}")
            out[key] = measure(args, pool_vjp, freeze_bn)
    print(json.dumps({"pool_ab_fcos_r50_384_b16": out}), flush=True)


if __name__ == "__main__":
    main()
