"""Config-frontier sweep: combined BN/batch levers on the flagship step.

Round-4 measured each bandwidth lever alone (BASELINE.md r4 lever table);
this sweeps their *combinations* plus batch 32 to find the true best
training config. All configs run interleaved in one process (relay
congestion drift hits every arm equally), LHS scheduler on (production
default), min-of-N windows.

Levers:
  - ``DETECTAX_BN_STAT_SUBSET=4``  — BN statistics from B/4 examples
    (ghost-batch-norm-style; reads 1/4 of the stat-pass bytes)
  - ``DETECTAX_BN_BF16_STATS=1``   — stat reductions in bf16 (halves the
    remaining stat bytes; r2 measured it a win alone, never combined)
  - ``freeze_bn``                  — running-average BN (the production
    fine-tune config; no stat pass at all)
  - batch 32                       — amortizes weight traffic + fixed
    overheads; per-image activation bytes unchanged

Usage: python benchmarks/config_frontier.py [--steps 30] [--windows 3]
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

ENV_KEYS = ("DETECTAX_BN_STAT_SUBSET", "DETECTAX_BN_BF16_STATS")


def measure(args, label: str, env: dict, freeze_bn: bool, batch: int,
            cache: dict):
    for k in ENV_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)
    from detectax.models import FCOS
    from detectax.ops import assign
    from detectax.train import losses as det_losses
    from detectax.train.loop import make_train_step, tpu_compiler_options
    from detectax.train.schedules import exponential_with_floor, \
        make_optimizer

    img, nc = 384, 20
    if batch not in cache:
        cache[batch] = build(img, batch)
    _, state, batch_data = cache[batch]
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
    jfn = jax.jit(step, compiler_options=tpu_compiler_options())
    sec = _time_fn(jfn, (state, batch_data), args.steps, args.windows,
                   True)
    flops = _flops_of(jfn.lower(state, batch_data).compile())
    row = {
        "config": label,
        "batch": batch,
        "ms_per_step": round(sec * 1000, 2),
        "img_per_sec": round(batch / sec, 1),
        "mfu_pct": round(100 * (flops or 0) / sec / PEAK_BF16_FLOPS, 1),
    }
    print(json.dumps(row), flush=True)
    return row


CONFIGS = [
    # (label, env, freeze_bn, batch)
    ("base", {}, False, 16),
    ("subset4", {"DETECTAX_BN_STAT_SUBSET": "4"}, False, 16),
    ("subset4+bf16stats",
     {"DETECTAX_BN_STAT_SUBSET": "4", "DETECTAX_BN_BF16_STATS": "1"},
     False, 16),
    ("bf16stats", {"DETECTAX_BN_BF16_STATS": "1"}, False, 16),
    ("freeze_bn", {}, True, 16),
    ("base_b32", {}, False, 32),
    ("subset4_b32", {"DETECTAX_BN_STAT_SUBSET": "4"}, False, 32),
    ("freeze_bn_b32", {}, True, 32),
]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--only", nargs="*", default=None,
                   help="subset of config labels to run")
    args = p.parse_args(argv)
    out = {}
    cache = {}
    for label, env, freeze_bn, batch in CONFIGS:
        if args.only and label not in args.only:
            continue
        out[label] = measure(args, label, env, freeze_bn, batch, cache)
    print(json.dumps({"config_frontier_fcos_r50_384": out}), flush=True)


if __name__ == "__main__":
    main()
