"""A/B the space-to-depth stem on the flagship train step.

The r4 per-op profile (benchmarks/r4/profile_step.log) found the ResNet
stem — a 7×7/s2 conv over Cin=3 — to be the worst op in the FCOS-R50
step: 12.4 TF/s forward + 17.6 TF/s transpose (~1.6 ms), the classic
Cin=3 MXU-underfill pathology. `DETECTAX_S2D_STEM=1` re-evaluates the
same function (identical params) as a 4×4/s1 conv over space-to-depth
input with Cin=12 (models/layers.py::_S2DConv7x7). This script measures
whether the reparameterization pays on the real step, alone and stacked
with the other levers (`--freeze_bn`-equivalent via eval-mode BN is NOT
used here — we measure the default live-BN training config and the
freeze_bn config separately, matching BASELINE.md's lever table).

Usage: python benchmarks/s2d_ab.py [--steps 30] [--windows 3]
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


def measure(args, s2d: bool, freeze_bn: bool):
    os.environ["DETECTAX_S2D_STEM"] = "1" if s2d else "0"
    from detectax.models import FCOS
    from detectax.ops import assign
    from detectax.train import losses as det_losses
    from detectax.train.loop import make_train_step
    from detectax.train.schedules import exponential_with_floor, \
        make_optimizer

    img, batch, nc = 384, 16, 20
    # build() gives the state + device-resident batch; the model/step are
    # rebuilt here so freeze_bn (a model flag) and the stem env var are
    # honored at trace time. Param trees are identical across configs.
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
        "s2d_stem": s2d,
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
        for s2d in (False, True):
            key = (f"{'s2d' if s2d else 'base'}"
                   f"{'+freeze_bn' if freeze_bn else ''}")
            out[key] = measure(args, s2d, freeze_bn)
    print(json.dumps({"s2d_ab_fcos_r50_384_b16": out}), flush=True)


if __name__ == "__main__":
    main()
