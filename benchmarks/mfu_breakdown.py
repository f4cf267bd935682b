"""MFU investigation: phase breakdown, canvas sweep, and compiler levers.

The r3 VERDICT flagged the 36-44% MFU plateau as explained only by prose
("shape-intrinsic P6/P7 underfill + backward transposed convs") with no
measurement behind it. This script produces the measurements:

1. **Phase breakdown** of the flagship step (FCOS-R50 384px b16 bf16):
   separately compiled assignment / forward / forward+loss / grad /
   full-step graphs, each timed min-of-3-windows with device-resident
   inputs. backward ~= grad - (fwd+loss); optimizer ~= full - grad.
2. **Canvas sweep** (384/512/640): if the small-P6/P7-underfill thesis is
   right, MFU must rise with canvas (the tiny levels shrink relative to
   the rest of the step).
3. **Compiler levers** via `jax.jit(..., compiler_options=...)` — these
   travel through PJRT compile options and reach the TPU compiler even on
   this relay backend (env XLA_FLAGS/LIBTPU_INIT_ARGS do not: libtpu runs
   on the remote host).

Usage: python benchmarks/mfu_breakdown.py [--steps 30] [--windows 3]
Prints one JSON line per measurement; paste the summary into BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/detectax_tpu_cache"
)

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16_FLOPS = 197e12


def _force(x) -> float:
    return float(jnp.ravel(jnp.asarray(x))[0])


def _flops_of(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _time_fn(fn, args, steps: int, windows: int, carry_state: bool):
    """min-of-N-windows per-call time. carry_state: fn returns (state, aux)
    and we thread state (train-step semantics); else output is discarded
    (forward-only graphs)."""
    state = args[0]
    out = None
    for _ in range(2):  # warmup (compile + 1)
        out = fn(state, *args[1:])
        if carry_state:
            state = out[0]
            _ = _force(jax.tree_util.tree_leaves(state.params)[0])
        else:
            _ = _force(jax.tree_util.tree_leaves(out)[0])
    per = max(1, steps // windows)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(per):
            out = fn(state, *args[1:])
            if carry_state:
                state = out[0]
        if carry_state:
            _ = _force(jax.tree_util.tree_leaves(state.params)[0])
        else:
            _ = _force(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / per)
    return best


def build(img: int, batch: int, backbone: str = "resnet50", nc: int = 20):
    from detectax.models import FCOS
    from detectax.ops import assign
    from detectax.train import losses as det_losses
    from detectax.train.loop import create_train_state, make_train_step
    from detectax.train.schedules import exponential_with_floor, make_optimizer

    model = FCOS(num_classes=nc, backbone=backbone, dtype=jnp.bfloat16)
    opt = make_optimizer("sgd", exponential_with_floor(5e-4))

    def assign_fn(b, l, v):
        outs, _ = assign.fcos_assign(
            b, l, v, img_dim=(img, img), num_classes=nc
        )
        return outs

    raw_step = make_train_step(
        model, assign_fn, det_losses.fcos_loss, opt, donate=False, jit=False
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((batch, img, img, 3)), opt
    )

    rng = np.random.default_rng(0)
    boxes = np.zeros((batch, 16, 4), np.float32)
    boxes[:, :, 0] = rng.uniform(0.3, 0.7, (batch, 16))
    boxes[:, :, 1] = rng.uniform(0.3, 0.7, (batch, 16))
    boxes[:, :, 2] = rng.uniform(0.05, 0.5, (batch, 16))
    boxes[:, :, 3] = rng.uniform(0.05, 0.5, (batch, 16))
    batch_data = {
        "images": jnp.asarray(
            rng.normal(size=(batch, img, img, 3)).astype(np.float32)
        ),
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(
            rng.integers(0, nc, (batch, 16)).astype(np.int32)
        ),
        "valid": jnp.ones((batch, 16), bool),
    }
    parts = {
        "model": model, "assign_fn": assign_fn,
        "loss": det_losses.fcos_loss, "raw_step": raw_step,
    }
    return parts, state, batch_data


def phase_breakdown(args):
    img, batch = 384, 16
    parts, state, batch_data = build(img, batch)
    model, assign_fn = parts["model"], parts["assign_fn"]
    loss_fn = parts["loss"]

    def assign_only(state, bd):
        del state
        return jax.vmap(assign_fn)(bd["boxes"], bd["labels"], bd["valid"])

    def fwd_only(state, bd):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            bd["images"], train=True, mutable=["batch_stats"],
        )[0]

    def fwd_loss(state, bd):
        y_true = jax.vmap(assign_fn)(bd["boxes"], bd["labels"], bd["valid"])
        y_pred, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            bd["images"], train=True, mutable=["batch_stats"],
        )
        return loss_fn(y_true, y_pred)["total"] / len(bd["images"])

    def grad_only(state, bd):
        return jax.grad(
            lambda p: fwd_loss(state.replace(params=p), bd)
        )(state.params)

    rows = {}
    graphs = {
        "assign": (assign_only, False),
        "forward": (fwd_only, False),
        "forward+loss": (fwd_loss, False),
        "grad(fwd+bwd)": (grad_only, False),
        "full step": (parts["raw_step"], True),
    }
    for name, (fn, carry) in graphs.items():
        jfn = jax.jit(fn)
        sec = _time_fn(jfn, (state, batch_data), args.steps, args.windows,
                       carry)
        flops = _flops_of(jfn.lower(state, batch_data).compile())
        rows[name] = {
            "ms": round(sec * 1000, 2),
            "tflops": round((flops or 0) / 1e12, 3),
            "mfu_pct": round(100 * (flops or 0) / sec / PEAK_BF16_FLOPS, 1),
        }
    # derived phases
    rows["backward (grad - fwd+loss)"] = {
        "ms": round(rows["grad(fwd+bwd)"]["ms"] - rows["forward+loss"]["ms"],
                    2)
    }
    rows["update (full - grad)"] = {
        "ms": round(rows["full step"]["ms"] - rows["grad(fwd+bwd)"]["ms"], 2)
    }
    print(json.dumps({"phase_breakdown_384px_b16": rows}), flush=True)


def canvas_sweep(args):
    out = {}
    for img in (384, 512, 640):
        parts, state, batch_data = build(img, 16)
        jfn = jax.jit(parts["raw_step"])
        sec = _time_fn(jfn, (state, batch_data), args.steps, args.windows,
                       True)
        flops = _flops_of(jfn.lower(state, batch_data).compile())
        out[f"{img}px"] = {
            "ms_per_step": round(sec * 1000, 2),
            "img_per_sec": round(16 / sec, 1),
            "step_tflops": round((flops or 0) / 1e12, 3),
            "mfu_pct": round(
                100 * (flops or 0) / sec / PEAK_BF16_FLOPS, 1
            ),
        }
        print(json.dumps({f"canvas_{img}": out[f"{img}px"]}), flush=True)
    print(json.dumps({"canvas_sweep_fcos_r50_b16": out}), flush=True)


LEVERS = {
    "baseline": {},
    "latency_hiding_scheduler": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
    },
    "scoped_vmem_128k": {
        "xla_tpu_scoped_vmem_limit_kib": "131072",
    },
    "aggressive_fusion": {
        "xla_tpu_rwb_fusion": "true",
        "xla_tpu_enable_multi_level_nested_loop_fusion": "true",
    },
}


def levers(args):
    img, batch = 384, 16
    parts, state, batch_data = build(img, batch)
    out = {}
    for name, opts in LEVERS.items():
        try:
            jfn = jax.jit(parts["raw_step"], compiler_options=opts or None)
            sec = _time_fn(jfn, (state, batch_data), args.steps,
                           args.windows, True)
            flops = _flops_of(jfn.lower(state, batch_data).compile())
            out[name] = {
                "ms_per_step": round(sec * 1000, 2),
                "img_per_sec": round(batch / sec, 1),
                "mfu_pct": round(
                    100 * (flops or 0) / sec / PEAK_BF16_FLOPS, 1
                ),
                "options": opts,
            }
        except Exception as e:  # record rejected options honestly
            out[name] = {"error": f"{type(e).__name__}: {e}",
                         "options": opts}
        print(json.dumps({f"lever_{name}": out[name]}), flush=True)
    print(json.dumps({"compiler_levers_384px_b16": out}), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--only", choices=("phases", "canvas", "levers"),
                   default=None)
    args = p.parse_args(argv)
    if args.only in (None, "phases"):
        phase_breakdown(args)
    if args.only in (None, "canvas"):
        canvas_sweep(args)
    if args.only in (None, "levers"):
        levers(args)


if __name__ == "__main__":
    main()
