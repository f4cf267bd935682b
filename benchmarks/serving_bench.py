"""Serving throughput: end-to-end inference images/sec on device.

Measures the deployed path the export bundle freezes — forward → decode →
candidate select → NMS in one dispatch — via `infer.serving.Predictor`
at each batch bucket, device-resident input (H2D through this relay is
~57 MB/s and would swamp the number; production hosts feed via local
PCIe/DMA). Complements bench.py line 1 (training throughput) and line 2
(single-image decode+NMS latency).

Usage: python benchmarks/serving_bench.py [--family fcos]
           [--backbone mobilenetv2] [--canvas 384] [--buckets 1 8 16]
Prints one JSON line per bucket.
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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="fcos")
    p.add_argument("--backbone", default="mobilenetv2")
    p.add_argument("--canvas", type=int, default=384)
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 16])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--top_k", type=int, default=1024)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True)
    # family knobs (same flags as cli.export_model; must match any real
    # checkpoint's architecture — defaults are the trainer defaults)
    p.add_argument("--center", action="store_true")
    p.add_argument("--box_scales", type=float, nargs="+",
                   default=[32.0, 64.0, 128.0, 256.0, 512.0])
    p.add_argument("--anchor_sizes", type=float, nargs="+",
                   default=[20.0, 40.0, 80.0, 160.0, 320.0])
    p.add_argument("--n_filters", type=int, default=12)
    p.add_argument("--n_stacks", type=int, default=1)
    args = p.parse_args(argv)

    from detectax.cli.evaluate import build_family
    from detectax.infer.export import make_serving_fn

    model, decode = build_family(
        args.family, args.num_classes, args.backbone, args.canvas, args
    )
    if args.bf16 and hasattr(model, "dtype"):
        model = model.clone(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        np.zeros((1, args.canvas, args.canvas, 3), np.float32),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    fn = jax.jit(make_serving_fn(model, decode, top_k=args.top_k))

    rng = np.random.default_rng(0)
    for b in args.buckets:
        # device-resident batch: measure compute, not relay H2D
        images = jax.device_put(
            rng.uniform(-1, 1, (b, args.canvas, args.canvas, 3))
            .astype(np.float32)
        )
        out = fn(params, batch_stats, images)  # compile
        _ = float(np.asarray(out["num_valid"])[0])
        out = fn(params, batch_stats, images)  # warm
        _ = float(np.asarray(out["num_valid"])[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, batch_stats, images)
        _ = float(np.asarray(out["num_valid"])[0])  # completion barrier
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "metric": (
                f"serving_img_per_sec_{args.family}_{args.backbone}"
                f"_{args.canvas}px_b{b}"
            ),
            "value": round(b / dt, 1),
            "unit": "images/sec/chip",
            "detail": {
                "ms_per_batch": round(dt * 1000, 3),
                "iters": args.iters,
                "top_k": args.top_k,
                "device": str(jax.devices()[0]),
            },
        }), flush=True)


if __name__ == "__main__":
    main()
