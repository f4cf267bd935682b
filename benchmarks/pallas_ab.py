"""A/B microbenchmarks: Pallas kernels vs their XLA twins on the TPU.

Product shapes (r1 VERDICT "next" #3a):
  * focal loss — FCOS flagship: 5 levels @384px, batch 16, 20 classes
    (fwd and fwd+bwd, since the kernel runs inside the train step)
  * heatmap peak decode — CenterNet single-map: 48x48 .. 96x96, C classes
  * NMS suppression mask — K=1024 (standard) and K=2048 (dense-crowd)

Prints one JSON line per comparison; paste results into BASELINE.md.
Timing via value fetch (block_until_ready doesn't wait through the relay).
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/detectax_tpu_cache"
)

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def report(name, shape, xla_ms, pallas_ms):
    print(json.dumps({
        "kernel": name,
        "shape": shape,
        "xla_ms": round(xla_ms, 4),
        "pallas_ms": round(pallas_ms, 4),
        "speedup": round(xla_ms / pallas_ms, 2),
    }))


def bench_focal():
    from detectax.ops.losses import focal_loss as focal_xla
    from detectax.ops.pallas.focal import focal_loss_pallas

    rng = np.random.default_rng(0)
    batch, img, nc = 16, 384, 20
    cells = sum((img // s) ** 2 for s in (8, 16, 32, 64, 128))
    labels = (rng.uniform(size=(batch, cells, nc)) > 0.99).astype(np.float32)
    logits = rng.normal(scale=4.0, size=(batch, cells, nc)).astype(np.float32)
    zl, xl = jnp.asarray(labels), jnp.asarray(logits)

    f_x = jax.jit(focal_xla)
    f_p = jax.jit(focal_loss_pallas)
    report("focal_fwd", f"b{batch}x{cells}x{nc}",
           _time(f_x, zl, xl), _time(f_p, zl, xl))

    g_x = jax.jit(jax.grad(lambda l: focal_xla(zl, l)))
    g_p = jax.jit(jax.grad(lambda l: focal_loss_pallas(zl, l)))
    report("focal_fwd_bwd", f"b{batch}x{cells}x{nc}",
           _time(g_x, xl), _time(g_p, xl))


def bench_peak():
    from detectax.ops.pallas.peak_decode import (
        peak_scores_pallas,
        peak_scores_reference,
    )

    rng = np.random.default_rng(1)
    for h, c in ((48, 21), (64, 21), (96, 8)):
        logits = jnp.asarray(
            rng.normal(scale=3.0, size=(h, h, c)).astype(np.float32)
        )
        f_x = jax.jit(peak_scores_reference)
        f_p = jax.jit(lambda x: peak_scores_pallas(x, interpret=False))
        report("peak_decode", f"{h}x{h}x{c}",
               _time(f_x, logits), _time(f_p, logits))


def bench_suppression():
    from detectax.ops.nms import _suppression_mask
    from detectax.ops.boxes import pairwise_iou_corners
    from detectax.ops.pallas.nms_kernel import suppression_mask_pallas

    rng = np.random.default_rng(2)
    for k in (1024, 2048):
        x = rng.uniform(0, 600, size=(k,)).astype(np.float32)
        y = rng.uniform(0, 600, size=(k,)).astype(np.float32)
        w = rng.uniform(8, 80, size=(k,)).astype(np.float32)
        h = rng.uniform(8, 80, size=(k,)).astype(np.float32)
        boxes = jnp.asarray(np.stack([y, x, y + h, x + w], axis=-1))

        def xla_version(b):
            iou = pairwise_iou_corners(b, b)
            return _suppression_mask(iou, 0.5)

        f_x = jax.jit(xla_version)
        f_p = jax.jit(
            lambda b: suppression_mask_pallas(b, 0.5, interpret=False)
        )
        mx = np.asarray(f_x(boxes))
        mp = np.asarray(f_p(boxes))
        assert (mx == mp).all(), "pallas/xla suppression disagree"
        report("nms_suppression", f"K={k}", _time(f_x, boxes), _time(f_p, boxes))


def main():
    print(f"device: {jax.devices()[0]}")
    bench_focal()
    bench_peak()
    bench_suppression()


if __name__ == "__main__":
    main()
