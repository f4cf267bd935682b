"""detectax benchmark — prints ONE JSON line for the driver.

Headline metric: training throughput (images/sec/chip) of the flagship
config — FCOS ResNet-50 @ 384px, batch 16, bf16 compute — the reference's
`FCOS/train_fcos.py` configuration. The full jitted step includes on-device
target assignment, forward, loss, backward, clip, and SGD update.

`vs_baseline` compares against the measured reference-semantics baseline:
the TF2/Keras eager per-image GradientTape loop (ResNet-50 FPN, 384px, CPU)
measured at 0.129 img/s on this machine (see BASELINE.md; the reference
publishes no numbers of its own).
"""
from __future__ import annotations

import json
import os
import time

# persistent compile cache (must be set before jax import): saves ~30s of
# remote TPU compile per driver round
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/detectax_tpu_cache"
)

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Measured reference-equivalent CPU throughput (BASELINE.md).
CPU_REFERENCE_IMG_PER_SEC = 0.129


def main():
    img = int(os.environ.get("BENCH_IMG", "384"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    backbone = os.environ.get("BENCH_BACKBONE", "resnet50")
    nc = 20

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

    step = make_train_step(
        model, assign_fn, det_losses.fcos_loss, opt, donate=True
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

    # warmup: compile + 3 steps, forcing full materialization each time
    for _ in range(3):
        state, metrics = step(state, batch_data)
        _ = float(metrics["total"])
        jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_data)
    # force completion of the full chain incl. the optimizer update
    jax.block_until_ready(state.params)
    total = float(metrics["total"])
    dt = time.perf_counter() - t0

    rate = steps * batch / dt
    result = {
        "metric": f"train_images_per_sec_fcos_{backbone}_{img}px_b{batch}_bf16",
        "value": round(rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / CPU_REFERENCE_IMG_PER_SEC, 1),
        "detail": {
            "steps": steps,
            "sec_per_step": round(dt / steps, 5),
            "final_loss": round(total, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
