"""In-environment backbone pretraining for the transfer-learning story.

The reference always fine-tunes ImageNet-pretrained Keras backbones
(`/root/reference/FCOS/fcos.py:30-41`); this zero-egress image has no
ImageNet weights, so the pretrained-init story is quantified with an
in-environment substitute: pretrain the backbone as a *classifier* on
single-object crops drawn from the DetBench train split, save it in the
`tools/port_tf_weights.save_ported` msgpack format, and hand it to any
trainer via ``--init_backbone`` (optionally with ``--freeze_bn``) — the
exact code path an ImageNet port would use.

Usage:
    python benchmarks/pretrain_backbone.py --backbone mobilenetv2 \
        --steps 3000 --out benchmarks/runs/pretrain_mbv2/backbone.msgpack
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/detectax_tpu_cache"
)

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
import optax


class CropClassifier(nn.Module):
    """Backbone trunk -> global average pool of the c5 tap -> logits."""

    backbone_name: str = "mobilenetv2"
    num_classes: int = 8
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from detectax.models.backbones import BACKBONES

        taps = BACKBONES[self.backbone_name](self.dtype)(x, train)
        h = jnp.mean(taps["c5"].astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, name="cls_head")(h)


def crop_batch(ds, rng, batch, crop_px):
    """Random (image, GT-box) crops with 10-35% context margin, resized to
    ``crop_px`` with PIL bilinear. Returns (uint8 [B,S,S,3], int32 [B])."""
    from PIL import Image

    imgs = np.empty((batch, crop_px, crop_px, 3), np.uint8)
    labels = np.empty((batch,), np.int32)
    n = len(ds)
    size = ds.img_size
    filled = 0
    while filled < batch:
        s = ds[int(rng.integers(0, n))]
        if len(s["labels"]) == 0:
            continue
        j = int(rng.integers(0, len(s["labels"])))
        # DetBench boxes are canvas-normalized xyxy — scale to pixels
        x1, y1, x2, y2 = s["boxes_xyxy"][j] * size
        mw = (x2 - x1) * rng.uniform(0.10, 0.35)
        mh = (y2 - y1) * rng.uniform(0.10, 0.35)
        xa = int(max(0, x1 - mw)); ya = int(max(0, y1 - mh))
        xb = int(min(size, x2 + mw)); yb = int(min(size, y2 + mh))
        if xb - xa < 8 or yb - ya < 8:
            continue
        patch = Image.fromarray(s["image"][ya:yb, xa:xb])
        imgs[filled] = np.asarray(
            patch.resize((crop_px, crop_px), Image.BILINEAR)
        )
        labels[filled] = s["labels"][j]
        filled += 1
    return imgs, labels


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backbone", default="mobilenetv2")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--init_lr", type=float, default=0.05)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--out", required=True)
    p.add_argument("--display_step", type=int, default=100)
    p.add_argument("--eval_batches", type=int, default=8)
    args = p.parse_args(argv)

    from detectax.data.detbench import DetBenchDataset
    from detectax.tools.port_tf_weights import save_ported

    train_ds = DetBenchDataset("train")
    eval_ds = DetBenchDataset("eval")
    nc = train_ds.num_classes

    model = CropClassifier(backbone_name=args.backbone, num_classes=nc)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    print("init...", flush=True)
    variables = model.init(
        key, jnp.zeros((1, args.crop, args.crop, 3)), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    print("init done", flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.init_lr, args.warmup_steps, args.steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(8.0), optax.sgd(sched, momentum=0.9)
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, labels):
        x = images.astype(jnp.float32) / 127.5 - 1.0

        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (mut["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, acc

    @jax.jit
    def eval_step(params, batch_stats, images, labels):
        x = images.astype(jnp.float32) / 127.5 - 1.0
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return (jnp.argmax(logits, -1) == labels).mean()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        if step == 1:
            print("generating first batch...", flush=True)
        images, labels = crop_batch(train_ds, rng, args.batch_size, args.crop)
        if step == 1:
            print("first batch done; compiling step...", flush=True)
        params, batch_stats, opt_state, loss, acc = train_step(
            params, batch_stats, opt_state,
            jnp.asarray(images), jnp.asarray(labels),
        )
        if step % args.display_step == 0 or step == 1:
            print(
                f"step {step} loss {float(loss):.4f} acc {float(acc):.3f} "
                f"({(time.time() - t0) / 60:.1f} min)",
                flush=True,
            )

    accs = []
    erng = np.random.default_rng(1)
    for _ in range(args.eval_batches):
        images, labels = crop_batch(eval_ds, erng, args.batch_size, args.crop)
        accs.append(float(eval_step(
            params, batch_stats, jnp.asarray(images), jnp.asarray(labels)
        )))
    eval_acc = float(np.mean(accs))
    print(f"eval crop accuracy: {eval_acc:.3f}")

    # extract the backbone submodule subtree (the --init_backbone contract:
    # {"params": <backbone>, "batch_stats": <backbone>})
    bk = [k for k in params if k != "cls_head"]
    assert len(bk) == 1, f"expected one backbone submodule, got {bk}"
    save_ported(
        {"params": params[bk[0]],
         "batch_stats": batch_stats.get(bk[0], {})},
        args.out,
    )
    meta = {
        "backbone": args.backbone, "steps": args.steps,
        "crop": args.crop, "eval_crop_acc": round(eval_acc, 4),
        "train_min": round((time.time() - t0) / 60, 1),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
