"""Diagnose the r4 export round-trip failure (VERDICT r4 next #1).

Splits protocol vs product for the export self-verification: from a
trained checkpoint, compares

  A. dense pre-NMS outputs (boxes, probs — before top-k/NMS):
       live-eager  vs  live-jit  vs  exported-replay
  B. the full serving graph (forward -> decode -> NMS):
       live-eager  vs  live-jit  vs  exported-replay
  C. a detection-aware view of any serving mismatch: per-rank score
     deltas and the score gap around the selection boundary.

If A(replay vs jit) is ~0 but B(replay vs eager) is large, the bundle is
fine and the gate's comparison protocol is the bug (eager-vs-jit float
noise flipping discrete top-k/NMS selections on a trained score surface).

Usage: python benchmarks/diag_export.py --ckpt_dir /tmp/diag_fcos/ckpt
"""
from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from detectax.cli.evaluate import TRAIN_GEOMETRY, build_family
from detectax.infer.export import make_serving_fn
from detectax.train.driver import restore_for_inference


def _maxdiff(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b))) if a.size else 0.0


def _tree_maxdiff(x, y):
    if isinstance(x, dict):
        return {k: _maxdiff(x[k], y[k]) for k in x}
    return [_maxdiff(a, b) for a, b in zip(jax.tree.leaves(x),
                                           jax.tree.leaves(y))]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="fcos")
    p.add_argument("--backbone", default="mobilenetv2")
    p.add_argument("--ckpt_dir", default="/tmp/diag_fcos/ckpt")
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--canvas", type=int, default=384)
    args = p.parse_args(argv)
    # build_family option surface (export_model defaults)
    args.center = False
    args.box_scales = [32.0, 64.0, 128.0, 256.0, 512.0]
    args.anchor_sizes = [20.0, 40.0, 80.0, 160.0, 320.0]
    args.n_filters = 12
    args.n_stacks = 1
    args.decode_pallas = None

    model, decode = build_family(
        args.family, args.num_classes, args.backbone, args.canvas, args
    )
    state = restore_for_inference(args.ckpt_dir, model, args.canvas)
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (1, args.canvas, args.canvas, 3))
    images = images.astype(np.float32)

    def dense_fn(params, batch_stats, images):
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False,
        )
        boxes, probs = decode(outs)
        return {"boxes": boxes, "probs": probs}

    serving_fn = make_serving_fn(model, decode, top_k=1024, iou_thresh=0.5,
                                 score_thresh=0.05, max_outputs=100)

    spec = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), t
    )

    report = {}
    for name, fn in (("dense", dense_fn), ("serving", serving_fn)):
        eager = fn(state.params, state.batch_stats, images)
        jitted = jax.jit(fn)(state.params, state.batch_stats, images)
        exported = jax.export.export(jax.jit(fn))(
            spec(state.params), spec(state.batch_stats),
            jax.ShapeDtypeStruct(images.shape, images.dtype),
        )
        replay = jax.jit(jax.export.deserialize(exported.serialize()).call)(
            state.params, state.batch_stats, images
        )
        report[f"{name}: eager_vs_jit"] = _tree_maxdiff(eager, jitted)
        report[f"{name}: replay_vs_jit"] = _tree_maxdiff(replay, jitted)
        report[f"{name}: replay_vs_eager"] = _tree_maxdiff(replay, eager)
        if name == "serving":
            se, sj, sr = (np.asarray(x["scores"])[0]
                          for x in (eager, jitted, replay))
            nv = int(np.asarray(jitted["num_valid"])[0])
            report["serving: num_valid (eager/jit/replay)"] = [
                int(np.asarray(x["num_valid"])[0])
                for x in (eager, jitted, replay)
            ]
            report["serving: top10 scores jit"] = sj[:10].tolist()
            report["serving: score deltas jit-eager (first nv)"] = float(
                np.max(np.abs(sj[:nv] - se[:nv]))) if nv else 0.0
            report["serving: score deltas jit-replay (first nv)"] = float(
                np.max(np.abs(sj[:nv] - sr[:nv]))) if nv else 0.0
    print(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
