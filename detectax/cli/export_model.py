"""Export a trained detector to a serving bundle (StableHLO + weights).

New entry point beyond the reference (whose deployment path was "run the
training script's Python again"): freezes the measured eval pipeline
(forward → decode → NMS, same graph as `cli.evaluate`) into
batch-bucketed `jax.export` artifacts that a serving host replays without
detectax model code. After exporting, the bundle is reloaded and verified
against the live model on a random batch (max |Δ| printed) so a bundle on
disk is a bundle that ran.

    python -m detectax.cli.export_model --family fcos --backbone resnet50 \
        --ckpt_dir ckpt --num_classes 20 --out_dir bundle --buckets 1 4 8
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from detectax.cli.evaluate import TRAIN_GEOMETRY, build_family
from detectax.infer.export import (
    compare_detections, load_bundle, make_serving_fn, save_bundle,
)
from detectax.train.driver import restore_for_inference


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="fcos")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--ckpt_dir", default="ckpt")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--canvas", type=int, default=None,
                   help="default: the family's training canvas")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 8])
    p.add_argument("--out_dir", required=True)
    p.add_argument("--top_k", type=int, default=1024)
    p.add_argument("--iou_thresh", type=float, default=0.5)
    p.add_argument("--cls_thresh", type=float, default=0.05)
    p.add_argument("--max_outputs", type=int, default=100)
    p.add_argument("--class_aware_candidates", action="store_true")
    p.add_argument("--center", action="store_true")
    p.add_argument("--box_scales", type=float, nargs="+",
                   default=[32.0, 64.0, 128.0, 256.0, 512.0])
    p.add_argument("--anchor_sizes", type=float, nargs="+",
                   default=[20.0, 40.0, 80.0, 160.0, 320.0])
    p.add_argument("--n_filters", type=int, default=12)
    p.add_argument("--n_stacks", type=int, default=1)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="e.g. 'tpu cpu' for a multi-platform artifact; "
                        "default: the current backend")
    p.add_argument("--fused", choices=("auto", "on", "off"), default="auto",
                   help="dense one-kernel NMS path: 'auto' picks per "
                        "platform at lowering (lax.platform_dependent — "
                        "safe for multi-platform artifacts), 'on'/'off' "
                        "force it")
    p.add_argument("--verify_tol", type=float, default=1e-4,
                   help="max |replayed - live| allowed by the post-export "
                        "self-verification; exceeded -> non-zero exit")
    args = p.parse_args(argv)

    multi_platform = args.platforms is not None and len(args.platforms) > 1
    if multi_platform and args.fused == "on":
        raise SystemExit(
            "--fused on is incompatible with a multi-platform artifact: "
            "the fused path's Pallas kernel cannot lower for CPU; use "
            "--fused off (or a single --platforms entry)"
        )
    if multi_platform:
        # multi-platform artifacts must be Pallas-free (infer.export
        # docstring); force the pure-XLA twins everywhere
        args.fused = "off"
        args.decode_pallas = False
    else:
        args.decode_pallas = None

    geo_mode, geo_pad, geo_norm, geo_canvas = TRAIN_GEOMETRY[args.family]
    if args.canvas is None:
        args.canvas = geo_canvas
    elif args.canvas != geo_canvas:
        print(
            f"WARNING: --canvas {args.canvas} != {args.family}'s training "
            f"canvas {geo_canvas}; the manifest records the family's "
            "default geometry — served accuracy degrades unless the "
            "checkpoint was actually trained at this canvas/geometry."
        )
    model, decode = build_family(
        args.family, args.num_classes, args.backbone, args.canvas, args
    )
    state = restore_for_inference(
        args.ckpt_dir, model, args.canvas, use_ema=args.ema
    )
    serving_fn = make_serving_fn(
        model, decode, top_k=args.top_k, iou_thresh=args.iou_thresh,
        score_thresh=args.cls_thresh, max_outputs=args.max_outputs,
        class_aware_candidates=args.class_aware_candidates,
        fused={"auto": None, "on": True, "off": False}[args.fused],
        pallas=False if multi_platform else None,
    )
    manifest = save_bundle(
        args.out_dir, serving_fn, state.params, state.batch_stats,
        canvas=args.canvas, buckets=args.buckets,
        platforms=args.platforms,
        manifest_extra={
            "family": args.family,
            "backbone": args.backbone,
            "num_classes": args.num_classes,
            "resize_mode": geo_mode,
            "pad_position": geo_pad,
            "normalize": geo_norm,
            "nms": {
                "top_k": args.top_k, "iou_thresh": args.iou_thresh,
                "score_thresh": args.cls_thresh,
                "max_outputs": args.max_outputs,
                "class_aware_candidates": args.class_aware_candidates,
            },
        },
    )

    # verify: replayed artifact == live model on a random batch.
    # The live reference is the JITTED serving graph — the same compiled
    # pipeline `cli.evaluate` measures mAP with. (The r4 gate compared
    # against an *eager* run: eager-vs-compiled float noise on a trained
    # score surface flips near-tied top-k/NMS selections, which an
    # elementwise box comparison then reports as O(canvas) diffs —
    # max|Δ|=352.1 on a healthy bundle.)
    import jax

    predictor = load_bundle(args.out_dir)
    b = manifest["buckets"][0]
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (b, args.canvas, args.canvas, 3))
    images = images.astype(np.float32)
    got = predictor.predict(images)
    want = jax.jit(serving_fn)(state.params, state.batch_stats, images)
    max_diff = max(
        float(np.max(np.abs(np.asarray(want[k]).astype(np.float32)
                            - got[k].astype(np.float32))))
        if np.asarray(want[k]).size else 0.0
        for k in got
    )
    exact_ok = max_diff <= args.verify_tol
    # Selections can legitimately differ at near-ties even between two
    # compiles of the same program; the semantic gate compares the
    # detection SETS (class + IoU match, score tolerance, boundary-tie
    # amnesty) — see infer.export.compare_detections.
    det_report = None
    if not exact_ok:
        det_report = compare_detections(
            want, got, score_tol=max(args.verify_tol, 1e-3),
            score_thresh=args.cls_thresh,
        )
    ok = exact_ok or det_report["ok"]
    print(json.dumps({
        "bundle": args.out_dir,
        "buckets": manifest["buckets"],
        "verify_max_abs_diff": max_diff,
        "verify_tol": args.verify_tol,
        "verify_exact_ok": exact_ok,
        "verify_detection_report": det_report,
        "verify_ok": ok,
    }))
    if not ok:
        raise SystemExit(
            f"export verification failed: max |replayed - live| = "
            f"{max_diff:g} > --verify_tol {args.verify_tol:g} AND the "
            f"detection-aware comparison found "
            f"{det_report['real_mismatches']} non-boundary mismatches"
        )
    return {
        "manifest": manifest,
        "verify_max_abs_diff": max_diff,
        "verify_detection_report": det_report,
    }


if __name__ == "__main__":
    main()
