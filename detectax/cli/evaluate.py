"""Evaluate a trained detector: mAP@0.5 (+ COCO-style) over a dataset.

New capability beyond the reference (whose only eval was visual overlays):
restores a checkpoint, runs the jitted forward + decode + NMS over the
eval set, and reports VOC/COCO mAP via `detectax.eval`.

Preprocessing geometry (resize mode / pad position / pixel normalization)
defaults to each family's *training* configuration so mAP is measured on
the distribution the model saw; every knob is overridable.
"""
from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from detectax.cli._common import dataset_from_args
from detectax.eval.detection_metrics import MeanAPEvaluator, coco_evaluator
from detectax.infer import predict as P
from detectax.models import (
    FCOS,
    CenterNetFPNSingle,
    CenterNetS8,
    HourglassNet,
    RetinaNet,
    StackedHourglass,
)
from detectax.ops import anchors as anchor_lib
from detectax.train.driver import restore_for_inference

FAMILIES = (
    "fcos", "fcos_center", "fcos_center_v1", "centernet_s8",
    "centernet_heatmap", "hourglass", "stacked_hourglass", "retinanet",
)

# Training-time preprocessing per family (mirrors the trainer CLIs; see
# ADVICE.md r1: eval must match training geometry or mAP is misreported).
#   family: (resize_mode, pad_position, normalize, default_canvas)
TRAIN_GEOMETRY = {
    "fcos": ("resize_pad", "topleft", "tf", 384),
    "fcos_center": ("stretch", "topleft", "tf", 384),
    "fcos_center_v1": ("stretch", "topleft", "tf", 384),
    "centernet_s8": ("stretch", "center", "unit", 512),
    "centernet_heatmap": ("resize_pad", "topleft", "tf", 384),
    "hourglass": ("resize_pad", "center", "tf", 320),
    "stacked_hourglass": ("resize_pad", "center", "tf", 320),
    "retinanet": ("stretch", "topleft", "tf", 512),
}


def build_family(family, nc, backbone, canvas, args):
    if family in ("fcos", "fcos_center", "fcos_center_v1"):
        variant = {"fcos": "fcos", "fcos_center": "center",
                   "fcos_center_v1": "center_v1"}[family]
        model = FCOS(num_classes=nc, variant=variant, backbone=backbone)
        if family == "fcos_center_v1":
            scales = [32.0, 64.0, 128.0, 256.0, float(canvas)]
            decode = lambda outs: P.fcos_center_v1_decode(
                outs, box_scales=scales
            )
        else:
            decode = lambda outs: P.fcos_decode(
                outs, use_centerness=(family != "fcos") or args.center
            )
        return model, decode
    if family == "centernet_s8":
        scales = tuple(args.box_scales)
        model = CenterNetS8(num_classes=nc, n_scales=len(scales),
                            backbone=backbone)
        return model, lambda out: P.centernet_s8_decode(out, box_scales=scales)
    if family == "centernet_heatmap":
        model = CenterNetFPNSingle(num_classes=nc, backbone=backbone)
        # decode_pallas False -> Pallas-free peak mask (multi-platform export)
        dp = getattr(args, "decode_pallas", None)
        return model, lambda out: P.centernet_heatmap_decode(
            out, use_pallas=dp
        )
    if family == "hourglass":
        model = HourglassNet(num_classes=nc, n_filters=args.n_filters)
        scales = tuple(canvas / (2.0 ** x) for x in reversed(range(4)))
        return model, lambda out: P.hourglass_decode(out, box_scales=scales)
    if family == "stacked_hourglass":
        model = StackedHourglass(
            num_classes=nc, n_filters=args.n_filters,
            n_stacks=args.n_stacks,
        )
        return model, lambda out: P.stacked_hourglass_decode(
            out, stride=model.output_stride
        )
    if family == "retinanet":
        anchors = anchor_lib.anchor_shapes_per_level(
            anchor_sizes=args.anchor_sizes
        )
        model = RetinaNet(
            num_classes=nc, n_anchors=anchors[0].shape[0],
            backbone=backbone,
            per_anchor_heads=getattr(args, "per_anchor_heads", False),
        )
        return model, lambda outs: P.retinanet_decode(
            outs, anchors_per_level=anchors
        )
    raise ValueError(f"unknown family {family}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", choices=FAMILIES, default="fcos")
    p.add_argument("--index", default=None)
    p.add_argument("--dataset",
                   choices=("synthetic", "detbench", "detbench_v2",
                            "detbench_v2_crowd"),
                   default="synthetic",
                   help="'detbench*' evaluates on the committed eval split "
                        "(benchmarks/detbench_v1/v2/v2_crowd .json)")
    p.add_argument("--synthetic_n", type=int, default=64)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--ckpt_dir", default="ckpt")
    p.add_argument("--canvas", type=int, default=None,
                   help="eval canvas (default: the family's training canvas)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_boxes", type=int, default=64)
    p.add_argument("--cls_thresh", type=float, default=0.05)
    p.add_argument("--iou_thresh", type=float, default=0.5)
    p.add_argument("--center", action="store_true")
    p.add_argument("--coco_metrics", action="store_true",
                   help="also report AP@[.5:.95]")
    p.add_argument("--box_scales", type=float, nargs="+",
                   default=[32.0, 64.0, 128.0, 256.0, 512.0])
    p.add_argument("--anchor_sizes", type=float, nargs="+",
                   default=[20.0, 40.0, 80.0, 160.0, 320.0],
                   help="must match training (train_retinanet_coco "
                        "reference default)")
    p.add_argument("--per_anchor_heads", action="store_true",
                   help="retinanet: separate 3x3 head conv per (level, "
                        "anchor) pair — must match training")
    p.add_argument("--n_filters", type=int, default=12,
                   help="hourglass width (must match training)")
    p.add_argument("--n_stacks", type=int, default=1,
                   help="stacked_hourglass stack count (must match training)")
    p.add_argument("--max_outputs", type=int, default=100)
    p.add_argument("--top_k", type=int, default=1024,
                   help="NMS candidate pool for the two-stage path; the "
                        "fused dense-NMS path (auto on TPU) is equivalent "
                        "to top_k=M and ignores this")
    p.add_argument("--resize_mode", choices=("resize_pad", "stretch"),
                   default=None,
                   help="default: the family's training resize mode")
    p.add_argument("--pad_position", choices=("topleft", "center"),
                   default=None)
    p.add_argument("--normalize", choices=("tf", "unit", "none"),
                   default=None)
    p.add_argument("--class_aware_candidates", action="store_true",
                   help="rank all (box, class) pairs before NMS (TF "
                        "combined-NMS semantics, reference FCOS infer path)")
    p.add_argument("--ema", action="store_true",
                   help="evaluate the EMA-averaged weights (requires "
                        "training with --ema_decay)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the eval batch over all devices "
                        "(parallel.mesh.make_sharded_eval_fn); batch_size "
                        "must divide by the device count")
    p.add_argument("--out_json", default=None)
    args = p.parse_args(argv)

    geo_mode, geo_pad, geo_norm, geo_canvas = TRAIN_GEOMETRY[args.family]
    resize_mode = args.resize_mode or geo_mode
    pad_position = args.pad_position or geo_pad
    normalize = args.normalize or geo_norm
    if args.canvas is None:
        args.canvas = geo_canvas

    dataset = dataset_from_args(args, split="eval")
    nc = dataset.num_classes
    model, decode = build_family(args.family, nc, args.backbone,
                                 args.canvas, args)
    state = restore_for_inference(
        args.ckpt_dir, model, args.canvas, use_ema=args.ema
    )

    from detectax.data.pipeline import Loader

    loader = Loader(
        dataset, batch_size=args.batch_size, canvas=args.canvas,
        max_boxes=args.max_boxes, flip=False, shuffle=False,
        mode=resize_mode, pad_position=pad_position, normalize=normalize,
        prefetch=1, drop_remainder=False,
    )
    evaluator = (
        coco_evaluator(nc) if args.coco_metrics
        else MeanAPEvaluator(nc)
    )
    canvas = args.canvas

    import jax

    def _raw_forward(params, batch_stats, images):
        # one compiled graph: forward + decode + top-k + NMS (op-by-op
        # eager dispatch is pathological through a remote TPU backend)
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False,
        )
        boxes, probs = decode(outs)
        return P.detections_from_dense(
            boxes, probs, top_k=args.top_k, iou_thresh=args.iou_thresh,
            score_thresh=args.cls_thresh, max_outputs=args.max_outputs,
            class_aware_candidates=args.class_aware_candidates,
        )

    if args.data_parallel:
        from detectax.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh()
        n_dev = mesh.devices.size
        if args.batch_size % n_dev:
            raise SystemExit(
                f"--data_parallel: batch_size {args.batch_size} must "
                f"divide by the {n_dev}-device mesh"
            )
        forward_decode_nms = mesh_lib.make_sharded_eval_fn(_raw_forward,
                                                           mesh)
        repl = mesh_lib.replicated_sharding(mesh)
        state = state.replace(
            params=jax.device_put(state.params, repl),
            batch_stats=jax.device_put(state.batch_stats, repl),
        )
    else:
        forward_decode_nms = jax.jit(_raw_forward)

    for batch in loader:
        dets = forward_decode_nms(
            state.params, state.batch_stats, jnp.asarray(batch["images"])
        )
        det_boxes = np.asarray(dets["boxes"])
        det_scores = np.asarray(dets["scores"])
        det_classes = np.asarray(dets["classes"])
        n_valid = np.asarray(dets["num_valid"])
        ex_valid = batch.get(
            "example_valid", np.ones(len(batch["images"]), bool)
        )
        for i in range(len(batch["images"])):
            if not ex_valid[i]:
                continue  # padding of the final partial batch
            n = int(n_valid[i])
            gt_v = batch["valid"][i]
            gt_yxhw = batch["boxes"][i][gt_v] * canvas
            gt_corners = np.stack(
                [
                    gt_yxhw[:, 0] - gt_yxhw[:, 2] / 2,
                    gt_yxhw[:, 1] - gt_yxhw[:, 3] / 2,
                    gt_yxhw[:, 0] + gt_yxhw[:, 2] / 2,
                    gt_yxhw[:, 1] + gt_yxhw[:, 3] / 2,
                ],
                axis=-1,
            ) if gt_v.any() else np.zeros((0, 4), np.float32)
            evaluator.add_image(
                det_boxes[i][:n], det_scores[i][:n], det_classes[i][:n],
                gt_corners, batch["labels"][i][gt_v],
            )

    summary = evaluator.summarize()
    print(json.dumps(summary, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(summary, f)
    return summary


if __name__ == "__main__":
    main()
