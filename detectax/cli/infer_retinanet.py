"""RetinaNet inference CLI — argparse-compatible mirror of
`RetinaNet/infer_retinanet_coco.py` (the reference's only CLI, flags at
lines 66-80: --cls_thresh --iou_thresh --center --show_text --high_res
--img_file).
"""
from __future__ import annotations

import argparse
import json
from collections import Counter

import jax.numpy as jnp
import numpy as np

from detectax.data.pipeline import _resize, decode_image, normalize_pixels
from detectax.infer import predict as P
from detectax.infer.visualize import save_heatmap, visualize_detections
from detectax.models import RetinaNet
from detectax.ops import anchors as anchor_lib
from detectax.train.driver import restore_for_inference


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_file", required=True)
    p.add_argument("--cls_thresh", type=float, default=0.30)
    p.add_argument("--iou_thresh", type=float, default=0.50)
    p.add_argument("--center", action="store_true")
    p.add_argument("--show_text", action="store_true", default=True)
    p.add_argument("--high_res", action="store_true",
                   help="infer at 2x resolution")
    p.add_argument("--ckpt_dir", default="ckpt")
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--num_classes", type=int, default=81)
    p.add_argument("--labels_json", default=None)
    p.add_argument("--img_dims", type=int, default=512)
    p.add_argument("--anchor_sizes", type=float, nargs="+",
                   default=[20.0, 40.0, 80.0, 160.0, 320.0])
    p.add_argument("--detect_out", default="detection.jpg")
    p.add_argument("--heatmap_out", default="heatmap.jpg")
    args = p.parse_args(argv)

    dims = args.img_dims * (2 if args.high_res else 1)
    id_to_label = None
    if args.labels_json:
        with open(args.labels_json) as f:
            id_to_label = {int(k): v for k, v in json.load(f).items()}

    anchors = anchor_lib.anchor_shapes_per_level(
        anchor_sizes=args.anchor_sizes
    )
    model = RetinaNet(
        num_classes=args.num_classes, n_anchors=anchors[0].shape[0],
        backbone=args.backbone,
    )
    state = restore_for_inference(args.ckpt_dir, model, dims)

    raw = decode_image({"image_path": args.img_file})
    oh, ow = raw.shape[:2]
    img = normalize_pixels(_resize(raw, (dims, dims)), "tf")[None]

    outs = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(img), train=False,
    )
    boxes, probs = P.retinanet_decode(outs, anchors_per_level=anchors)
    dets = P.detections_from_dense(
        boxes, probs, iou_thresh=args.iou_thresh,
        score_thresh=args.cls_thresh, max_outputs=200,
        class_aware=False,  # reference cpu_nms is class-agnostic
    )
    n = int(dets["num_valid"][0])
    scale = np.array([oh / dims, ow / dims] * 2, dtype=np.float32)
    classes = np.asarray(dets["classes"][0][:n])
    visualize_detections(
        raw, np.asarray(dets["boxes"][0][:n]) * scale, classes,
        np.asarray(dets["scores"][0][:n]), id_to_label,
        out_file=args.detect_out, show_text=args.show_text,
    )
    level_maps = []
    for lvl in outs:
        m = np.asarray(
            jnp.max(1.0 / (1.0 + jnp.exp(-lvl[0][..., 4:])), axis=(-1, -2))
        )
        reps = (outs[0].shape[1] // m.shape[0], outs[0].shape[2] // m.shape[1])
        level_maps.append(np.repeat(np.repeat(m, reps[0], 0), reps[1], 1))
    save_heatmap(np.stack(level_maps).max(0), out_file=args.heatmap_out,
                 image=img[0])

    # per-class count report (infer_retinanet_coco.py:142-155)
    counts = Counter(int(c) for c in classes)
    for cls_id, cnt in sorted(counts.items()):
        name = id_to_label.get(cls_id, str(cls_id)) if id_to_label else cls_id
        print(f"{cnt} {name} detected")
    print(f"{n} detections -> {args.detect_out}")


if __name__ == "__main__":
    main()
