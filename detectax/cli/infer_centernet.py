"""Single-image CenterNet-s8 inference.

Standalone CLI for the capability the reference only exposes as in-module
drawing during training (`CenterNet/tf_centernet_resnet_s8.py:446-599`
obj_detect_results): restore a checkpoint, decode the scale-slot map,
run class-wise (soft-)NMS, write overlay + heatmap jpgs.
"""
from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from detectax.data.pipeline import _resize, decode_image, normalize_pixels
from detectax.infer import predict as P
from detectax.infer.visualize import save_heatmap, visualize_detections
from detectax.models import CenterNetS8
from detectax.train.driver import restore_for_inference


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_file", required=True)
    p.add_argument("--ckpt_dir", default="ckpt")
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--num_classes", type=int, default=1)
    p.add_argument("--variant", choices=("s8", "heatmap"), default="s8",
                   help="'s8' = scale-slot CenterNetS8; 'heatmap' = "
                        "single-map CenterNetFPNSingle (peak decode, "
                        "reference tf_centernet.py semantics)")
    p.add_argument("--labels_json", default=None)
    p.add_argument("--img_dims", type=int, default=512)
    p.add_argument("--box_scales", type=float, nargs="+",
                   default=[32.0, 64.0, 128.0, 256.0, 512.0])
    p.add_argument("--cls_thresh", type=float, default=0.5)
    p.add_argument("--iou_thresh", type=float, default=0.213)
    p.add_argument("--soft_nms", action="store_true",
                   help="Gaussian soft-NMS rescoring (reference nms 'soft-nms')")
    p.add_argument("--detect_out", default="detection.jpg")
    p.add_argument("--heatmap_out", default="heatmap.jpg")
    args = p.parse_args(argv)

    id_to_label = None
    if args.labels_json:
        with open(args.labels_json) as f:
            id_to_label = {int(k): v for k, v in json.load(f).items()}

    if args.variant == "heatmap":
        from detectax.models import CenterNetFPNSingle

        model = CenterNetFPNSingle(
            num_classes=args.num_classes, backbone=args.backbone
        )
        pixel_norm = "tf"  # this family trains with /127.5-1
    else:
        model = CenterNetS8(
            num_classes=args.num_classes, n_scales=len(args.box_scales),
            backbone=args.backbone,
        )
        pixel_norm = "unit"
    state = restore_for_inference(args.ckpt_dir, model, args.img_dims)

    raw = decode_image({"image_path": args.img_file})
    oh, ow = raw.shape[:2]
    img = normalize_pixels(
        _resize(raw, (args.img_dims, args.img_dims)), pixel_norm
    )[None]

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(img), train=False,
    )
    if args.variant == "heatmap":
        boxes, probs = P.centernet_heatmap_decode(out)
    else:
        boxes, probs = P.centernet_s8_decode(out, box_scales=args.box_scales)
    dets = P.detections_from_dense(
        boxes, probs, iou_thresh=args.iou_thresh,
        score_thresh=args.cls_thresh, max_outputs=200,
        class_aware=True, mode="soft" if args.soft_nms else "hard",
    )
    n = int(dets["num_valid"][0])
    scale = np.array(
        [oh / args.img_dims, ow / args.img_dims] * 2, dtype=np.float32
    )
    visualize_detections(
        raw, np.asarray(dets["boxes"][0][:n]) * scale,
        np.asarray(dets["classes"][0][:n]),
        np.asarray(dets["scores"][0][:n]),
        id_to_label, out_file=args.detect_out,
    )
    if args.variant == "heatmap":
        # [h,w,4+1+C]: max class prob (objectness slot 0 skipped)
        hm = np.asarray(
            jnp.max(1.0 / (1.0 + jnp.exp(-out[0][..., 6:])), axis=-1)
        )
    else:
        hm = np.asarray(
            jnp.max(1.0 / (1.0 + jnp.exp(-out[0][..., 4:])), axis=(-1, -2))
        )
    save_heatmap(hm, out_file=args.heatmap_out, image=img[0])
    print(f"{n} detections -> {args.detect_out}")


if __name__ == "__main__":
    main()
