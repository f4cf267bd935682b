"""Single-image FCOS inference — mirror of `FCOS/infer_fcos.py`.

Restores a checkpoint, runs the jitted forward + decode + class-aware NMS
(the reference's `image_detections` + `combined_non_max_suppression`,
`infer_fcos.py:27-62`), writes `heatmap.jpg` and `detection.jpg`, and
rescales boxes back to the original image size (`infer_fcos.py:167-170`).
"""
from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from detectax.data.pipeline import decode_image, normalize_pixels, _resize
from detectax.infer import predict as P
from detectax.infer.visualize import save_heatmap, visualize_detections
from detectax.models import FCOS
from detectax.train.driver import restore_for_inference


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_file", required=True)
    p.add_argument("--ckpt_dir", default="ckpt")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--labels_json", default=None,
                   help="optional json mapping id -> label name")
    p.add_argument("--img_dims", type=int, default=384)
    p.add_argument("--cls_thresh", type=float, default=0.3)
    p.add_argument("--iou_thresh", type=float, default=0.5)
    p.add_argument("--center", action="store_true",
                   help="multiply scores by the centerness branch")
    p.add_argument("--heatmap_out", default="heatmap.jpg")
    p.add_argument("--detect_out", default="detection.jpg")
    args = p.parse_args(argv)

    id_to_label = None
    if args.labels_json:
        with open(args.labels_json) as f:
            id_to_label = {int(k): v for k, v in json.load(f).items()}

    model = FCOS(num_classes=args.num_classes, backbone=args.backbone)
    state = restore_for_inference(args.ckpt_dir, model, args.img_dims)

    raw = decode_image({"image_path": args.img_file})
    oh, ow = raw.shape[:2]
    img = _resize(raw, (args.img_dims, args.img_dims))
    img = normalize_pixels(img, "tf")[None]

    outs = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(img), train=False,
    )
    boxes, probs = P.fcos_decode(outs, use_centerness=args.center)
    # class_aware_candidates: TF combined-NMS semantics (a box may surface
    # under several classes), matching reference `infer_fcos.py:58-61`.
    dets = P.detections_from_dense(
        boxes, probs, iou_thresh=args.iou_thresh,
        score_thresh=args.cls_thresh, max_outputs=100,
        class_aware_candidates=True,
    )
    n = int(dets["num_valid"][0])
    sel_boxes = np.asarray(dets["boxes"][0][:n])
    # back to original resolution (infer_fcos.py:167-170)
    scale = np.array(
        [oh / args.img_dims, ow / args.img_dims] * 2, dtype=np.float32
    )
    visualize_detections(
        raw, sel_boxes * scale,
        np.asarray(dets["classes"][0][:n]),
        np.asarray(dets["scores"][0][:n]),
        id_to_label, out_file=args.detect_out,
    )
    # multi-level max-prob heatmap at P3 resolution (infer_fcos.py:64-116)
    level_maps = []
    for lvl in outs:
        probs_lvl = np.asarray(
            jnp.max(1.0 / (1.0 + jnp.exp(-lvl[0][..., 5:])), axis=-1)
        )
        level_maps.append(_upsample_to(probs_lvl, outs[0].shape[1:3]))
    hm = np.stack(level_maps).max(0)
    save_heatmap(hm, out_file=args.heatmap_out, image=img[0],
                 title="max class prob (all levels)")
    print(f"{n} detections -> {args.detect_out}, heatmap -> {args.heatmap_out}")


def _upsample_to(hm: np.ndarray, hw):
    reps = (hw[0] // hm.shape[0], hw[1] // hm.shape[1])
    return np.repeat(np.repeat(hm, reps[0], 0), reps[1], 1)


if __name__ == "__main__":
    main()
