"""Train RetinaNet on COCO — mirror of `RetinaNet/train_retinanet_coco.py`.

Reference config (lines 311-347): anchor_sizes [20,40,80,160,320], 512px
(pad_flag=False fixed resize), ResNet-101, batch 16, piecewise LR
0.01 -> /10 @60k, SGD momentum, 90000 steps, COCO labels with the
"objectness" class prepended at index 0.
"""
from __future__ import annotations

import argparse
import functools

import jax.numpy as jnp

from detectax.cli._common import add_train_args, config_from_args, dataset_from_args
from detectax.cli._eval_hooks import retinanet_eval_hook
from detectax.models import RetinaNet
from detectax.ops import anchors as anchor_lib
from detectax.ops import assign
from detectax.train import losses as det_losses
from detectax.train.driver import fit


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_args(p, canvas=512, batch_size=16, init_lr=0.01,
                   backbone="resnet101", max_steps=90000)
    p.add_argument("--anchor_sizes", type=float, nargs="+",
                   default=[20.0, 40.0, 80.0, 160.0, 320.0])
    p.add_argument("--iou_thresh", type=float, default=0.5)
    p.add_argument("--lr_boundaries", type=int, nargs="+", default=[60000])
    p.add_argument("--per_anchor_heads", action="store_true",
                   help="reference's 90 separate head convs (slower)")
    p.add_argument("--skip_zero_target",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="exclude images whose anchor assignment yields no "
                        "positives (reference train_retinanet_coco.py:"
                        "198-205 batch composition); filtered once up "
                        "front since stretch-geometry assignment is "
                        "deterministic")
    args = p.parse_args(argv)

    dataset = dataset_from_args(args)
    if args.skip_zero_target:
        from detectax.data.index import SubsetDataset

        keep = [
            i for i in range(len(dataset))
            if anchor_lib.has_anchor_targets_np(
                dataset[i]["boxes_xyxy"], (args.canvas, args.canvas),
                anchor_sizes=args.anchor_sizes,
                iou_thresh=args.iou_thresh,
            )
        ]
        dropped = len(dataset) - len(keep)
        if dropped:
            print(f"skip_zero_target: excluded {dropped}/{len(dataset)} "
                  "images with no anchor matches")
        if not keep:
            raise SystemExit("skip_zero_target removed every image — "
                             "check anchor_sizes vs object scales")
        dataset = SubsetDataset(dataset, keep)
    nc = dataset.num_classes
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    anchors = anchor_lib.anchor_shapes_per_level(
        anchor_sizes=args.anchor_sizes
    )
    model = RetinaNet(
        num_classes=nc, n_anchors=anchors[0].shape[0],
        backbone=args.backbone, per_anchor_heads=args.per_anchor_heads,
        dtype=dtype, freeze_bn=args.freeze_bn,
    )
    cfg = config_from_args(
        args,
        optimizer="sgd",
        schedule="piecewise",
        schedule_kwargs={
            "init_lr": args.init_lr,
            "boundaries": args.lr_boundaries,
            "scales": [0.1] * len(args.lr_boundaries),
        },
        resize_mode="stretch",
    )
    img = (cfg.canvas, cfg.canvas)

    def assign_fn(boxes, labels, valid):
        outs, _ = assign.retinanet_assign(
            boxes, labels, valid, img_dim=img, num_classes=nc,
            anchors_per_level=anchors, iou_thresh=args.iou_thresh,
        )
        return outs

    loss_fn = functools.partial(det_losses.retinanet_loss)
    hook = (
        retinanet_eval_hook(anchors, dataset.id_to_label)
        if cfg.dump_visuals else None
    )
    return fit(cfg, model, dataset, assign_fn, loss_fn, eval_hook=hook)


if __name__ == "__main__":
    main()
