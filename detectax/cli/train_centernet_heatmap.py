"""Train the single-map heatmap CenterNet (FPN-collapse variant).

Completes trainer coverage for the reference's `CenterNet/tf_centernet.py`
model, which ships a full model + assignment + loss set but is imported by
no trainer (orphaned, SURVEY.md §2.3). Config follows that module's
semantics: stride-8 single map, pseudo-Gaussian (or true Gaussian) center
prior with sigma-shrunken ltrb fills, `num_classes+1` class channels with
an objectness slot at index 0 (the reference's COCO ETL convention),
focal + centerness + masked reg loss.
"""
from __future__ import annotations

import argparse
import functools

import jax.numpy as jnp

from detectax.cli._common import add_train_args, config_from_args, dataset_from_args
from detectax.models import CenterNetFPNSingle
from detectax.ops import assign
from detectax.train import losses as det_losses
from detectax.train.driver import fit


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_args(p, canvas=384, batch_size=16, init_lr=1e-3,
                   backbone="resnet50", max_steps=20000)
    p.add_argument("--sigma", type=float, default=0.25,
                   help="box-shrink factor for the ltrb fill region")
    p.add_argument("--heatmap_kind", choices=("pseudo", "gaussian"),
                   default="pseudo")
    p.add_argument("--reg_type", choices=("l1", "iou"), default="l1")
    args = p.parse_args(argv)

    dataset = dataset_from_args(args)
    nc = dataset.num_classes
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = CenterNetFPNSingle(num_classes=nc, backbone=args.backbone,
                               dtype=dtype, freeze_bn=args.freeze_bn)
    cfg = config_from_args(
        args,
        optimizer="adam",
        schedule="exponential",
        schedule_kwargs={"init_lr": args.init_lr},
    )
    img = (cfg.canvas, cfg.canvas)

    def assign_fn(boxes, labels, valid):
        # objectness slot at class index 0; real labels shift by +1
        out, _ = assign.centernet_heatmap_assign(
            boxes, labels + 1, valid, img_dim=img, num_classes=nc + 1,
            sigma=args.sigma, heatmap_kind=args.heatmap_kind,
        )
        return [out]  # single level; reuse the multi-level fcos loss

    def loss_fn(y_true, y_pred):
        return det_losses.fcos_loss(
            y_true, [y_pred], reg_type=args.reg_type, cen_type="l1"
        )

    return fit(cfg, model, dataset, assign_fn, loss_fn)


if __name__ == "__main__":
    main()
