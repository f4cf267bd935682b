"""Train FCOS-center v1 (YOLO-style centroid assignment, sigmoid reg) —
mirror of `FCOS/train_fcos_center_v1_voc.py`.

Reference config (lines 141-142, 315-331): box scales
``[32, 64, 128, 256, img_dims]``, SGD momentum 0.9 init_lr 0.01, 384px.
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from detectax.cli._common import add_train_args, config_from_args, dataset_from_args
from detectax.cli._eval_hooks import fcos_eval_hook
from detectax.models import FCOS
from detectax.ops import assign
from detectax.train import losses as det_losses
from detectax.train.driver import fit


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_args(p, canvas=384, batch_size=16, init_lr=0.01,
                   backbone="resnet50", max_steps=20000)
    args = p.parse_args(argv)

    dataset = dataset_from_args(args)
    nc = dataset.num_classes
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = FCOS(num_classes=nc, variant="center_v1",
                 backbone=args.backbone, dtype=dtype,
                 freeze_bn=args.freeze_bn)
    cfg = config_from_args(
        args,
        optimizer="sgd",
        schedule="exponential",
        schedule_kwargs={"init_lr": args.init_lr},
        resize_mode="stretch",
    )
    img = (cfg.canvas, cfg.canvas)

    def assign_fn(boxes, labels, valid):
        outs, _ = assign.fcos_center_v1_assign(
            boxes, labels, valid, img_dim=img, num_classes=nc
        )
        return outs

    def loss_fn(y_true, y_pred):
        # v1: focal on cen AND cls, masked smooth-L1 on reg
        # (fcos_center_v1.py:294-317)
        return det_losses.fcos_loss(
            y_true, y_pred, reg_type="l1", cen_type="focal"
        )

    hook = fcos_eval_hook(nc, dataset.id_to_label) if cfg.dump_visuals else None
    return fit(cfg, model, dataset, assign_fn, loss_fn, eval_hook=hook)


if __name__ == "__main__":
    main()
