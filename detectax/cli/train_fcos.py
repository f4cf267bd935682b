"""Train FCOS (all-in-box assignment) — mirror of `FCOS/train_fcos.py`.

Reference config (`train_fcos.py:269-285`): ResNet-50, VOC, batch 16,
init_lr 5e-4 exponential decay (rate 0.75 / 1000 steps, floor 1e-5),
SGD momentum 0.9, global-norm clip 1.0, 20000 steps, 384px.
"""
from __future__ import annotations

import argparse
import functools

import jax.numpy as jnp

from detectax.cli._common import add_train_args, config_from_args, dataset_from_args
from detectax.models import FCOS
from detectax.ops import assign
from detectax.train import losses as det_losses
from detectax.train.driver import fit
from detectax.cli._eval_hooks import fcos_eval_hook


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_args(p, canvas=384, batch_size=16, init_lr=5e-4,
                   backbone="resnet50", max_steps=20000)
    p.add_argument("--reg_type", choices=("l1", "iou"), default="l1")
    p.add_argument("--decay_rate", type=float, default=0.75)
    p.add_argument("--decay_steps", type=int, default=1000)
    p.add_argument("--min_lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    args = p.parse_args(argv)

    dataset = dataset_from_args(args)
    nc = dataset.num_classes
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = FCOS(num_classes=nc, variant="fcos", backbone=args.backbone,
                 dtype=dtype, freeze_bn=args.freeze_bn)
    cfg = config_from_args(
        args,
        optimizer="sgd",
        schedule="exponential",
        schedule_kwargs={
            "init_lr": args.init_lr,
            "decay_rate": args.decay_rate,
            "decay_steps": args.decay_steps,
            "min_lr": args.min_lr,
        },
        weight_decay=args.weight_decay,
    )
    img = (cfg.canvas, cfg.canvas)

    def assign_fn(boxes, labels, valid):
        outs, _ = assign.fcos_assign(
            boxes, labels, valid, img_dim=img, num_classes=nc
        )
        return outs

    loss_fn = functools.partial(det_losses.fcos_loss, reg_type=args.reg_type)
    hook = fcos_eval_hook(nc, dataset.id_to_label) if cfg.dump_visuals else None
    return fit(cfg, model, dataset, assign_fn, loss_fn, eval_hook=hook)


if __name__ == "__main__":
    main()
