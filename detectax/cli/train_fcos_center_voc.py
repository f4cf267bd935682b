"""Train FCOS-center (3x3 center sampling) — mirror of
`FCOS/train_fcos_center_voc.py`.

Reference config: 384px VOC, fixed-resize path (pad_flag=False), Adam,
piecewise LR init until 8k then /10 (the step>=12000 branch is dead code,
`train_fcos_center_voc.py:151-157`), cen_type="focal",
center_only=True by default (line 184-195).
"""
from __future__ import annotations

import argparse
import functools

import jax.numpy as jnp

from detectax.cli._common import add_train_args, config_from_args, dataset_from_args
from detectax.cli._eval_hooks import fcos_eval_hook
from detectax.models import FCOS
from detectax.ops import assign
from detectax.train import losses as det_losses
from detectax.train.driver import fit


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_args(p, canvas=384, batch_size=16, init_lr=1e-3,
                   backbone="resnet50", max_steps=20000)
    p.add_argument("--center_only", action="store_true", default=True)
    p.add_argument("--neighborhood", dest="center_only", action="store_false",
                   help="assign the 3x3 neighborhood instead of centroid only")
    p.add_argument("--lr_boundary", type=int, default=8000)
    args = p.parse_args(argv)

    dataset = dataset_from_args(args)
    nc = dataset.num_classes
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = FCOS(num_classes=nc, variant="center", backbone=args.backbone,
                 dtype=dtype, freeze_bn=args.freeze_bn)
    cfg = config_from_args(
        args,
        optimizer="adam",
        schedule="piecewise",
        schedule_kwargs={
            "init_lr": args.init_lr,
            "boundaries": [args.lr_boundary],
            "scales": [0.1],
        },
        resize_mode="stretch",
    )
    img = (cfg.canvas, cfg.canvas)

    def assign_fn(boxes, labels, valid):
        outs, _ = assign.fcos_center_assign(
            boxes, labels, valid, img_dim=img, num_classes=nc,
            center_only=args.center_only,
        )
        return outs

    loss_fn = functools.partial(
        det_losses.fcos_loss, reg_type="l1", cen_type="focal"
    )
    hook = fcos_eval_hook(nc, dataset.id_to_label) if cfg.dump_visuals else None
    return fit(cfg, model, dataset, assign_fn, loss_fn, eval_hook=hook)


if __name__ == "__main__":
    main()
