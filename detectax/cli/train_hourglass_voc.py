"""Train hourglass CenterNet on VOC — mirror of
`CenterNet/train_hourglass_voc.py`.

Reference config (lines 311-330): batch 96, sub_batch 2, Adam with
epoch-decay LR, n_filters 12, 320px base with continuous 0.6-1.3x scale
jitter rounded to 64-multiples + center pad, 4 size bins
``img_dims / 2^x``, sigmoid or focal class loss with reg_lambda 0.10.
"""
from __future__ import annotations

import argparse
import functools

import jax.numpy as jnp

from detectax.cli._common import add_train_args, config_from_args, dataset_from_args
from detectax.models import HourglassNet, StackedHourglass
from detectax.ops import assign
from detectax.train import losses as det_losses
from detectax.train.driver import fit


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_args(p, canvas=320, batch_size=96, init_lr=1e-3,
                   max_steps=10000, microbatch=2)
    p.add_argument("--n_filters", type=int, default=12)
    p.add_argument(
        "--variant", choices=("hourglass", "stacked"), default="hourglass",
        help="'stacked' trains models.StackedHourglass (the reference's "
             "orphaned tf_centernet_hourglass.py, given a training "
             "surface here): single stride-4 map, centroid assignment, "
             "focal + smooth-L1",
    )
    p.add_argument("--n_stacks", type=int, default=1,
                   help="stacked variant: number of hourglass stacks")
    p.add_argument("--loss_type", choices=("sigmoid", "focal"),
                   default="sigmoid")
    p.add_argument("--reg_lambda", type=float, default=0.10)
    p.add_argument("--lr_decay", type=float, default=0.90)
    p.add_argument("--steps_per_epoch", type=int, default=500)
    p.add_argument(
        "--multi_scale", type=int, nargs="+", default=None,
        help="discrete canvas buckets, e.g. 256 320 384 448 "
             "(reference train_hourglass_voc_v0.py:73); one bucket is "
             "chosen per batch and the step recompiles per bucket",
    )
    args = p.parse_args(argv)

    # canvases must be 64-multiples for the 6-stage encoder
    rounded = lambda c: ((c + 63) // 64) * 64
    canvas = rounded(args.canvas)
    args.canvas = canvas
    buckets = (
        [rounded(c) for c in args.multi_scale] if args.multi_scale else None
    )

    dataset = dataset_from_args(args)
    nc = dataset.num_classes
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.variant == "stacked":
        model = StackedHourglass(
            num_classes=nc, n_filters=args.n_filters,
            n_stacks=args.n_stacks, dtype=dtype,
        )
    else:
        model = HourglassNet(
            num_classes=nc, n_filters=args.n_filters, dtype=dtype
        )
    cfg = config_from_args(
        args,
        optimizer="adam",
        schedule="epoch",
        schedule_kwargs={
            "init_lr": args.init_lr,
            "decay": args.lr_decay,
            "steps_per_epoch": args.steps_per_epoch,
        },
        pad_position="center",
        augment="hourglass",
        jitter=(0.6 * canvas, canvas),
    )
    if buckets:
        cfg.canvas = buckets
        cfg.jitter = None  # discrete buckets replace continuous jitter

    if args.variant == "stacked":
        stride = model.output_stride

        def assign_fn(boxes, labels, valid, img_hw):
            out, _ = assign.stacked_hourglass_assign(
                boxes, labels, valid, img_dim=tuple(img_hw),
                num_classes=nc, stride=stride,
            )
            return out

        loss_fn = det_losses.stacked_hourglass_loss
    else:
        def assign_fn(boxes, labels, valid, img_hw):
            # scale bins derive from the (per-bucket) canvas, reference
            # train_hourglass_voc.py:97-98
            scales = tuple(img_hw[0] / (2.0**x) for x in reversed(range(4)))
            out, _ = assign.hourglass_assign(
                boxes, labels, valid, img_dim=tuple(img_hw), num_classes=nc,
                box_scales=scales,
            )
            return out

        loss_fn = functools.partial(
            det_losses.hourglass_loss,
            loss_type=args.loss_type, reg_lambda=args.reg_lambda,
        )
    return fit(cfg, model, dataset, assign_fn, loss_fn)


if __name__ == "__main__":
    main()
