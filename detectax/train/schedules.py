"""Learning-rate schedules (optax), matching the reference's three shapes.

* `exponential_with_floor` — `FCOS/train_fcos.py:108-110`:
  ``max(init * rate^(step/decay_steps), min_lr)``.
* `piecewise_constant` — `RetinaNet/train_retinanet_coco.py:164-169`,
  `CenterNet/train_centernet_crowdhuman.py:41-47`: step drops at
  boundaries. (The reference's unreachable ``step >= 12000`` branch in
  `train_fcos_center_voc.py:151-157` is dead code, not replicated.)
* `epoch_decay` — `CenterNet/train_hourglass_voc.py:225-226`:
  ``init * decay^floor(step/steps_per_epoch)``.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def exponential_with_floor(
    init_lr: float,
    decay_rate: float = 0.75,
    decay_steps: int = 1000,
    min_lr: float = 1e-5,
) -> optax.Schedule:
    def schedule(step):
        lr = init_lr * jnp.power(decay_rate, step / decay_steps)
        return jnp.maximum(lr, min_lr)

    return schedule


def piecewise_constant(
    init_lr: float,
    boundaries: Sequence[int],
    scales: Sequence[float],
) -> optax.Schedule:
    """lr = init_lr * prod(scales[i] for boundaries[i] <= step)."""
    return optax.piecewise_constant_schedule(
        init_lr, {int(b): float(s) for b, s in zip(boundaries, scales)}
    )


def epoch_decay(
    init_lr: float, decay: float, steps_per_epoch: int
) -> optax.Schedule:
    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        return init_lr * jnp.power(decay, epoch)

    return schedule


def with_warmup(schedule: optax.Schedule, warmup_steps: int) -> optax.Schedule:
    """Linear LR warmup over the first `warmup_steps` steps.

    New capability (no reference counterpart): the reference always starts
    from ImageNet-pretrained backbones, so it never needed warmup; training
    from scratch (DetBench protocol) does.
    """
    if warmup_steps <= 0:
        return schedule

    def s(step):
        w = jnp.minimum((step + 1) / warmup_steps, 1.0)
        return schedule(step) * w

    return s


def make_schedule(kind: str, **kwargs) -> optax.Schedule:
    if kind == "exponential":
        return exponential_with_floor(**kwargs)
    if kind == "piecewise":
        return piecewise_constant(**kwargs)
    if kind == "epoch":
        return epoch_decay(**kwargs)
    if kind == "constant":
        return optax.constant_schedule(kwargs["init_lr"])
    if kind == "cosine":
        # new capability (no reference counterpart): cosine decay to
        # alpha*init_lr over decay_steps — the modern default for
        # from-scratch detector training
        return optax.cosine_decay_schedule(
            kwargs["init_lr"],
            decay_steps=kwargs["decay_steps"],
            alpha=kwargs.get("alpha", 0.01),
        )
    raise ValueError(f"unknown schedule kind {kind!r}")


def make_optimizer(
    name: str,
    schedule: optax.Schedule,
    grad_clip: float = 1.0,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Grad-clip + optimizer chain.

    Mirrors the reference loop: `clip_by_global_norm(1.0)` then
    SGD(momentum=0.9) (`FCOS/train_fcos.py:183-185, 284-285`) or Adam
    (`CenterNet/train_hourglass_voc.py:330`); optional decoupled L2
    weight decay (the reference's explicit L2 term,
    `FCOS/train_fcos.py:118-120`).
    """
    txs = [optax.clip_by_global_norm(grad_clip)]
    if weight_decay > 0.0:
        txs.append(optax.add_decayed_weights(weight_decay))
    if name == "sgd":
        txs.append(optax.sgd(schedule, momentum=momentum))
    elif name == "adam":
        txs.append(optax.adam(schedule))
    elif name == "adamw":
        txs.append(optax.adamw(schedule))
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return optax.chain(*txs)
