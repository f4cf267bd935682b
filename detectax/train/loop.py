"""Jitted training step with on-device target assignment.

Replaces the reference's per-image eager GradientTape loops
(`FCOS/train_fcos.py:128-185`) with a single compiled step:

  batch (images + padded GT) -> vmapped assignment (VPU) -> forward (MXU)
  -> loss -> grad -> clip -> optimizer update

all inside one `jax.jit` with donated state (no host round-trips, no
gradient staging buffers — the reference pinned accumulators to CPU RAM,
`train_retinanet_coco.py:177-179`, which is unnecessary on TPU).

Gradient accumulation parity: the reference accumulates per-image or
per-sub-batch gradients purely to emulate a large batch
(`tf_centernet_resnet_s8.py:387-444`). XLA just runs the real batch; an
optional `microbatch` argument keeps the memory-bounded semantics via
`lax.scan` over sub-batches inside the same jitted step.
"""
from __future__ import annotations


import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # exponential moving average of params (None = disabled; an empty
    # pytree keeps checkpoints structure-compatible either way)
    ema_params: Any = None


def create_train_state(
    model, rng, sample_batch_images, optimizer, ema: bool = False
) -> TrainState:
    # jit the init: unjitted flax init dispatches op-by-op, which is
    # pathologically slow through a remote-dispatch TPU backend
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=True))
    variables = init_fn(rng, sample_batch_images)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )


def make_train_step(
    model,
    assign_fn: Callable,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    microbatch: int | None = None,
    donate: bool = True,
    jit: bool = True,
    normalize: str | None = None,
    loss_norm: str = "batch",
    ema_decay: float | None = None,
):
    """Build the jitted train step.

    Args:
      assign_fn: per-example ``(boxes[N,4], labels[N], valid[N]) -> y_true``
        (any pytree of target maps); vmapped over the batch inside the step.
      loss_fn: ``(y_true, y_pred) -> dict`` with a "total" entry
        (per-example-sum; divided by batch size here).
      microbatch: if set, split the batch into chunks of this size and
        accumulate gradients via `lax.scan` (reference sub_batch_sz
        semantics).
      loss_norm: "batch" divides the summed losses by batch size (reference
        `divide_no_nan(acc, batch)` parity); "pos" divides by the batch's
        positive-cell count (FCOS-paper convention — required for stable
        from-scratch training, where sum-scale losses collide with the
        global-norm gradient clip). "pos" needs a loss_fn that returns a
        "num_pos" entry. With microbatching, chunk sums are accumulated
        unnormalized and divided once by the batch's global positive
        count, so gradients match the non-microbatch step bit-for-bit in
        expectation regardless of how positives fall across chunks.

    Returns ``step(state, batch) -> (state, metrics)`` where batch is a
    dict of ``images [B,H,W,3]``, ``boxes [B,N,4]``, ``labels [B,N]``,
    ``valid [B,N]``.
    """
    import inspect

    # assign_fn may take (boxes, labels, valid) with a baked-in canvas, or
    # (boxes, labels, valid, img_hw) for multi-scale bucket training where
    # the canvas comes from the (static-under-jit) batch image shape.
    assign_takes_hw = len(inspect.signature(assign_fn).parameters) >= 4

    def forward_loss(params, batch_stats, images, y_true, batch_size,
                     raw=False):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        losses = loss_fn(y_true, preds)
        if raw:
            # unnormalized per-chunk sums (num_pos kept in the dict so the
            # scan accumulates it); the step divides once by the batch's
            # global positive count after accumulation
            return losses["total"], (losses, mutated["batch_stats"])
        if loss_norm == "pos":
            denom = jnp.maximum(losses["num_pos"], 1.0)
        else:
            # divide_no_nan(sum, batch) parity (train_fcos.py:179-180)
            denom = batch_size
        num_pos = losses.pop("num_pos", None)
        losses = jax.tree_util.tree_map(lambda v: v / denom, losses)
        if num_pos is not None:
            losses["num_pos"] = num_pos
        return losses["total"], (losses, mutated["batch_stats"])

    grad_fn = jax.value_and_grad(forward_loss, has_aux=True)
    grad_fn_raw = jax.value_and_grad(
        lambda p, bs, im, yt, b: forward_loss(p, bs, im, yt, b, raw=True),
        has_aux=True,
    )

    def _normalize(images):
        # on-device normalization: the host ships uint8 (4x less traffic)
        # and the division fuses into the first conv's input
        x = images.astype(jnp.float32)
        if normalize == "tf":
            return x / 127.5 - 1.0
        if normalize == "unit":
            return x / 255.0
        return x

    def step(state: TrainState, batch):
        images = batch["images"]
        if normalize is not None:
            images = _normalize(images)
        bsz = images.shape[0]
        if assign_takes_hw:
            hw = (images.shape[1], images.shape[2])
            batched_assign = jax.vmap(
                lambda b, l, v: assign_fn(b, l, v, hw)
            )
        else:
            batched_assign = jax.vmap(assign_fn)
        y_true = batched_assign(
            batch["boxes"], batch["labels"], batch["valid"]
        )

        if microbatch is None or microbatch >= bsz:
            (_, (losses, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, images, y_true, float(bsz)
            )
        else:
            assert bsz % microbatch == 0, "batch must divide by microbatch"
            n_chunks = bsz // microbatch

            def reshape_chunks(t):
                return t.reshape(n_chunks, microbatch, *t.shape[1:])

            images_c = reshape_chunks(images)
            y_true_c = jax.tree_util.tree_map(reshape_chunks, y_true)

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

            chunk_grad_fn = grad_fn_raw if loss_norm == "pos" else grad_fn

            def scan_body(carry, chunk):
                acc_grads, acc_losses, bs = carry
                imgs, yt = chunk
                (_, (losses, new_bs)), grads = chunk_grad_fn(
                    state.params, bs, imgs, yt, float(bsz)
                )
                acc_grads = jax.tree_util.tree_map(
                    jnp.add, acc_grads, grads
                )
                acc_losses = jax.tree_util.tree_map(
                    jnp.add, acc_losses, losses
                )
                return (acc_grads, acc_losses, new_bs), None

            loss_struct = jax.eval_shape(
                forward_loss,
                state.params,
                state.batch_stats,
                images_c[0],
                jax.tree_util.tree_map(lambda t: t[0], y_true_c),
                1.0,
            )[1][0]
            zero_losses = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), loss_struct
            )
            (grads, losses, new_bs), _ = jax.lax.scan(
                scan_body,
                (zero_grads, zero_losses, state.batch_stats),
                (images_c, y_true_c),
            )
            if loss_norm == "pos":
                # chunks accumulated *unnormalized* (raw grad fn); divide
                # once by the batch's global positive count so gradients
                # match the non-microbatch step exactly, however unevenly
                # positives fall across chunks
                num_pos = losses.pop("num_pos")
                inv = 1.0 / jnp.maximum(num_pos, 1.0)
                grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
                losses = jax.tree_util.tree_map(lambda v: v * inv, losses)
                losses["num_pos"] = num_pos

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        if ema_decay is not None and state.ema_params is not None:
            d = ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + (1.0 - d) * p,
                state.ema_params, new_params,
            )
        else:
            new_ema = state.ema_params
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if not jit:
        # caller will jit with explicit mesh shardings
        # (detectax.parallel.mesh.make_sharded_train_step)
        return step
    return jax.jit(
        step,
        donate_argnums=(0,) if donate else (),
        compiler_options=tpu_compiler_options(),
    )


def tpu_compiler_options() -> dict | None:
    """Default train-step compile options on TPU.

    The latency-hiding scheduler measured +1.2pt MFU on the flagship step
    (benchmarks/r4/mfu_breakdown.log: 490 -> 503 img/s; scoped-vmem and
    extra-fusion flags were neutral or negative and are not set). Options
    are TPU-compile-time only, so gate on the default backend — the CPU
    compiler rejects unknown flags. Opt out with DETECTAX_NO_LHS=1.
    """
    from detectax.ops.pallas._common import on_tpu

    if os.environ.get("DETECTAX_NO_LHS") == "1" or not on_tpu():
        return None
    return {"xla_tpu_enable_latency_hiding_scheduler": "true"}


def make_eval_forward(model):
    """Jitted inference forward (train=False, running BN stats)."""

    @jax.jit
    def forward(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=False,
        )

    return forward
