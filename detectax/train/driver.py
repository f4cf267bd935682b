"""Generic training driver shared by every CLI trainer.

Replaces the reference's seven copy-pasted script bodies
(`FCOS/train_fcos.py:87-324` et al.) with one loop: host loader →
(optionally mesh-sharded) jitted train step → console/CSV metrics →
Orbax checkpoint cadence → periodic visual eval dumps. Resume restores
both the checkpoint and the metrics history
(reference `train_fcos.py:296-310` semantics).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from detectax.parallel import mesh as mesh_lib
from detectax.train.checkpoint import CheckpointManager
from detectax.train.loop import create_train_state, make_eval_forward, make_train_step
from detectax.train.metrics import MetricsLogger, ThroughputMeter, format_console
from detectax.train.schedules import make_optimizer, make_schedule


@dataclasses.dataclass
class TrainConfig:
    # data
    index: str | None = None          # dataset index json (None -> synthetic)
    batch_size: int = 16
    canvas: int = 384
    max_boxes: int = 64
    jitter: tuple[float, float] | None = None
    jitter_per_batch: bool = False
    pad_position: str = "topleft"
    augment: str = "none"
    normalize: str = "tf"
    resize_mode: str = "resize_pad"
    # optimization
    max_steps: int = 1000
    optimizer: str = "sgd"
    schedule: str = "exponential"
    schedule_kwargs: dict = dataclasses.field(
        default_factory=lambda: {"init_lr": 5e-4}
    )
    grad_clip: float = 1.0
    weight_decay: float = 0.0
    microbatch: int | None = None
    # "batch" (reference divide_no_nan parity) or "pos" (normalize by
    # positive cells — FCOS-paper convention, needed from scratch)
    loss_norm: str = "batch"
    warmup_steps: int = 0
    # EMA of params (0 = off). New capability beyond the reference; the
    # averaged weights live in state.ema_params and evaluate/--ema uses them.
    ema_decay: float = 0.0
    # observability
    ckpt_dir: str = "ckpt"
    display_step: int = 50
    step_save: int = 500
    max_to_keep: int = 1
    resume: bool = False
    dump_visuals: bool = False
    out_dir: str = "outputs"
    seed: int = 0
    # debugging / tracing (SURVEY.md §5.1-5.2: new first-class subsystems)
    profile_steps: tuple[int, int] | None = None  # (start, stop) step range
    debug_nans: bool = False
    # ship uint8 batches and normalize on-device (4x less H2D traffic)
    device_normalize: bool = True
    # msgpack of ported backbone weights (tools/port_tf_weights) to load
    # into the fresh state before training (reference trains from
    # ImageNet-pretrained Keras backbones, FCOS/fcos.py:30-41)
    init_backbone: str | None = None


def build_loader(cfg: TrainConfig, dataset):
    from detectax.data.pipeline import Loader

    return Loader(
        dataset,
        batch_size=cfg.batch_size,
        canvas=cfg.canvas,
        max_boxes=cfg.max_boxes,
        mode=cfg.resize_mode,
        pad_position=cfg.pad_position,
        augment=cfg.augment,
        jitter=cfg.jitter,
        jitter_per_batch=cfg.jitter_per_batch,
        normalize=cfg.normalize,
        emit_uint8=cfg.device_normalize,
        seed=cfg.seed,
        num_hosts=jax.process_count(),
        host_id=jax.process_index(),
        steps=cfg.max_steps,
    )


def _device_prefetch(loader, mesh, depth: int = 2):
    """Move host batches to the device on a background thread.

    Host->device transfer through a remote-dispatch backend blocks the
    calling thread; overlapping it with device compute (and with host batch
    production) is worth ~4x end-to-end throughput. Yields
    (device_batch, host_batch) pairs.
    """
    import queue as _queue
    import threading as _threading

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def worker():
        try:
            for batch in loader:
                if mesh is not None:
                    # handles both single-process device_put and
                    # multi-process local-shard assembly
                    db = mesh_lib.shard_batch(batch, mesh)
                else:
                    db = {k: jnp.asarray(v) for k, v in batch.items()}
                q.put((db, batch))
        except Exception as e:  # surface loader errors in the main thread
            err.append(e)
        finally:
            q.put(sentinel)

    t = _threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def load_backbone_weights(state, path: str):
    """Load a ported backbone msgpack (tools/port_tf_weights) into a fresh
    TrainState: replaces the backbone submodule's params + batch_stats,
    leaving FPN/heads at their fresh init."""
    import re

    from detectax.tools.port_tf_weights import load_ported

    pattern = re.compile(r"^(ResNet|MobileNetV2|TinyBackbone)_\d+$")
    keys = [k for k in state.params if pattern.match(k)]
    if len(keys) != 1:
        raise ValueError(
            f"expected exactly one backbone submodule, found {keys}"
        )
    bk = keys[0]
    template = {
        "params": state.params[bk],
        "batch_stats": state.batch_stats[bk],
    }
    loaded = load_ported(path, template)
    params = dict(state.params)
    params[bk] = loaded["params"]
    batch_stats = dict(state.batch_stats)
    batch_stats[bk] = loaded["batch_stats"]
    print(f"initialized backbone {bk} from {path}")
    return state.replace(params=params, batch_stats=batch_stats)


def fit(
    cfg: TrainConfig,
    model,
    dataset,
    assign_fn: Callable,
    loss_fn: Callable,
    *,
    eval_hook: Callable | None = None,
) -> dict:
    """Run training; returns final metrics summary."""
    mesh_lib.maybe_initialize_distributed()
    os.makedirs(cfg.out_dir, exist_ok=True)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    schedule = make_schedule(cfg.schedule, **cfg.schedule_kwargs)
    if cfg.warmup_steps:
        from detectax.train.schedules import with_warmup

        schedule = with_warmup(schedule, cfg.warmup_steps)
    optimizer = make_optimizer(
        cfg.optimizer, schedule,
        grad_clip=cfg.grad_clip, weight_decay=cfg.weight_decay,
    )

    devices = jax.devices()
    use_mesh = len(devices) > 1
    canvas_max = (
        max(cfg.canvas) if isinstance(cfg.canvas, (list, tuple))
        else cfg.canvas
    )
    sample = jnp.zeros((cfg.batch_size, canvas_max, canvas_max, 3))
    state = create_train_state(
        model, jax.random.PRNGKey(cfg.seed), sample, optimizer,
        ema=cfg.ema_decay > 0.0,
    )
    if cfg.init_backbone:
        state = load_backbone_weights(state, cfg.init_backbone)

    if use_mesh:
        mesh = mesh_lib.make_mesh()
        state, shardings = mesh_lib.shard_train_state(state, mesh)
        raw_step = make_train_step(
            model, assign_fn, loss_fn, optimizer,
            microbatch=cfg.microbatch, jit=False,
            normalize=cfg.normalize if cfg.device_normalize else None,
            loss_norm=cfg.loss_norm,
            ema_decay=cfg.ema_decay or None,
        )
        step_fn = mesh_lib.make_sharded_train_step(
            raw_step, mesh, state_shardings=shardings
        )
    else:
        mesh = None
        step_fn = make_train_step(
            model, assign_fn, loss_fn, optimizer, microbatch=cfg.microbatch,
            normalize=cfg.normalize if cfg.device_normalize else None,
            loss_norm=cfg.loss_norm,
            ema_decay=cfg.ema_decay or None,
        )

    ckpt = CheckpointManager(cfg.ckpt_dir, max_to_keep=cfg.max_to_keep)
    logger = MetricsLogger(
        csv_path=os.path.join(cfg.out_dir, "losses.csv"),
        jsonl_path=os.path.join(cfg.out_dir, "metrics.jsonl"),
    )
    start_step = 0
    if cfg.resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state, start_step = restored
            print(f"resumed from checkpoint at step {start_step}")
        else:
            print("no checkpoint found; starting fresh")

    loader = build_loader(cfg, dataset)
    meter = ThroughputMeter()
    meter.start()
    eval_fwd = make_eval_forward(model) if eval_hook else None

    step = start_step
    last_metrics: dict = {}
    t_start = time.time()
    for device_batch, batch in _device_prefetch(loader, mesh):
        if step >= cfg.max_steps:
            break
        if cfg.profile_steps and step == cfg.profile_steps[0]:
            jax.profiler.start_trace(os.path.join(cfg.out_dir, "profile"))
        state, metrics = step_fn(state, device_batch)
        meter.update(cfg.batch_size)
        step += 1
        if cfg.profile_steps and step == cfg.profile_steps[1]:
            # force completion so the trace captures real device work
            _ = float(metrics["total"])
            jax.profiler.stop_trace()
            print(f"profile trace written to {cfg.out_dir}/profile")

        if step % cfg.display_step == 0 or step == cfg.max_steps:
            metrics_host = {
                k: float(v) for k, v in metrics.items()
            }
            rate = meter.reset()
            metrics_host["images_per_sec"] = rate
            lr = float(schedule(step))
            print(format_console(step, lr, metrics_host))
            logger.log(step, metrics_host)
            last_metrics = metrics_host
            if eval_hook and eval_fwd:
                hook_batch = batch
                if cfg.device_normalize:
                    from detectax.data.pipeline import normalize_pixels

                    hook_batch = dict(batch)
                    hook_batch["images"] = normalize_pixels(
                        batch["images"].astype(np.float32), cfg.normalize
                    )
                eval_hook(
                    step=step, state=state, forward=eval_fwd,
                    batch=hook_batch, out_dir=cfg.out_dir,
                )

        if step % cfg.step_save == 0 or step == cfg.max_steps:
            ckpt.save(step, jax.device_get(state))
            logger.flush_csv()

    ckpt.wait()
    logger.flush_csv()
    elapsed = time.time() - t_start
    summary = {
        "final_step": step,
        "elapsed_sec": elapsed,
        "images_per_sec": (step - start_step) * cfg.batch_size / max(elapsed, 1e-9),
        **last_metrics,
    }
    print(
        f"done: {summary['final_step']} steps in {elapsed / 60:.1f} min "
        f"({summary['images_per_sec']:.1f} img/s)"
    )
    return summary


def restore_for_inference(
    cfg_ckpt_dir: str, model, canvas: int, optimizer=None,
    use_ema: bool = False,
):
    """Build a state template and restore the latest checkpoint for infer.

    Restores params/batch_stats only, so any trainer's checkpoint loads
    regardless of the optimizer that produced it. ``use_ema=True`` loads
    the EMA-averaged weights instead of the raw params.
    """
    opt = optimizer or make_optimizer(
        "sgd", make_schedule("constant", init_lr=1e-3)
    )
    template = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, canvas, canvas, 3)), opt
    )
    ckpt = CheckpointManager(cfg_ckpt_dir)
    restored = ckpt.restore_params(template, use_ema=use_ema)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {cfg_ckpt_dir}")
    state, step = restored
    print(f"restored checkpoint at step {step}")
    return state
