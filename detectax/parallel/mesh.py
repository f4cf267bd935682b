"""Device mesh, shardings, and the data-parallel (+FSDP) train step.

The reference has no parallelism at all — its trainers iterate images one
at a time in Python (SURVEY.md §2.6). This module is the TPU-native
replacement: a `jax.sharding.Mesh` over the chips, `NamedSharding` batch
sharding on the "data" axis, gradients all-reduced over ICI by the XLA
collectives that `jax.jit` inserts automatically, and optional FSDP-style
parameter sharding for large backbones. Multi-host: call
`maybe_initialize_distributed()` first; each host feeds its own batch
shard (host-sharded input pipeline, `detectax.data.pipeline`).

The models here are small CNNs (<= ResNet-101 + FPN), so DP (+ FSDP
fallback) is the honest scope — no TP/PP (SURVEY.md §2.6).
"""
from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """Initialize jax.distributed when launched multi-host (no-op solo,
    no-op if the launcher already initialized it)."""
    if int(os.environ.get("DETECTAX_NUM_PROCESSES", "1")) > 1:
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized by the launcher


def make_mesh(
    n_devices: int | None = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D (default) device mesh over all available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    mesh_devices = mesh_utils.create_device_mesh(
        (n,), devices=devices[:n]
    )
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(param: jax.ShapeDtypeStruct, mesh: Mesh, min_size: int = 2**16):
    """Shard the largest divisible axis of big params over "data" (FSDP);
    replicate small ones."""
    n = mesh.devices.size
    if np.prod(param.shape) < min_size:
        return P()
    # prefer sharding the largest axis that divides evenly
    order = sorted(
        range(len(param.shape)), key=lambda i: -param.shape[i]
    )
    for axis in order:
        if param.shape[axis] % n == 0:
            spec = [None] * len(param.shape)
            spec[axis] = "data"
            return P(*spec)
    return P()


def shard_train_state(state, mesh: Mesh, fsdp: bool = False):
    """Place a TrainState on the mesh (replicated, or FSDP param shards)."""
    if not fsdp:
        repl = replicated_sharding(mesh)
        return jax.device_put(state, repl), jax.tree_util.tree_map(
            lambda _: repl, state
        )
    shapes = jax.tree_util.tree_map(
        lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype), state
    )

    def spec_of(path_leaf):
        return NamedSharding(mesh, fsdp_param_spec(path_leaf, mesh))

    shardings = jax.tree_util.tree_map(spec_of, shapes)
    # step scalar must be replicated
    return jax.device_put(state, shardings), shardings


def make_sharded_train_step(
    train_step, mesh: Mesh, state_shardings: Any = None, fsdp: bool = False
):
    """Wrap a `make_train_step` product with explicit mesh shardings.

    The inner step is already jitted; re-jitting with in/out shardings
    pins: state -> replicated (or FSDP shards), batch -> batch-sharded.
    XLA inserts the ICI psum for the gradient all-reduce.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    state_in = state_shardings if state_shardings is not None else repl
    from detectax.train.loop import tpu_compiler_options

    return jax.jit(
        train_step,
        in_shardings=(state_in, data),
        out_shardings=(state_in, repl),
        donate_argnums=(0,),
        compiler_options=tpu_compiler_options(),
    )


def make_sharded_eval_fn(eval_fn, mesh: Mesh):
    """Batch-sharded inference over the mesh for the eval/serving path.

    ``eval_fn(params, batch_stats, images) -> detections`` (the
    `cli.evaluate` / `infer.export.make_serving_fn` composition) is jitted
    with params/stats replicated and the image batch sharded over "data";
    each chip runs forward + decode + NMS on its own shard and the
    detection dict comes back batch-sharded (no cross-chip traffic at all
    — detection is embarrassingly data-parallel, unlike the train step's
    gradient all-reduce).
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        eval_fn, in_shardings=(repl, repl, data), out_shardings=data
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, batch axis over "data".

    Single-process: a plain device_put. Multi-process: each process holds
    only its own loader shard, so the global array is assembled from
    process-local data (the DCN data path — host batches never cross
    hosts; only gradient all-reduces do).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.device_put(batch, sh)
