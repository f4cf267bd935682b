"""Serving export: AOT detector artifacts via ``jax.export`` (StableHLO).

New capability beyond the reference, which has no export/serving story —
its inference entry points (`FCOS/infer_fcos.py`,
`RetinaNet/infer_retinanet.py`) rebuild the Keras graph from Python source
and restore a training checkpoint on every invocation. Here the full
compiled serving graph (forward → decode → candidate select → NMS, the
same one-dispatch pipeline `cli.evaluate` measures mAP with) is frozen to
a portable StableHLO artifact plus a weights msgpack. A serving host
replays the artifact through ``jax.export.deserialize`` without the
detectax model code, and the TPU-idiomatic batching contract is explicit:
one artifact per static batch bucket, compile-once, zero retraces in
steady state (`infer.serving.Predictor`).

Weights ship as *call arguments*, not baked constants: constants would
bloat every artifact by the parameter size and (on this relay backend)
degrade dispatch latency for the whole process (CLAUDE.md); as arguments
one weights file serves every bucket.

Bundle layout (``save_bundle``)::

    <dir>/manifest.json          family/geometry/NMS config + bucket list
    <dir>/weights.msgpack        {"params": ..., "batch_stats": ...}
    <dir>/serving_b<N>.stablehlo jax.export artifact per batch bucket
"""
from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from detectax.infer import predict as P

MANIFEST_NAME = "manifest.json"
WEIGHTS_NAME = "weights.msgpack"


def make_serving_fn(
    model,
    decode: Callable,
    *,
    top_k: int = 1024,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.05,
    max_outputs: int = 100,
    class_aware_candidates: bool = False,
    fused: bool | None = None,
    pallas: bool | None = None,
) -> Callable:
    """The serving graph: ``fn(params, batch_stats, images) -> detections``
    — identical composition to `cli.evaluate`'s measured eval pipeline.
    Returns the `ops.nms` detection dict (boxes/scores/classes/valid/
    num_valid), padded to ``max_outputs``.

    ``pallas=False`` builds a Pallas-free graph (pure-XLA NMS twins) —
    required when exporting one artifact for several platforms (see
    `export_detector`)."""

    def fn(params, batch_stats, images):
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False,
        )
        boxes, probs = decode(outs)
        return P.detections_from_dense(
            boxes, probs, top_k=top_k, iou_thresh=iou_thresh,
            score_thresh=score_thresh, max_outputs=max_outputs,
            class_aware_candidates=class_aware_candidates, fused=fused,
            pallas=pallas,
        )

    return fn


def export_detector(
    serving_fn: Callable,
    params,
    batch_stats,
    *,
    batch: int,
    canvas: int,
    platforms: Sequence[str] | None = None,
):
    """Export ``serving_fn`` at a concrete ``[batch, canvas, canvas, 3]``
    f32 input shape.

    ``platforms=None`` targets the current default backend. Pass e.g.
    ``("tpu",)`` to cross-export a TPU artifact from a CPU host — the
    Pallas-vs-XLA picks inside the serving graph are
    `lax.platform_dependent` branches resolved at lowering, not trace-time
    backend sniffs, so the right kernels land regardless of the exporting
    host. Multi-platform artifacts (``("tpu", "cpu")``) additionally
    require a Pallas-free graph (``make_serving_fn(..., pallas=False)``):
    JAX's multi-platform lowering runs every platform's rule for a
    pallas_call eqn even inside an unselected platform branch, and the
    pallas CPU rule rejects compiled mode."""
    img_spec = jax.ShapeDtypeStruct((batch, canvas, canvas, 3), jnp.float32)
    spec = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), t
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    return jax.export.export(jax.jit(serving_fn), **kw)(
        spec(params), spec(batch_stats), img_spec
    )


def save_bundle(
    out_dir: str,
    serving_fn: Callable,
    params,
    batch_stats,
    *,
    canvas: int,
    buckets: Sequence[int] = (1, 8),
    manifest_extra: dict | None = None,
    platforms: Sequence[str] | None = None,
) -> dict:
    """Export one artifact per batch bucket + weights + manifest."""
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    buckets = sorted(set(int(b) for b in buckets))
    for b in buckets:
        ex = export_detector(
            serving_fn, params, batch_stats,
            batch=b, canvas=canvas, platforms=platforms,
        )
        with open(os.path.join(out_dir, f"serving_b{b}.stablehlo"), "wb") as f:
            f.write(ex.serialize())
    host_weights = jax.tree.map(np.asarray, {
        "params": params, "batch_stats": batch_stats,
    })
    with open(os.path.join(out_dir, WEIGHTS_NAME), "wb") as f:
        f.write(serialization.msgpack_serialize(host_weights))
    manifest = {
        "format": "detectax-serving-bundle-v1",
        "canvas": int(canvas),
        "buckets": buckets,
        **(manifest_extra or {}),
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_bundle(bundle_dir: str):
    """Rehydrate a bundle into an `infer.serving.Predictor`. Needs no
    detectax model code — only the serialized StableHLO + weights."""
    from flax import serialization

    from detectax.infer.serving import Predictor

    with open(os.path.join(bundle_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    with open(os.path.join(bundle_dir, WEIGHTS_NAME), "rb") as f:
        weights = serialization.msgpack_restore(f.read())

    bucket_fns = {}
    for b in manifest["buckets"]:
        path = os.path.join(bundle_dir, f"serving_b{b}.stablehlo")
        with open(path, "rb") as f:
            exported = jax.export.deserialize(f.read())
        # jit the replayed call so repeat invocations hit the executable
        # cache instead of re-tracing the deserialized module
        call = jax.jit(exported.call)

        def run(images, _call=call):
            return _call(
                weights["params"], weights["batch_stats"], images
            )

        bucket_fns[int(b)] = run
    return Predictor(bucket_fns, canvas=manifest["canvas"],
                     manifest=manifest)


def preprocess_images(
    images: Sequence[np.ndarray],
    *,
    canvas: int,
    resize_mode: str = "resize_pad",
    pad_position: str = "topleft",
    normalize: str = "tf",
) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """Host-side request preprocessing with the family's training geometry
    (manifest fields mirror `cli.evaluate.TRAIN_GEOMETRY`). Returns the
    stacked f32 batch plus each image's placed content (h, w) so callers
    can rescale boxes back to source resolution."""
    from detectax.data.pipeline import normalize_pixels, place_on_canvas

    out, content_hw = [], []
    for img in images:
        placed, _, hw = place_on_canvas(
            np.asarray(img), np.zeros((0, 4), np.float32),
            (canvas, canvas), mode=resize_mode, pad_position=pad_position,
        )
        out.append(normalize_pixels(placed, normalize))
        content_hw.append(hw)
    return np.stack(out).astype(np.float32), content_hw
