"""Bucketed-batch serving driver for exported detectors.

TPU serving is static-shape serving: every distinct batch size is its own
compiled executable, so an unconstrained request stream would retrace and
recompile constantly. `Predictor` pins the contract the export side
established (`infer.export.save_bundle`: one StableHLO artifact per batch
bucket): requests of any size are greedily chunked into the largest
bucket that fits, the final partial chunk is zero-padded up to the
smallest covering bucket, and pad rows are dropped from the output. In
steady state every dispatch hits a warm executable — zero compiles.

The reference has no counterpart (its infer scripts are single-image
eager loops); this is the production-serving layer the task's deployment
target needs.
"""
from __future__ import annotations

from typing import Callable, Mapping, Sequence

import numpy as np


class Predictor:
    """Run an exported detector over arbitrary-size request batches.

    ``bucket_fns`` maps batch size -> ``fn(images[b,H,W,3] f32) ->
    detection dict`` (each from one exported artifact, or one jitted
    live-model closure via `for_model`).
    """

    def __init__(self, bucket_fns: Mapping[int, Callable], *,
                 canvas: int, manifest: dict | None = None):
        if not bucket_fns:
            raise ValueError("need at least one batch bucket")
        self._fns = {int(b): f for b, f in bucket_fns.items()}
        self._buckets = sorted(self._fns)
        self.canvas = int(canvas)
        self.manifest = manifest or {}

    @classmethod
    def for_model(cls, serving_fn: Callable, params, batch_stats, *,
                  canvas: int, buckets: Sequence[int] = (1, 8)):
        """Bucketed predictor over a live model (no export round-trip) —
        the same dispatch discipline for in-process serving."""
        import jax

        jitted = jax.jit(serving_fn)
        fns = {
            int(b): (lambda images, _f=jitted: _f(params, batch_stats,
                                                  images))
            for b in buckets
        }
        return cls(fns, canvas=canvas)

    def _plan(self, n: int) -> list[int]:
        """Greedy chunking: largest bucket <= remaining, else the smallest
        bucket covering the tail (padded)."""
        plan = []
        while n > 0:
            fit = [b for b in self._buckets if b <= n]
            if fit:
                b = fit[-1]
            else:
                b = next(x for x in self._buckets if x >= n)
            plan.append(b)
            n -= min(b, n)
        return plan

    def warmup(self) -> None:
        """Compile every bucket once (zeros input) so first real requests
        are served from cache."""
        for b in self._buckets:
            out = self._fns[b](
                np.zeros((b, self.canvas, self.canvas, 3), np.float32)
            )
            np.asarray(out["num_valid"])  # force completion (relay-safe)

    # Detection-dict keys every detectax serving graph returns
    # (`ops.nms` contract) — used to shape the n==0 early return.
    _DET_KEYS = ("boxes", "scores", "classes", "valid", "num_valid")

    def predict(self, images: np.ndarray) -> dict:
        """images: [n, canvas, canvas, 3] float32 (already preprocessed —
        see `infer.export.preprocess_images`). Returns the detection dict
        with leading dim n (pad rows removed)."""
        images = np.asarray(images, dtype=np.float32)
        if images.ndim != 4 or images.shape[1:3] != (self.canvas,
                                                     self.canvas):
            raise ValueError(
                f"expected images [n, {self.canvas}, {self.canvas}, 3] "
                f"(the bundle's canvas), got {images.shape}; preprocess "
                "with infer.export.preprocess_images"
            )
        n = images.shape[0]
        if n == 0:
            # empty request: empty detection dict, no device dispatch
            return {k: np.zeros((0,), np.float32) for k in self._DET_KEYS}
        outs, taken = [], 0
        for b in self._plan(n):
            chunk = images[taken:taken + b]
            taken += chunk.shape[0]
            if chunk.shape[0] < b:
                pad = np.zeros(
                    (b - chunk.shape[0],) + chunk.shape[1:], np.float32
                )
                chunk = np.concatenate([chunk, pad])
            out = self._fns[b](chunk)
            outs.append({k: np.asarray(v) for k, v in out.items()})
        return {
            k: np.concatenate([o[k] for o in outs])[:n]
            for k in outs[0]
        }
