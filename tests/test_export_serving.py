"""Serving export + bucketed Predictor: round-trip and batching contracts.

The exported StableHLO artifact must reproduce the live model bit-for-bit
on the same platform, the weights msgpack must rehydrate into the
artifact's input tree, and the Predictor's pad-to-bucket chunking must be
invisible in the results (pad rows dropped, per-image outputs identical
to a direct full-batch call).
"""
import numpy as np
import pytest

from detectax.infer.export import (
    load_bundle,
    make_serving_fn,
    preprocess_images,
    save_bundle,
)
from detectax.infer.serving import Predictor


@pytest.fixture(scope="module")
def tiny_fcos_model():
    import jax
    from detectax.cli.evaluate import build_family

    class A:
        center = False
        box_scales = [8.0, 16.0, 32.0, 48.0, 64.0]
        anchor_sizes = [8.0, 16.0, 24.0, 32.0, 48.0]
        n_filters = 4
        n_stacks = 1

    model, decode = build_family("fcos", 5, "tiny", 64, A())
    variables = model.init(
        jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    return model, decode, variables["params"], variables["batch_stats"]


@pytest.fixture(scope="module")
def tiny_fcos(tiny_fcos_model):
    model, decode, params, batch_stats = tiny_fcos_model
    fn = make_serving_fn(model, decode, top_k=64, max_outputs=16)
    return fn, params, batch_stats


def test_export_roundtrip_matches_live(tmp_path, tiny_fcos):
    fn, params, batch_stats = tiny_fcos
    save_bundle(
        str(tmp_path / "bundle"), fn, params, batch_stats,
        canvas=64, buckets=(2,),
    )
    predictor = load_bundle(str(tmp_path / "bundle"))
    rng = np.random.default_rng(1)
    images = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    got = predictor.predict(images)
    want = fn(params, batch_stats, images)
    for k in ("boxes", "scores", "classes", "valid", "num_valid"):
        np.testing.assert_allclose(
            got[k].astype(np.float32),
            np.asarray(want[k]).astype(np.float32),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_predictor_bucket_plan_and_padding(tiny_fcos):
    fn, params, batch_stats = tiny_fcos
    predictor = Predictor.for_model(
        fn, params, batch_stats, canvas=64, buckets=(1, 2, 4)
    )
    assert predictor._plan(7) == [4, 2, 1]
    assert predictor._plan(3) == [2, 1]
    # tail needs padding: 5 with buckets (2, 4) -> [4, 2(pad 1)]
    p2 = Predictor.for_model(fn, params, batch_stats, canvas=64,
                             buckets=(2, 4))
    assert p2._plan(5) == [4, 2]

    rng = np.random.default_rng(2)
    images = rng.uniform(-1, 1, (5, 64, 64, 3)).astype(np.float32)
    got = p2.predict(images)
    want = fn(params, batch_stats, images)
    assert got["boxes"].shape[0] == 5
    np.testing.assert_allclose(
        got["scores"], np.asarray(want["scores"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        got["num_valid"], np.asarray(want["num_valid"])
    )


def test_predictor_warmup(tiny_fcos):
    fn, params, batch_stats = tiny_fcos
    predictor = Predictor.for_model(
        fn, params, batch_stats, canvas=64, buckets=(1,)
    )
    predictor.warmup()  # compiles without error


def test_preprocess_images_geometry():
    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 255, (48, 96, 3), np.uint8),
        rng.integers(0, 255, (128, 64, 3), np.uint8),
    ]
    batch, content_hw = preprocess_images(
        imgs, canvas=64, resize_mode="resize_pad", pad_position="topleft",
        normalize="tf",
    )
    assert batch.shape == (2, 64, 64, 3)
    assert batch.dtype == np.float32
    # aspect preserved: 48x96 -> content 32x64, 128x64 -> 64x32
    assert content_hw[0] == (32, 64)
    assert content_hw[1] == (64, 32)
    # tf normalization range
    assert batch.min() >= -1.0 - 1e-6 and batch.max() <= 1.0 + 1e-6


def test_export_cli_end_to_end(tmp_path):
    """Train 4 steps, export a bundle, reload it, and check the CLI's
    self-verification reports (near-)zero divergence."""
    from detectax.cli import export_model, train_fcos

    train_fcos.main([
        "--backbone", "tiny", "--canvas", "64", "--batch_size", "8",
        "--max_steps", "4", "--display_step", "2", "--step_save", "4",
        "--synthetic_n", "16", "--max_boxes", "8",
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--out_dir", str(tmp_path / "out"),
    ])
    res = export_model.main([
        "--family", "fcos", "--backbone", "tiny",
        "--num_classes", "3", "--canvas", "64",
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--out_dir", str(tmp_path / "bundle"),
        "--buckets", "1", "--top_k", "64", "--max_outputs", "16",
    ])
    assert res["verify_max_abs_diff"] < 1e-4
    assert (tmp_path / "bundle" / "manifest.json").exists()
    assert (tmp_path / "bundle" / "weights.msgpack").exists()
    assert (tmp_path / "bundle" / "serving_b1.stablehlo").exists()


def test_multi_platform_export_lowers_and_runs(tmp_path, tiny_fcos_model):
    """A ('tpu', 'cpu') artifact must lower and its CPU half must execute —
    requires the Pallas-free serving graph (r3 ADVICE medium; see
    infer.export.export_detector docstring)."""
    model, decode, params, batch_stats = tiny_fcos_model
    fn = make_serving_fn(model, decode, top_k=64, max_outputs=16,
                         fused=False, pallas=False)
    save_bundle(
        str(tmp_path / "mp_bundle"), fn, params, batch_stats,
        canvas=64, buckets=(1,), platforms=("tpu", "cpu"),
    )
    predictor = load_bundle(str(tmp_path / "mp_bundle"))
    rng = np.random.default_rng(4)
    images = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    got = predictor.predict(images)
    want = fn(params, batch_stats, images)
    np.testing.assert_allclose(
        got["scores"], np.asarray(want["scores"]), rtol=1e-5, atol=1e-5
    )


def test_tpu_cross_export_from_cpu_host(tiny_fcos):
    """Exporting a TPU-only artifact from this CPU backend must lower the
    *Pallas* NMS branch (lax.platform_dependent resolves per lowering
    platform, not per tracing backend) — previously impossible with the
    trace-time on_tpu() pick."""
    import jax

    from detectax.infer.export import export_detector

    fn, params, batch_stats = tiny_fcos
    ex = export_detector(
        fn, params, batch_stats, batch=1, canvas=64, platforms=("tpu",)
    )
    assert ex.platforms == ("tpu",)
    assert "tpu_custom_call" in ex.mlir_module()


def test_predictor_empty_and_wrong_shape(tiny_fcos):
    fn, params, batch_stats = tiny_fcos
    predictor = Predictor.for_model(
        fn, params, batch_stats, canvas=64, buckets=(1,)
    )
    out = predictor.predict(np.zeros((0, 64, 64, 3), np.float32))
    assert set(out) >= {"boxes", "scores", "num_valid"}
    assert all(v.shape[0] == 0 for v in out.values())
    with pytest.raises(ValueError, match="canvas"):
        predictor.predict(np.zeros((1, 32, 32, 3), np.float32))


class TestCompareDetections:
    """Detection-aware export gate (r4 VERDICT #1: elementwise comparison
    reported max|Δ|=352.1 on a trained checkpoint because near-tied
    top-k/NMS selections flip under eager-vs-compiled float noise)."""

    @staticmethod
    def _dets(rows, k=8):
        """rows: per-image list of (box4, score, cls)."""
        from detectax.infer.export import compare_detections  # noqa: F401

        b = len(rows)
        boxes = np.zeros((b, k, 4), np.float32)
        scores = np.zeros((b, k), np.float32)
        classes = np.zeros((b, k), np.int32)
        nv = np.zeros((b,), np.int32)
        for i, dets in enumerate(rows):
            dets = sorted(dets, key=lambda d: -d[1])
            for j, (bx, sc, cl) in enumerate(dets):
                boxes[i, j] = bx
                scores[i, j] = sc
                classes[i, j] = cl
            nv[i] = len(dets)
        return {"boxes": boxes, "scores": scores, "classes": classes,
                "num_valid": nv}

    def test_identical_sets_match(self):
        from detectax.infer.export import compare_detections

        d = self._dets([[([0, 0, 10, 10], 0.9, 1), ([20, 20, 40, 40], 0.5, 2)]])
        r = compare_detections(d, d)
        assert r["ok"] and r["matched"] == 2 and r["real_mismatches"] == 0

    def test_rank_swap_of_near_tie_matches(self):
        from detectax.infer.export import compare_detections

        a = ([0, 0, 10, 10], 0.70000, 1)
        b = ([50, 50, 60, 60], 0.70002, 1)
        want = self._dets([[a, b]])
        got = self._dets([[(a[0], 0.70002, 1), (b[0], 0.70000, 1)]])
        # ranks swapped -> elementwise box diff = 50; sets identical to tol
        r = compare_detections(want, got, score_tol=1e-3)
        assert r["ok"] and r["matched"] == 2

    def test_boundary_tie_drop_is_excused(self):
        from detectax.infer.export import compare_detections

        keep = ([0, 0, 10, 10], 0.9, 1)
        tie = ([50, 50, 60, 60], 0.1000, 2)
        want = self._dets([[keep, tie]])
        got = self._dets([[keep, ([80, 80, 90, 90], 0.1001, 3)]])
        # both leftover dets sit at the 0.1 score threshold: the cutoff
        # flip is excused only because score_thresh says so
        r = compare_detections(want, got, boundary_gap=2e-3,
                               score_thresh=0.1)
        assert r["ok"] and r["matched"] == 1 and r["boundary_unmatched"] == 2
        # without the threshold context the same drop is a real mismatch
        r2 = compare_detections(want, got, boundary_gap=2e-3)
        assert not r2["ok"]

    def test_nms_rank_flip_is_excused(self):
        from detectax.infer.export import compare_detections

        # two overlapping same-class near-ties: live kept A, replay kept B
        a = ([0, 0, 10, 10], 0.70000, 1)
        b = ([2, 2, 12, 12], 0.70001, 1)
        keep = ([50, 50, 60, 60], 0.9, 2)
        want = self._dets([[keep, a]])
        got = self._dets([[keep, b]])
        r = compare_detections(want, got, boundary_gap=2e-3)
        assert r["ok"] and r["matched"] == 1 and r["boundary_unmatched"] == 2

    def test_missing_high_score_det_fails(self):
        from detectax.infer.export import compare_detections

        big = ([0, 0, 10, 10], 0.9, 1)
        small = ([50, 50, 60, 60], 0.2, 2)
        want = self._dets([[big, small]])
        got = self._dets([[small]])
        r = compare_detections(want, got)
        assert not r["ok"] and r["real_mismatches"] >= 1

    def test_score_drift_beyond_tol_fails(self):
        from detectax.infer.export import compare_detections

        want = self._dets([[([0, 0, 10, 10], 0.9, 1)]])
        got = self._dets([[([0, 0, 10, 10], 0.8, 1)]])
        r = compare_detections(want, got, score_tol=1e-3)
        assert not r["ok"] and r["real_mismatches"] >= 1

    def test_class_flip_fails(self):
        from detectax.infer.export import compare_detections

        want = self._dets([[([0, 0, 10, 10], 0.9, 1)]])
        got = self._dets([[([0, 0, 10, 10], 0.9, 3)]])
        r = compare_detections(want, got)
        assert not r["ok"] and r["real_mismatches"] >= 1

    def test_box_shift_beyond_iou_fails(self):
        from detectax.infer.export import compare_detections

        want = self._dets([[([0, 0, 10, 10], 0.9, 1)]])
        got = self._dets([[([8, 8, 18, 18], 0.9, 1)]])
        r = compare_detections(want, got, iou_min=0.95)
        assert not r["ok"] and r["real_mismatches"] >= 1
