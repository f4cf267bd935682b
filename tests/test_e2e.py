"""End-to-end CLI smoke tests on the 8-device CPU mesh (tiny configs).

Mirrors the reference's subsample overfit sanity runs (SURVEY.md §4.3) as
real tests: each trainer CLI runs a few steps on the synthetic dataset,
prints finite losses, writes CSV/checkpoint artifacts, and can resume.
"""
import json
import os

import numpy as np
import pytest

from detectax.cli import (
    train_centernet_crowdhuman,
    train_fcos,
    train_fcos_center_v1_voc,
    train_fcos_center_voc,
    train_hourglass_voc,
    train_retinanet_coco,
)


def _common_args(tmp_path, extra=()):
    return [
        "--backbone", "tiny",
        "--canvas", "64",
        "--batch_size", "8",
        "--max_steps", "4",
        "--display_step", "2",
        "--step_save", "4",
        "--synthetic_n", "16",
        "--max_boxes", "8",
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--out_dir", str(tmp_path / "out"),
        *extra,
    ]


def _check_artifacts(tmp_path, summary):
    assert summary["final_step"] == 4
    assert np.isfinite(summary["total"])
    assert os.path.exists(tmp_path / "out" / "losses.csv")
    assert os.path.exists(tmp_path / "out" / "metrics.jsonl")
    with open(tmp_path / "out" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f]
    assert rows[-1]["step"] == 4
    assert any(os.scandir(tmp_path / "ckpt"))


def test_train_fcos_cli_smoke_and_resume(tmp_path):
    summary = train_fcos.main(_common_args(tmp_path))
    _check_artifacts(tmp_path, summary)
    # resume continues from step 4
    summary2 = train_fcos.main(
        _common_args(tmp_path) + ["--resume", "--max_steps", "6"]
    )
    assert summary2["final_step"] == 6


def test_train_fcos_center_cli_smoke(tmp_path):
    summary = train_fcos_center_voc.main(_common_args(tmp_path))
    _check_artifacts(tmp_path, summary)


def test_train_fcos_center_v1_cli_smoke(tmp_path):
    summary = train_fcos_center_v1_voc.main(_common_args(tmp_path))
    _check_artifacts(tmp_path, summary)


def test_train_centernet_crowdhuman_cli_smoke(tmp_path):
    summary = train_centernet_crowdhuman.main(
        _common_args(tmp_path)
        + ["--box_scales", "16", "32", "48", "64"]
    )
    _check_artifacts(tmp_path, summary)


def test_train_retinanet_cli_smoke(tmp_path):
    summary = train_retinanet_coco.main(
        _common_args(tmp_path) + ["--anchor_sizes", "8", "16", "24", "32", "48"]
    )
    _check_artifacts(tmp_path, summary)


@pytest.mark.slow
def test_train_hourglass_cli_smoke(tmp_path):
    summary = train_hourglass_voc.main(
        _common_args(tmp_path) + ["--n_filters", "2", "--microbatch", "4"]
    )
    _check_artifacts(tmp_path, summary)


def test_train_stacked_hourglass_cli_smoke_and_eval(tmp_path):
    """--variant stacked: trains models.StackedHourglass (the reference's
    orphaned tf_centernet_hourglass.py given a training surface) and
    evaluates it through the stacked_hourglass family — proves the true
    stride-4 alignment end to end."""
    from detectax.cli import evaluate

    summary = train_hourglass_voc.main(
        _common_args(tmp_path)
        + ["--variant", "stacked", "--n_filters", "4", "--n_stacks", "1"]
    )
    _check_artifacts(tmp_path, summary)
    ev = evaluate.main([
        "--family", "stacked_hourglass",
        "--n_filters", "4",
        "--n_stacks", "1",
        "--canvas", "64",
        "--batch_size", "8",
        "--synthetic_n", "16",
        "--max_boxes", "8",
        "--ckpt_dir", str(tmp_path / "ckpt"),
    ])
    assert "mAP@0.5" in ev
    assert ev["num_images"] == 16


def test_evaluate_cli_after_training(tmp_path):
    from detectax.cli import evaluate

    train_fcos.main(_common_args(tmp_path))
    summary = evaluate.main([
        "--family", "fcos",
        "--backbone", "tiny",
        "--canvas", "64",
        "--batch_size", "8",
        "--synthetic_n", "16",
        "--max_boxes", "8",
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--cls_thresh", "0.05",
    ])
    assert "mAP@0.5" in summary
    assert 0.0 <= summary["mAP@0.5"] <= 1.0
    assert summary["num_images"] == 16
    # --top_k plumbs into detections_from_dense's two-stage candidate
    # pool (the dense-crowd eval path uses 2048); a tiny pool must still
    # produce a valid summary on the CPU two-stage path.
    small_pool = evaluate.main([
        "--family", "fcos",
        "--backbone", "tiny",
        "--canvas", "64",
        "--batch_size", "8",
        "--synthetic_n", "16",
        "--max_boxes", "8",
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--cls_thresh", "0.05",
        "--top_k", "16",
    ])
    assert 0.0 <= small_pool["mAP@0.5"] <= 1.0


@pytest.mark.slow
def test_train_hourglass_multiscale_buckets(tmp_path):
    summary = train_hourglass_voc.main(
        _common_args(tmp_path)
        + ["--n_filters", "2", "--multi_scale", "64", "128"]
    )
    assert summary["final_step"] == 4
    assert np.isfinite(summary["total"])


def test_train_centernet_heatmap_cli_smoke(tmp_path):
    from detectax.cli import train_centernet_heatmap

    summary = train_centernet_heatmap.main(_common_args(tmp_path))
    _check_artifacts(tmp_path, summary)


def test_evaluate_cli_centernet_heatmap(tmp_path):
    from detectax.cli import evaluate, train_centernet_heatmap

    train_centernet_heatmap.main(_common_args(tmp_path))
    summary = evaluate.main([
        "--family", "centernet_heatmap",
        "--backbone", "tiny",
        "--canvas", "64",
        "--batch_size", "8",
        "--synthetic_n", "16",
        "--max_boxes", "8",
        "--ckpt_dir", str(tmp_path / "ckpt"),
    ])
    assert "mAP@0.5" in summary
    assert summary["num_images"] == 16


def test_evaluate_cli_hourglass(tmp_path):
    from detectax.cli import evaluate

    train_hourglass_voc.main(_common_args(tmp_path) + ["--n_filters", "2"])
    summary = evaluate.main([
        "--family", "hourglass",
        "--n_filters", "2",
        "--canvas", "64",
        "--batch_size", "8",
        "--synthetic_n", "16",
        "--max_boxes", "8",
        "--ckpt_dir", str(tmp_path / "ckpt"),
    ])
    assert "mAP@0.5" in summary
    assert summary["num_images"] == 16


def test_train_crowdhuman_use_scale_smoke(tmp_path):
    from detectax.cli import train_centernet_crowdhuman

    summary = train_centernet_crowdhuman.main(
        _common_args(tmp_path)
        + ["--use_scale", "--min_scale", "0.7", "--base_dims", "56"]
    )
    _check_artifacts(tmp_path, summary)


def test_train_retinanet_skip_zero_target_smoke(tmp_path):
    summary = train_retinanet_coco.main(
        _common_args(tmp_path)
        + ["--anchor_sizes", "8", "16", "24", "32", "48"]
    )
    _check_artifacts(tmp_path, summary)


def test_evaluate_data_parallel_matches_single(tmp_path):
    """--data_parallel eval (8-device CPU mesh) reproduces the
    single-device mAP on the same tiny checkpoint."""
    from detectax.cli import evaluate, train_fcos

    train_fcos.main(_common_args(tmp_path))
    base = [
        "--family", "fcos", "--backbone", "tiny", "--canvas", "64",
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--dataset", "synthetic", "--synthetic_n", "16",
        "--max_boxes", "8", "--batch_size", "8",
        "--top_k", "64", "--max_outputs", "16",
    ]
    single = evaluate.main(base)
    sharded = evaluate.main(base + ["--data_parallel"])
    assert sharded["mAP@0.5"] == pytest.approx(single["mAP@0.5"], abs=1e-6)
    assert sharded["num_images"] == single["num_images"]
