"""Inference CLI e2e: train briefly, restore, run single-image inference."""
import os

import numpy as np
import pytest
from PIL import Image

from detectax.cli import infer_fcos, train_fcos


@pytest.mark.slow
def test_infer_fcos_cli_end_to_end(tmp_path):
    train_fcos.main([
        "--backbone", "tiny", "--canvas", "64", "--batch_size", "8",
        "--max_steps", "4", "--display_step", "2", "--step_save", "4",
        "--synthetic_n", "16", "--max_boxes", "8",
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--out_dir", str(tmp_path / "out"),
    ])
    img_file = tmp_path / "input.jpg"
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    ).save(img_file)

    detect_out = tmp_path / "detection.jpg"
    heatmap_out = tmp_path / "heatmap.jpg"
    infer_fcos.main([
        "--img_file", str(img_file),
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--backbone", "tiny",
        "--num_classes", "3",
        "--img_dims", "64",
        "--cls_thresh", "0.05",
        "--detect_out", str(detect_out),
        "--heatmap_out", str(heatmap_out),
    ])
    assert os.path.getsize(detect_out) > 1000
    assert os.path.getsize(heatmap_out) > 1000
