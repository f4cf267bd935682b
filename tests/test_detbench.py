"""DetBench standardized benchmark dataset tests."""
import numpy as np

from detectax.data.detbench import CLASS_NAMES, DetBenchDataset, load_spec


def test_spec_is_committed_and_loads():
    spec = load_spec()
    assert spec["version"] == "detbench_v1"
    assert spec["n_eval"] == 256


def test_deterministic_and_split_disjoint():
    ds = DetBenchDataset("eval", n=4)
    a = ds[2]
    b = DetBenchDataset("eval", n=4)[2]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["boxes_xyxy"], b["boxes_xyxy"])
    tr = DetBenchDataset("train", n=4)[2]
    assert not np.array_equal(a["image"], tr["image"])


def test_sample_properties():
    ds = DetBenchDataset("train", n=8)
    seen = set()
    for i in range(8):
        r = ds[i]
        img, boxes, labels = r["image"], r["boxes_xyxy"], r["labels"]
        assert img.shape == (512, 512, 3) and img.dtype == np.uint8
        assert 2 <= len(boxes) <= 10
        assert (boxes[:, 2] > boxes[:, 0]).all()
        assert (boxes[:, 3] > boxes[:, 1]).all()
        assert (boxes >= 0).all() and (boxes <= 1).all()
        seen.update(labels.tolist())
    assert len(seen) >= 5  # class variety across a few images
    assert max(seen) < len(CLASS_NAMES)


def test_memmap_cache_matches_generator(tmp_path, monkeypatch):
    monkeypatch.setenv("DETECTAX_DETBENCH_CACHE", str(tmp_path))
    cached = DetBenchDataset("eval", n=6)  # materializes under tmp_path
    raw = DetBenchDataset("eval", n=6, cache=False)
    for i in (0, 3, 5):
        a, b = cached[i], raw[i]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_allclose(a["boxes_xyxy"], b["boxes_xyxy"])
        np.testing.assert_array_equal(a["labels"], b["labels"])
    # second instantiation reuses the cache files
    again = DetBenchDataset("eval", n=6)
    np.testing.assert_array_equal(again[3]["image"], raw[3]["image"])


def test_v2_spec_loads_and_generates():
    spec = load_spec(name="detbench_v2")
    assert spec["version"] == "detbench_v2"
    ds = DetBenchDataset("train", spec=spec, n=6, cache=False)
    sizes = []
    for i in range(6):
        r = ds[i]
        assert r["image"].shape == (512, 512, 3)
        assert 1 <= len(r["boxes_xyxy"]) <= 24
        wh = r["boxes_xyxy"][:, 2:] - r["boxes_xyxy"][:, :2]
        sizes.extend(np.sqrt(wh[:, 0] * wh[:, 1]).tolist())
    # log-uniform small-object emphasis: median well below the v1 ~0.22
    assert np.median(sizes) < 0.15
    assert min(sizes) >= 0.015


def test_v2_crowd_spec_generates_dense():
    spec = load_spec(name="detbench_v2_crowd")
    assert spec["max_objects"] == 128
    ds = DetBenchDataset("eval", spec=spec, n=2, cache=False)
    r = ds[0]
    assert r["image"].shape == (640, 640, 3)
    assert len(r["boxes_xyxy"]) >= 30  # dense (placement may drop a few)
    assert (r["labels"] < len(CLASS_NAMES)).all()


def test_v1_sequence_unchanged_by_v2_params():
    """The size-sampler refactor must not move v1's RNG stream: the
    default (uniform) path draws exactly as before."""
    from detectax.data.detbench import make_sample

    rng = np.random.default_rng((977717, 2))
    img, boxes, labels = make_sample(rng, 512)
    ref = DetBenchDataset("eval", n=4, cache=False)[2]
    np.testing.assert_array_equal(img, ref["image"])
    np.testing.assert_allclose(boxes, ref["boxes_xyxy"])


def test_loader_integration():
    from detectax.data.pipeline import Loader

    ds = DetBenchDataset("train", n=8)
    loader = Loader(ds, batch_size=4, canvas=128, max_boxes=16,
                    prefetch=0, shuffle=False)
    batch = next(iter(loader))
    assert batch["images"].shape == (4, 128, 128, 3)
    assert batch["valid"].any(axis=1).all()  # every image has GT
