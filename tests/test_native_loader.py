"""Native (C++/libjpeg) loader tests — skipped when the toolchain can't
build the library."""
import numpy as np
import pytest
from PIL import Image

nl = pytest.importorskip("detectax.data.native_loader")

if not nl.available():
    pytest.skip("native loader unavailable", allow_module_level=True)

from detectax.data.index import IndexDataset  # noqa: E402
from detectax.data.pipeline import Loader  # noqa: E402


@pytest.fixture(scope="module")
def jpg(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    p = d / "a.jpg"
    Image.fromarray(img).save(p, quality=95)
    return str(p)


def test_image_info(jpg):
    assert nl.image_info(jpg) == (120, 160)


def test_decode_resize_matches_cv2_bilinear(jpg):
    cv2 = pytest.importorskip("cv2")
    with Image.open(jpg) as im:
        decoded = np.asarray(im.convert("RGB"), np.float32)
    out = nl.decode_resize(jpg, 64, 96)
    want = cv2.resize(decoded, (96, 64), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out, want, atol=5e-3)


def test_batch_decode(jpg):
    outs = nl.decode_resize_batch([jpg] * 6, [(32, 32)] * 6, num_threads=3)
    assert len(outs) == 6
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])


def test_loader_native_path_close_to_pil(jpg, tmp_path):
    ds = [
        {
            "image_path": jpg,
            "boxes_xyxy": [[0.1, 0.1, 0.5, 0.6]],
            "labels": [0],
        }
    ] * 4
    common = dict(batch_size=2, canvas=64, max_boxes=4, steps=1,
                  flip=False, shuffle=False, prefetch=0)
    b_native = next(iter(Loader(ds, native=True, **common)))
    b_pil = next(iter(Loader(ds, native=False, **common)))
    np.testing.assert_array_equal(b_native["boxes"], b_pil["boxes"])
    # decoders agree up to resample-filter differences (PIL antialiases)
    diff = np.abs(b_native["images"] - b_pil["images"]).mean()
    assert diff < 0.2, diff
