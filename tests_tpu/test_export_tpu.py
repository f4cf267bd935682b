"""Serving-bundle round-trip on real TPU hardware.

The TPU trace of the serving graph auto-selects the Pallas paths
(`detections_from_dense(fused=None)` -> `dense_nms_pallas` on TPU), so a
TPU-platform `jax.export` artifact embeds `tpu_custom_call`s with
serialized Mosaic kernels. This is the gate that those artifacts
(a) export at all, (b) replay through `jax.export.deserialize`, and
(c) reproduce the live model's detections — before any serving host
relies on it.
"""
import numpy as np


def test_tpu_bundle_roundtrip(tmp_path):
    import jax

    from detectax.cli.evaluate import build_family
    from detectax.infer.export import load_bundle, make_serving_fn, save_bundle

    class A:
        center = False
        box_scales = [8.0, 16.0, 32.0, 48.0, 64.0]
        anchor_sizes = [8.0, 16.0, 24.0, 32.0, 48.0]
        n_filters = 4
        n_stacks = 1

    model, decode = build_family("fcos", 5, "tiny", 128, A())
    variables = model.init(
        jax.random.key(0), np.zeros((1, 128, 128, 3), np.float32),
        train=False,
    )
    fn = make_serving_fn(model, decode, top_k=256, max_outputs=32)
    params, batch_stats = variables["params"], variables["batch_stats"]

    save_bundle(
        str(tmp_path / "bundle"), fn, params, batch_stats,
        canvas=128, buckets=(2,),
    )
    predictor = load_bundle(str(tmp_path / "bundle"))

    rng = np.random.default_rng(7)
    images = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    got = predictor.predict(images)
    want = jax.tree.map(np.asarray, fn(params, batch_stats, images))
    for k in ("boxes", "scores", "classes", "valid", "num_valid"):
        np.testing.assert_allclose(
            got[k].astype(np.float32), want[k].astype(np.float32),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )
