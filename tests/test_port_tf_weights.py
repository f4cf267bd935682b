"""TF->Flax weight-port numerical parity (slow: imports TensorFlow)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from detectax.models.backbones import ResNet  # noqa: E402
from detectax.tools.port_tf_weights import port_resnet  # noqa: E402


def test_ported_resnet50_features_match_keras():
    keras_model = tf.keras.applications.ResNet50(
        include_top=False, weights=None, input_shape=[None, None, 3]
    )
    taps = ["conv3_block4_out", "conv4_block6_out", "conv5_block3_out"]
    extractor = tf.keras.Model(
        inputs=keras_model.input,
        outputs=[keras_model.get_layer(n).output for n in taps],
    )
    rng = np.random.default_rng(0)
    x = rng.normal(scale=1.0, size=(1, 64, 64, 3)).astype(np.float32)
    tf_c3, tf_c4, tf_c5 = [np.asarray(t) for t in extractor(x, training=False)]

    variables = port_resnet(keras_model, "resnet50")
    model = ResNet(stage_sizes=(3, 4, 6, 3), keras_compat=True)
    out = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out["c3"]), tf_c3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["c4"]), tf_c4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["c5"]), tf_c5, atol=2e-3)


def test_ported_mobilenetv2_features_match_keras():
    from detectax.models.backbones import MobileNetV2
    from detectax.tools.port_tf_weights import port_mobilenetv2

    keras_model = tf.keras.applications.MobileNetV2(
        include_top=False, weights=None, input_shape=[None, None, 3]
    )
    # group outputs at strides 8/16/32: 32-ch group ends at block_5_add,
    # 96-ch group at block_12_add, final 1280 conv at out_relu
    taps = ["block_5_add", "block_12_add", "out_relu"]
    extractor = tf.keras.Model(
        inputs=keras_model.input,
        outputs=[keras_model.get_layer(n).output for n in taps],
    )
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    tf_c3, tf_c4, tf_c5 = [np.asarray(t) for t in extractor(x, training=False)]

    variables = port_mobilenetv2(keras_model)
    model = MobileNetV2()
    out = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out["c3"]), tf_c3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["c4"]), tf_c4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["c5"]), tf_c5, atol=2e-3)
