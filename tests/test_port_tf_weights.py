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


def test_ported_torch_resnext50_features_match():
    """port_torch_resnext round-trip: a torchvision-layout ResNeXt-50
    32x4d (built inline with torch.nn so its state-dict keys match
    torchvision's) produces the same C3/C4/C5 features as
    ResNet(torch_compat=True) loaded with the ported weights."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from detectax.tools.port_tf_weights import port_torch_resnext

    class Bottleneck(tnn.Module):
        def __init__(self, inplanes, planes, stride=1, project=False):
            super().__init__()
            width = planes * 2  # 32x4d: width = planes * (4/64) * 32
            self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride, padding=1,
                                    groups=32, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = None
            if project:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            idt = self.downsample(x) if self.downsample is not None else x
            h = self.relu(self.bn1(self.conv1(x)))
            h = self.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
            return self.relu(h + idt)

    class TorchResNeXt50(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, padding=1)
            sizes = (3, 4, 6, 3)
            inplanes = 64
            for li, (planes, n) in enumerate(zip((64, 128, 256, 512), sizes)):
                blocks = []
                for b in range(n):
                    stride = 2 if (b == 0 and li > 0) else 1
                    blocks.append(Bottleneck(
                        inplanes, planes, stride, project=(b == 0)))
                    inplanes = planes * 4
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

        def forward(self, x):
            h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            h = self.layer1(h)
            c3 = self.layer2(h)
            c4 = self.layer3(c3)
            c5 = self.layer4(c4)
            return c3, c4, c5

    torch.manual_seed(0)
    tmodel = TorchResNeXt50()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    tmodel.eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_c3, t_c4, t_c5 = [
            t.numpy().transpose(0, 2, 3, 1)
            for t in tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ]

    variables = port_torch_resnext(tmodel.state_dict(), "resnext50")
    model = ResNet(
        stage_sizes=(3, 4, 6, 3), groups=32, width_factor=2, expansion=2,
        torch_compat=True,
    )
    out = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out["c3"]), t_c3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["c4"]), t_c4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["c5"]), t_c5, atol=2e-3)


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
