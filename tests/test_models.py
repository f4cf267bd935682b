import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectax.models import (
    FCOS,
    CenterNetFPNSingle,
    CenterNetS8,
    HourglassNet,
    RetinaNet,
    StackedHourglass,
)
from detectax.models.backbones import build_backbone

NC = 6
KEY = jax.random.PRNGKey(0)


def _init_apply(model, x, train=False):
    variables = model.init(KEY, x, train=True)
    out = model.apply(
        variables, x, train=train,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return variables, out


def test_resnet50_tap_shapes():
    bb = build_backbone("resnet50")
    x = jnp.zeros((1, 128, 128, 3))
    vars_, taps = _init_apply(bb, x)
    assert taps["c3"].shape == (1, 16, 16, 512)
    assert taps["c4"].shape == (1, 8, 8, 1024)
    assert taps["c5"].shape == (1, 4, 4, 2048)


def test_mobilenetv2_tap_shapes():
    bb = build_backbone("mobilenetv2")
    x = jnp.zeros((1, 128, 128, 3))
    _, taps = _init_apply(bb, x)
    assert taps["c3"].shape[1:3] == (16, 16)
    assert taps["c4"].shape[1:3] == (8, 8)
    assert taps["c5"].shape == (1, 4, 4, 1280)


def test_resnext_grouped_conv_builds():
    bb = build_backbone("resnext50")
    x = jnp.zeros((1, 64, 64, 3))
    _, taps = _init_apply(bb, x)
    # true ResNeXt 32x4d channel plan: C3/C4/C5 = 512/1024/2048
    assert taps["c3"].shape[-1] == 512
    assert taps["c5"].shape[-1] == 2048


def test_backbone_compat_suffix():
    """':keras'/':torch' suffixes build port-compatible trunk geometry."""
    keras_bb = build_backbone("resnet50:keras")
    assert keras_bb.keras_compat and not keras_bb.torch_compat
    torch_bb = build_backbone("resnext50:torch")
    assert torch_bb.torch_compat and torch_bb.expansion == 2
    # mobilenetv2 is already Keras-geometry: suffix is a documented no-op
    assert build_backbone("mobilenetv2:keras").__class__.__name__ == (
        "MobileNetV2"
    )
    with pytest.raises(ValueError):
        build_backbone("tiny:torch")
    with pytest.raises(ValueError):
        build_backbone("resnet50:caffe")


@pytest.mark.parametrize("variant,reg_ch", [
    ("fcos", 5), ("center", 5), ("center_v1", 5),
])
def test_fcos_variants_output_layout(variant, reg_ch):
    model = FCOS(num_classes=NC, variant=variant, backbone="mobilenetv2")
    x = jnp.zeros((2, 128, 128, 3))
    _, outs = _init_apply(model, x)
    assert len(outs) == 5
    for lvl, stride in zip(outs, (8, 16, 32, 64, 128)):
        assert lvl.shape == (2, 128 // stride, 128 // stride, reg_ch + NC)
        assert lvl.dtype == jnp.float32
    if variant == "center_v1":
        # sigmoid-activated reg in [0, 1]
        assert float(outs[0][..., :4].min()) >= 0.0
        assert float(outs[0][..., :4].max()) <= 1.0


def test_fcos_focal_bias_init():
    model = FCOS(num_classes=NC, backbone="mobilenetv2")
    x = jnp.zeros((1, 128, 128, 3))
    _, outs = _init_apply(model, x)
    # with zero-init head weights the cls logits equal the focal bias
    p = jax.nn.sigmoid(np.asarray(outs[0][..., 5:]))
    np.testing.assert_allclose(p, 0.01, atol=2e-2)


def test_centernet_s8_output_shape():
    model = CenterNetS8(num_classes=NC, n_scales=5, backbone="mobilenetv2")
    x = jnp.zeros((1, 128, 128, 3))
    _, out = _init_apply(model, x)
    assert out.shape == (1, 16, 16, 5, 4 + NC)
    reg = np.asarray(out[..., :4])
    assert reg.min() >= 0.0 and reg.max() <= 1.0  # sigmoid reg


def test_centernet_fpn_single_output_shape():
    model = CenterNetFPNSingle(num_classes=NC, backbone="mobilenetv2")
    x = jnp.zeros((1, 128, 128, 3))
    _, out = _init_apply(model, x)
    assert out.shape == (1, 16, 16, 5 + NC + 1)


def test_hourglass_output_shape():
    model = HourglassNet(num_classes=NC, n_filters=4, n_repeats=1)
    x = jnp.zeros((1, 128, 128, 3))
    _, out = _init_apply(model, x)
    assert out.shape == (1, 16, 16, 4, 5 + NC)
    reg = np.asarray(out[..., :4])
    assert reg.min() >= 0.0 and reg.max() <= 1.0


def test_stacked_hourglass_output_shape():
    model = StackedHourglass(num_classes=NC, n_filters=8, n_stacks=2, n_repeats=1)
    x = jnp.zeros((1, 128, 128, 3))
    _, out = _init_apply(model, x)
    # output stride 4 (see module docstring on the reference's latent bug)
    assert out.shape == (1, 32, 32, 4 + NC)


def test_retinanet_output_shapes_shared_head():
    model = RetinaNet(num_classes=NC, backbone="mobilenetv2")
    x = jnp.zeros((1, 128, 128, 3))
    _, outs = _init_apply(model, x)
    assert len(outs) == 5
    for lvl, stride in zip(outs, (8, 16, 32, 64, 128)):
        assert lvl.shape == (1, 128 // stride, 128 // stride, 9, 4 + NC)


def test_retinanet_per_anchor_heads_match_shapes():
    model = RetinaNet(
        num_classes=NC, backbone="mobilenetv2", per_anchor_heads=True
    )
    x = jnp.zeros((1, 128, 128, 3))
    variables, outs = _init_apply(model, x)
    assert outs[0].shape == (1, 16, 16, 9, 4 + NC)
    # per-anchor parameterization has 9x as many head convs
    heads = [k for k in variables["params"] if k.startswith("cls_head_")]
    assert len(heads) == 45


def test_train_mode_updates_batch_stats():
    model = FCOS(num_classes=NC, backbone="mobilenetv2")
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    variables = model.init(KEY, x, train=True)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_bf16_compute_dtype():
    model = FCOS(num_classes=NC, backbone="mobilenetv2", dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    _, outs = _init_apply(model, x)
    # outputs are cast back to fp32 for the loss
    assert outs[0].dtype == jnp.float32


def test_s2d_stem_exact_equivalence():
    """The space-to-depth stem is the same function with the same params.

    Covers both stem conventions: the default XLA-"SAME" stem (pad_low 2)
    and the Keras/torch explicit-(3,3) stem (pad_low 3, conv bias on for
    keras_compat). fp32 tolerances are reassociation-level only.
    """
    import numpy as np

    from detectax.models.backbones import ResNet

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32
    )
    for compat in ({}, {"keras_compat": True}):
        base = ResNet(stage_sizes=(1, 1, 1, 1), s2d_stem=False, **compat)
        s2d = ResNet(stage_sizes=(1, 1, 1, 1), s2d_stem=True, **compat)
        variables = base.init(KEY, x, train=True)
        # identical param trees (same names, shapes) by construction
        v2 = s2d.init(KEY, x, train=True)
        assert jax.tree_util.tree_structure(
            variables
        ) == jax.tree_util.tree_structure(v2)
        out_base = base.apply(variables, x, train=False)
        out_s2d = s2d.apply(variables, x, train=False)
        for k in out_base:
            np.testing.assert_allclose(
                out_s2d[k], out_base[k], rtol=2e-5, atol=2e-5,
                err_msg=f"{compat} tap {k}",
            )
