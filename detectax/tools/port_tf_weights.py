"""One-way TF/Keras -> Flax backbone weight port.

The reference leans on ImageNet-pretrained Keras backbones
(`FCOS/fcos.py:30-41`); this build trains from scratch by default and
treats weight porting as an optional tool for mAP-parity experiments
(SURVEY.md §7.1). Given a Keras ResNet-50/101/152 (e.g.
``tf.keras.applications.ResNet50``), this maps its weights onto
`detectax.models.backbones.ResNet(keras_compat=True)` — which reproduces
Keras's exact conventions (stride on the first 1x1, ZeroPadding stem,
conv biases, BN eps 1.001e-5) so ported features match numerically.

Usage:
    python -m detectax.tools.port_tf_weights \
        --arch resnet50 --weights /path/to/keras.h5 --output backbone.msgpack
Load with `load_ported(path)`.
"""
from __future__ import annotations

import argparse

import numpy as np

STAGE_SIZES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def _conv_bn(keras_model, conv_name, bn_name):
    conv = keras_model.get_layer(conv_name)
    bn = keras_model.get_layer(bn_name)
    kernel, bias = conv.get_weights()
    gamma, beta, mean, var = bn.get_weights()
    params = {
        "Conv_0": {
            "kernel": np.asarray(kernel, np.float32),
            "bias": np.asarray(bias, np.float32),
        },
        "BatchNorm_0": {
            "scale": np.asarray(gamma, np.float32),
            "bias": np.asarray(beta, np.float32),
        },
    }
    stats = {
        "BatchNorm_0": {
            "mean": np.asarray(mean, np.float32),
            "var": np.asarray(var, np.float32),
        }
    }
    return params, stats


def port_resnet(keras_model, arch: str = "resnet50"):
    """Return ``{"params": ..., "batch_stats": ...}`` for
    ``ResNet(stage_sizes=STAGE_SIZES[arch], keras_compat=True)``."""
    stage_sizes = STAGE_SIZES[arch]
    params: dict = {}
    stats: dict = {}

    params["stem"], stats["stem"] = _conv_bn(
        keras_model, "conv1_conv", "conv1_bn"
    )

    for stage_idx, n_blocks in enumerate(stage_sizes):
        ks = stage_idx + 2  # keras conv2..conv5
        for blk in range(n_blocks):
            kb = blk + 1
            name = f"stage{ks}_block{blk}"
            block_p: dict = {}
            block_s: dict = {}
            if blk == 0:
                block_p["proj"], block_s["proj"] = _conv_bn(
                    keras_model,
                    f"conv{ks}_block{kb}_0_conv",
                    f"conv{ks}_block{kb}_0_bn",
                )
            for i in range(3):
                sub = f"ConvBN_{i}"
                block_p[sub], block_s[sub] = _conv_bn(
                    keras_model,
                    f"conv{ks}_block{kb}_{i + 1}_conv",
                    f"conv{ks}_block{kb}_{i + 1}_bn",
                )
            params[name] = block_p
            stats[name] = block_s
    return {"params": params, "batch_stats": stats}


def save_ported(variables: dict, path: str):
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_ported(path: str, template: dict):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", choices=sorted(STAGE_SIZES), default="resnet50")
    p.add_argument("--weights", required=True,
                   help="Keras .h5/.keras weights path, or 'imagenet'")
    p.add_argument("--output", required=True, help="output .msgpack path")
    args = p.parse_args(argv)

    import tensorflow as tf

    ctor = {
        "resnet50": tf.keras.applications.ResNet50,
        "resnet101": tf.keras.applications.ResNet101,
        "resnet152": tf.keras.applications.ResNet152,
    }[args.arch]
    weights = args.weights if args.weights == "imagenet" else None
    model = ctor(include_top=False, weights=weights,
                 input_shape=[None, None, 3])
    if weights is None:
        model.load_weights(args.weights)
    variables = port_resnet(model, args.arch)
    save_ported(variables, args.output)
    print(f"ported {args.arch} -> {args.output}")


if __name__ == "__main__":
    main()
