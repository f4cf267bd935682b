"""Periodic visual-eval hooks for the training driver.

Formalizes the reference's mid-training drawing (`show_heatmap` in
`FCOS/train_fcos.py:13-84`, `obj_detect_results` calls in
`train_centernet_crowdhuman.py:148-196`): on display steps, run the jitted
eval forward on the last batch's first image, dump a max-class-probability
heatmap and a detection overlay jpg.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from detectax.infer import predict as P
from detectax.infer.visualize import save_heatmap, visualize_detections


def fcos_eval_hook(num_classes: int, id_to_label=None, use_centerness=True):
    def hook(step, state, forward, batch, out_dir):
        img = jnp.asarray(batch["images"][:1])
        outs = forward(state.params, state.batch_stats, img)
        boxes, probs = P.fcos_decode(outs, use_centerness=use_centerness)
        dets = P.detections_from_dense(
            boxes, probs, iou_thresh=0.5, score_thresh=0.3, max_outputs=50
        )
        n = int(dets["num_valid"][0])
        visualize_detections(
            np.asarray(img[0]),
            np.asarray(dets["boxes"][0][:n]),
            np.asarray(dets["classes"][0][:n]),
            np.asarray(dets["scores"][0][:n]),
            id_to_label,
            out_file=os.path.join(out_dir, f"detect_{step}.jpg"),
        )
        # P3 max-class heatmap
        p3 = outs[0][0]
        hm = np.asarray(
            jnp.max(1.0 / (1.0 + jnp.exp(-p3[..., 5:])), axis=-1)
        )
        save_heatmap(
            hm, out_file=os.path.join(out_dir, f"heatmap_{step}.jpg"),
            image=np.asarray(img[0]), title=f"step {step} P3 max prob",
        )

    return hook


def centernet_s8_eval_hook(box_scales, id_to_label=None):
    def hook(step, state, forward, batch, out_dir):
        img = jnp.asarray(batch["images"][:1])
        out = forward(state.params, state.batch_stats, img)
        boxes, probs = P.centernet_s8_decode(out, box_scales=box_scales)
        dets = P.detections_from_dense(
            boxes, probs, iou_thresh=0.213, score_thresh=0.3, max_outputs=100,
            class_aware=True,
        )
        n = int(dets["num_valid"][0])
        visualize_detections(
            np.asarray(img[0]),
            np.asarray(dets["boxes"][0][:n]),
            np.asarray(dets["classes"][0][:n]),
            np.asarray(dets["scores"][0][:n]),
            id_to_label,
            out_file=os.path.join(out_dir, f"detect_{step}.jpg"),
        )

    return hook


def retinanet_eval_hook(anchors_per_level, id_to_label=None):
    def hook(step, state, forward, batch, out_dir):
        img = jnp.asarray(batch["images"][:1])
        outs = forward(state.params, state.batch_stats, img)
        boxes, probs = P.retinanet_decode(
            outs, anchors_per_level=anchors_per_level
        )
        dets = P.detections_from_dense(
            boxes, probs, iou_thresh=0.5, score_thresh=0.3, max_outputs=100,
            class_aware=False,
        )
        n = int(dets["num_valid"][0])
        visualize_detections(
            np.asarray(img[0]),
            np.asarray(dets["boxes"][0][:n]),
            np.asarray(dets["classes"][0][:n]),
            np.asarray(dets["scores"][0][:n]),
            id_to_label,
            out_file=os.path.join(out_dir, f"detect_{step}.jpg"),
        )

    return hook
