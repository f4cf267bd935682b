"""detectax — a TPU-native object-detection framework.

Built on JAX / XLA / Flax / Pallas / pjit with the end-to-end capabilities of
the TF2/Keras reference WD-Leong/CV-Lite-Object-Detection (see SURVEY.md):
three detector families (FCOS ×3 assignment variants, CenterNet ×3 backbones,
RetinaNet), shared box/loss/assignment/NMS op libraries, VOC/COCO/CrowdHuman
dataset conversion, host input pipeline, data-parallel pjit training with
checkpoint/resume, and CSV + heatmap observability.
"""

__version__ = "0.1.0"
