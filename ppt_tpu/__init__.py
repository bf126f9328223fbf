"""ppt_tpu — a TPU-native JAX/XLA/Pallas framework for parameter-efficient
prompt learning on 3D point clouds.

Re-implements the full capability surface of the PPT reference
(auniquesun/PPT, ICRA 2024: prompt-tuned ULIP for 3D recognition, few-shot,
part segmentation and linear probing) as an idiomatic TPU framework:

- ``ppt_tpu.ops``      — jit-able point-cloud geometry ops (FPS, kNN, ball
  query, grouping, 3-NN interpolation) with static shapes.
- ``ppt_tpu.kernels``  — Pallas TPU kernels for the hot geometry ops, with
  pure-JAX reference implementations used as golden tests.
- ``ppt_tpu.nn``       — flax modules: CLIP text tower, PointBERT ViT,
  PointNet++ SSG/MSG, PointMLP, PointNeXt, partseg heads.
- ``ppt_tpu.prompt``   — CLIP BPE tokenizer + vectorized PromptLearner.
- ``ppt_tpu.models``   — ULIP composite model + factories and freeze
  partitions (trainable/frozen parameter split).
- ``ppt_tpu.data``     — dataset registry, format-faithful loaders, and
  fused on-device augmentation.
- ``ppt_tpu.parallel`` — device-mesh / sharding helpers (pjit over ICI).
- ``ppt_tpu.train``    — generic trainer: masked optimizer over the
  trainable partition, cosine schedules, metrics, checkpointing.
- ``ppt_tpu.tasks``    — cls / fewshot / partseg / linear-probe /
  interpret-prompt entry points.
"""

__version__ = "0.1.0"
