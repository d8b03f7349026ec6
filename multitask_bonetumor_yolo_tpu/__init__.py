"""TPU-native multitask bone-tumor X-ray framework (JAX / Flax / XLA / Pallas).

A brand-new framework with the capabilities of the reference repo
``rafifmalikdzaki/Multitask-Bonetumor-yolo`` (see SURVEY.md), designed TPU-first:

* fixed-shape padded batches instead of ragged GT concats,
* fully vectorized loss assignment / decode / NMS (no per-image Python loops),
* Flax NHWC modules under jitted, mesh-sharded train/eval steps,
* orbax checkpointing, optax AdamW + cosine schedule,
* Pallas kernels for the hot fused blocks.

Layers (mirrors SURVEY.md §7):
  core/     pure box / anchor / DFL / letterbox math
  data/     offline converter CLI, BTXRD loader, on-device preprocessing
  models/   Flax modules: ConvBlock, C2f, BiFPN, ConvNeXt-Tiny, Detect/Segment heads
  ops/      batched NMS, resize, mask composition, Pallas kernels
  losses/   vectorized 5-term multitask loss
  train/    train state, jitted sharded steps, checkpointing, loop
  metrics/  Dice/F1/P/R/Acc, COCO-style mAP (bbox + segm), confusion matrices
  parallel/ mesh + sharding helpers
  utils/    logging/observability, profiling, config
"""

__version__ = "0.1.0"
