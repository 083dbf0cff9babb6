"""PixelPick-TPU: a TPU-native active-learning semantic-segmentation framework.

A from-scratch JAX/Flax/XLA re-design of the capabilities of PixelPick
(NoelShin/PixelPick, ICCV 2021 ILDAV workshop): train a segmentation network
from a handful of labelled *pixels* per image, score the unlabelled pool with
per-pixel uncertainty, pick the next pixels to label, and repeat.

Design stance (TPU-first, not a port):

- All compute-path code is jitted JAX: train / eval / acquisition are single
  compiled step functions with static shapes, donated state and
  device-resident metric accumulation.
- The sparse-label loss gathers logits at the <=max_budget labelled
  coordinates per image instead of densifying labels to full resolution
  (numerically identical to dense masked cross-entropy, far cheaper).
- The acquisition sweep is batched over many pool images per device step and
  shards over a 1-D ``('data',)`` ``jax.sharding.Mesh``; only coordinate
  triples return to host.
- ``align_corners=True`` bilinear resizes are exact separable interpolation
  matmuls (MXU-friendly), matching the reference's torch semantics
  bit-for-bit in f32.
- Host-side artifacts (``queries.pkl`` coordinate codec, per-round checkpoint
  directory layout, CSV logs) stay byte-compatible with the reference so its
  annotation tools interoperate.
"""

__version__ = "0.1.0"
