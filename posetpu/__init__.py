"""posetpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-view pose framework.

A from-scratch rebuild of the capabilities of LouisNUST/pose-unsupervised
(unsupervised multi-view 3D human pose estimation on Human3.6M): SimpleBaseline
PoseResNet heatmap networks, cross-view heatmap aggregation, epipolar/MI
unsupervised losses, pseudo-label minting via RANSAC + DLT triangulation, and
RPSM 3D refinement — all expressed as batched XLA computation over a TPU
device mesh rather than per-sample Python loops.

Layout:
    posetpu.config     — layered config (defaults <- YAML <- overrides), accepts
                         the reference experiment YAML schema.
    posetpu.ops        — affine transforms, heatmap render/decode, bilinear warp.
    posetpu.geometry   — cameras, triangulation, RANSAC, fundamental matrices,
                         skeleton, RPSM.
    posetpu.models     — Flax PoseResNet / multi-view aggregation / discriminators,
                         plus a PyTorch checkpoint converter.
    posetpu.core       — losses (MSE, fundamental, MI family), accuracy, decoding.
    posetpu.data       — MPII / MultiviewH36M / mixed / COCO datasets, H5 interchange.
    posetpu.train      — pjit train/eval steps, optimizers, Orbax checkpointing.
    posetpu.parallel   — mesh + sharding helpers.
    posetpu.pseudo     — pseudo-label minting (threshold / RANSAC / reprojection).
"""

__version__ = "0.1.0"
