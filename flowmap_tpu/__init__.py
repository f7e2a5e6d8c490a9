"""flowmap_tpu — a TPU-native (JAX/XLA/Pallas) gradient-descent SfM engine.

A from-scratch reimplementation of the capabilities of FlowMap
("FlowMap: High-Quality Camera Poses, Intrinsics, and Depth via Gradient
Descent", Smith*, Charatan*, Tewari, Sitzmann, 3DV 2025), designed TPU-first:

- The entire optimization step (depth net -> intrinsics -> unprojection ->
  Procrustes poses -> reprojection losses) is one pure jitted function.
- Pose estimation uses a quaternion (Horn) formulation of weighted Kabsch
  alignment instead of SVD: batched 4x4 symmetric eigenvector extraction by
  power iteration, which is stable, differentiable, and MXU-friendly.
- The pose chain is composed with `jax.lax.associative_scan` (log-depth).
- Frame-axis sharding (context parallelism over video frames) scales a single
  scene across a TPU mesh via `shard_map` + halo exchange.
"""

__version__ = "0.1.0"
