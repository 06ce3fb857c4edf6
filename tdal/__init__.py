"""tdal — a TPU-native (JAX / XLA / Pallas / pjit) offboard 3D auto-labeling framework.

Re-implements the full capability surface of the 3DAL pipeline ("Offboard 3D Object
Detection from Point Cloud Sequences", Qi et al. CVPR'21) as realized by the PyTorch
reference jacky121298/3DAL_PyTorch, redesigned TPU-first:

- core/       pure-JAX geometry, rotated IoU, NMS, voxelization, target assignment
- models/     flax detection models (CenterPoint: PointPillars / VoxelNet) and the
              Frustum-PointNet static & dynamic object auto-labelers
- ops/        Pallas TPU kernels for the hot paths
- data/       Waymo-format datasets, pipelines, GT-augmentation
- runtime/    config system, registries, train loop, checkpointing, logging
- parallel/   jax.sharding Mesh setup, pjit train/eval steps, multi-host utilities
- pipeline/   the 6-stage offboard flow: detect -> track -> trackData -> motionState
              -> static label -> dynamic label
"""

__version__ = "0.1.0"
