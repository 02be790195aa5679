"""lyft3d_tpu — TPU-native (JAX/XLA/Pallas) lidar 3D object detection framework.

A ground-up rebuild of the capabilities of the Lyft-L5 competition stack
(jionie/Lyft-3D-Object-Detection): dataset SDK, BEV rasterization, BEV
segmentation model families (UNet / DeepLabV3+), SECOND-style voxel detector,
PointRCNN two-stage point detector, the official Lyft mAP metric, and a single
typed-config training harness — designed TPU-first:

- fixed-capacity padded tensors + masks instead of dynamic shapes
- Pallas kernels for the reference's CUDA ops (FPS, ball query, grouping,
  3-NN interpolate, RoI-pool3D, rotated IoU/NMS, voxelization, BEV scatter)
- flax/optax/pjit for models, optimizers, and data parallelism over ICI
- bfloat16 matmul path onto the MXU

Subpackages:
    core     — pure geometry/box math (quaternions, SE(3), box algebra)
    ops      — device ops (rotated IoU, NMS, rasterizer, voxelizer, pointnet2)
    data     — Lyft dataset SDK (JSON table DB, point clouds, map masks)
    models   — flax model families (UNet, DeepLab, SECOND, PointRCNN)
    train    — optimizers, losses, checkpointing, trainer, logging
    eval     — official Lyft mAP, KITTI AP, submission CSV
    parallel — mesh/sharding helpers (pjit DP over ICI)
    utils    — profiling, progress
"""

__version__ = "0.1.0"
