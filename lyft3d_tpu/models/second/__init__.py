"""SECOND-style voxel detector family (flax): VFE → middle → RPN."""
