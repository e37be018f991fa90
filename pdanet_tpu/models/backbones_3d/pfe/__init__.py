from .voxel_set_abstraction import VoxelSetAbstraction  # noqa: F401
