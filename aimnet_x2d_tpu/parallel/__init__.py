from .halo import HaloStats, partition_halo
from .mesh import create_mesh, data_parallel_specs

__all__ = ["HaloStats", "create_mesh", "data_parallel_specs", "partition_halo"]
