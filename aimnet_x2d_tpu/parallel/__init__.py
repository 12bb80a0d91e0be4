from .mesh import create_mesh, data_parallel_specs

__all__ = ["create_mesh", "data_parallel_specs"]
