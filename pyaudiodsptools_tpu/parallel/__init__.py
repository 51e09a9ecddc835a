from .mesh import make_mesh, single_device_mesh
from .sharding import ShardedRenderer
from . import dist

__all__ = ["make_mesh", "single_device_mesh", "ShardedRenderer", "dist"]
