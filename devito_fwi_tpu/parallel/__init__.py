"""Device-mesh parallelism (shot sharding; spatial sharding for 3-D)."""
from .sharding import shot_mesh, fm_multi_sharded, fwi_obj_sharded

__all__ = ["shot_mesh", "fm_multi_sharded", "fwi_obj_sharded"]
