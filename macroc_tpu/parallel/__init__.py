from macroc_tpu.parallel.mesh import (
    make_grid_mesh,
    node_sharding,
    gp_sharding,
    shard_problem_fields,
)

__all__ = [
    "make_grid_mesh",
    "node_sharding",
    "gp_sharding",
    "shard_problem_fields",
]
