from tpu_pillars.parallel.mesh import make_mesh, make_mesh_n
from tpu_pillars.parallel.train_dp import (
    make_dp_train_step, make_shardmap_train_step, shard_train_batch,
)
from tpu_pillars.parallel.eval_dp import (
    make_dp_detector_fn, make_dp_packed_detector,
)
from tpu_pillars.parallel.spatial import (
    make_spatial_detector_fn, make_spatial_frontend, split_points_by_slab,
)

__all__ = [
    "make_mesh", "make_mesh_n", "make_dp_train_step",
    "make_shardmap_train_step",
    "shard_train_batch",
    "make_dp_detector_fn", "make_dp_packed_detector",
    "make_spatial_detector_fn", "make_spatial_frontend",
    "split_points_by_slab",
]
