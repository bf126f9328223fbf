from ppt_tpu.ops.losses3d import (
    chamfer_l1,
    chamfer_l2,
    chamfer_l1_split,
    chamfer_l2_split,
    emd_distance,
)
from ppt_tpu.ops import ragged
from ppt_tpu.ops.geometry import (
    square_distance,
    index_points,
    farthest_point_sample,
    fps_gather,
    knn_point,
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
    three_nn,
    three_interpolate,
    group_points,
)

__all__ = [
    "square_distance",
    "index_points",
    "farthest_point_sample",
    "fps_gather",
    "knn_point",
    "query_ball_point",
    "sample_and_group",
    "sample_and_group_all",
    "three_nn",
    "three_interpolate",
    "group_points",
    "chamfer_l1",
    "chamfer_l2",
    "chamfer_l1_split",
    "chamfer_l2_split",
    "emd_distance",
    "ragged",
]
