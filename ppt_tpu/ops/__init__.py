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
]
