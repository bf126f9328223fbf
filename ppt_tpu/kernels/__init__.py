from ppt_tpu.kernels.fps import fps_pallas
from ppt_tpu.kernels.knn import knn_pallas
from ppt_tpu.kernels.group import (
    fps_batched,
    knn_gather,
    ball_query_gather,
    fused_group,
)
from ppt_tpu.kernels.chamfer import chamfer_pallas
from ppt_tpu.kernels.emd import approx_match_pallas, emd_matchcost_pallas
from ppt_tpu.kernels.attention import flash_mha

__all__ = [
    "fps_pallas",
    "knn_pallas",
    "fps_batched",
    "knn_gather",
    "ball_query_gather",
    "fused_group",
    "chamfer_pallas",
    "approx_match_pallas",
    "emd_matchcost_pallas",
    "flash_mha",
]
