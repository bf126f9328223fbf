from ppt_tpu.kernels.fps import fps_pallas
from ppt_tpu.kernels.knn import knn_pallas

__all__ = ["fps_pallas", "knn_pallas"]
