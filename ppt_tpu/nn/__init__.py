from ppt_tpu.nn.layers import LayerNormF32, QuickGELU, MlpBlock, DropPath
from ppt_tpu.nn.text import TextTransformer, TextConfig
from ppt_tpu.nn.pointbert import PointBert, PointBertConfig, PointBertPartSeg
from ppt_tpu.nn.pointnet2 import PointNet2Ssg, PointNet2Msg
from ppt_tpu.nn.pointmlp import PointMLP
from ppt_tpu.nn.pointnext import PointNext, PointNextConfig
from ppt_tpu.nn.classic import PointNetClassic, PointNetEncoder, Tnet, DgcnnClassifier
from ppt_tpu.nn.pct import Pct
from ppt_tpu.nn.curvenet import CurveNet, CurveNetConfig

__all__ = [
    "LayerNormF32",
    "QuickGELU",
    "MlpBlock",
    "DropPath",
    "TextTransformer",
    "TextConfig",
    "PointBert",
    "PointBertConfig",
    "PointBertPartSeg",
    "PointNet2Ssg",
    "PointNet2Msg",
    "PointMLP",
    "PointNext",
    "PointNextConfig",
    "PointNetClassic",
    "PointNetEncoder",
    "Tnet",
    "DgcnnClassifier",
    "Pct",
    "CurveNet",
    "CurveNetConfig",
]
