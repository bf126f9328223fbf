from ppt_tpu.nn.layers import LayerNormF32, QuickGELU, MlpBlock, DropPath
from ppt_tpu.nn.text import TextTransformer, TextConfig
from ppt_tpu.nn.pointbert import PointBert, PointBertConfig, PointBertPartSeg
from ppt_tpu.nn.pointnet2 import PointNet2Ssg, PointNet2Msg
from ppt_tpu.nn.pointmlp import PointMLP
from ppt_tpu.nn.pointnext import PointNext, PointNextConfig
from ppt_tpu.nn.classic import PointNetClassic, PointNetEncoder, Tnet, DgcnnClassifier
from ppt_tpu.nn.pct import Pct
from ppt_tpu.nn.curvenet import CurveNet, CurveNetConfig
from ppt_tpu.nn.pointtransformer import (
    PointTransformerConfig,
    PointTransformerSeg,
)
from ppt_tpu.nn.randlanet import RandLANet, RandLANetConfig
from ppt_tpu.nn.gcn import BallDgcnn, DeepGcn, DeepGcnConfig, GroupPointNet
from ppt_tpu.nn.graphvit import GraphVit3d, GraphVit3dConfig, PointPatchEmbed
from ppt_tpu.nn.resnet import BasicBlock, Bottleneck, ResNetStages
from ppt_tpu.nn.simpleview import SimpleView, SimpleViewConfig, points_to_depth_views
from ppt_tpu.nn.baafnet import BaafNet, BaafNetConfig
from ppt_tpu.nn.stratified import StratifiedConfig, StratifiedSeg
from ppt_tpu.nn.pointnext_packed import PointNextPacked
from ppt_tpu.nn.vitseg import PointVitSeg, PointVitSegConfig
from ppt_tpu.nn.assa import Assa
from ppt_tpu.nn.mae import MaeConfig, MaskedPointMAE, random_patch_masking

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
    "PointTransformerConfig",
    "PointTransformerSeg",
    "RandLANet",
    "RandLANetConfig",
    "BallDgcnn",
    "DeepGcn",
    "DeepGcnConfig",
    "GroupPointNet",
    "GraphVit3d",
    "GraphVit3dConfig",
    "PointPatchEmbed",
    "BasicBlock",
    "Bottleneck",
    "ResNetStages",
    "SimpleView",
    "SimpleViewConfig",
    "points_to_depth_views",
    "BaafNet",
    "BaafNetConfig",
    "StratifiedConfig",
    "StratifiedSeg",
    "PointNextPacked",
    "PointVitSeg",
    "PointVitSegConfig",
    "Assa",
    "MaeConfig",
    "MaskedPointMAE",
    "random_patch_masking",
]
