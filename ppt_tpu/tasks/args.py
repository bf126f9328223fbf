"""Task CLI: one shared flag surface for every driver.

Parity with the reference's single argparse (``parser.py:1-85``) — same
flag names and defaults so reference launch scripts translate directly —
plus TPU-specific knobs (compute dtype, mesh size, synthetic fallback).
Implemented as a dataclass so tests and notebooks can construct args
programmatically without argparse.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import List, Optional, Tuple


@dataclasses.dataclass
class TaskArgs:
    # data
    output_dir: str = "outputs"
    dataset_name: str = "modelnet40"
    dataset_type: str = "test"
    sonn_type: str = "hardest"
    dataset_prompt: str = "modelnet40_64"
    data_path: str = "data"
    use_height: bool = False
    npoints: int = 8192
    nshots: int = 16
    allow_synthetic_fallback: bool = True
    # prompt
    template_init: str = ""
    num_learnable_prompt_tokens: int = 32
    class_name_position: str = "end"
    # model
    model: str = "ULIP_PointBERT"
    head_type: int = 0
    test_ckpt_addr: str = ""
    ulip2: bool = False
    fpath: str = ""
    topk: int = 5
    pretrained_dir: str = "data/pretrained_models"
    # training
    epochs: int = 250
    warmup_epochs: int = 1
    start_epoch: int = 0
    batch_size: int = 64
    data_ratio: float = 1.0
    optim: str = "adamw"
    sched: str = "cosine"
    plateau_patience: int = 10  # epochs w/o improvement (sched=plateau)
    plateau_factor: float = 0.1  # LR decay on plateau (timm decay_rate)
    lr: float = 3e-3
    lr_start: float = 1e-6
    lr_end: float = 1e-5
    update_freq: int = 1
    wd: float = 0.1
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-8
    grad_norm_clip: float = 0.0  # global L2 clip before the update; 0=off
    eval_freq: int = 1
    resume: str = ""
    label_smoothing: float = 0.3
    # linear probe
    num_step: int = 8
    num_run: int = 10
    # system
    print_freq: int = 10
    evaluate_3d: bool = False
    seed: int = 0
    task: str = "cls"
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    mesh_devices: int = 0  # 0 = all
    steps_per_dispatch: int = 1  # >1: lax.scan over stacked batches
    votes: int = 1  # eval-time augmentation voting (openpoints --vote)
    # scene segmentation (openpoints examples/segmentation)
    voxel_size: float = 0.04
    voxel_max: int = 4096
    test_area: int = 5  # S3DIS held-out area
    eval_scene: bool = False  # whole-scene (multi-voxel-pass) final eval
    allow_train_eval: bool = False  # fall back to train split for eval
    max_eval_passes: int = 0  # 0 = all voxel passes (reference behavior)
    cm_out: str = ""  # write eval confusion matrix npz (s3dis_6fold input)
    # experiment tracking
    proj_name: str = "PPT_TPU"
    exp_name: str = ""
    wandb: bool = False

    # populated at runtime
    classnames: Optional[List[str]] = None

    def load_classnames(self, labels_path: Optional[str] = None) -> List[str]:
        """Classnames from a labels.json keyed by dataset name (reference
        loads ``data/labels.json`` at startup, utils/utils.py:118-120)."""
        if self.classnames is not None:
            return self.classnames
        if labels_path is None:
            labels_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "assets",
                "labels.json",
            )
        if os.path.exists(labels_path):
            with open(labels_path) as f:
                catalog = json.load(f)
            for key in (self.dataset_name, self.dataset_name.replace("_fs", "")):
                if key in catalog:
                    self.classnames = catalog[key]
                    return self.classnames
        raise FileNotFoundError(
            f"no classnames for {self.dataset_name} in {labels_path}"
        )


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="PPT-TPU training and evaluation", add_help=True
    )
    p.add_argument(
        "--config", default="", help="experiment YAML (configs/experiments/*)"
    )
    p.add_argument(
        "--set", dest="overrides", nargs="*", default=[],
        metavar="KEY=VALUE", help="dotted config overrides",
    )
    for field in dataclasses.fields(TaskArgs):
        if field.name == "classnames":
            continue
        arg = "--" + field.name
        if field.type == "bool" or isinstance(field.default, bool):
            p.add_argument(arg, action="store_true", default=None)
        elif field.name == "betas":
            p.add_argument(arg, nargs=2, type=float, default=None)
        else:
            p.add_argument(arg, type=type(field.default), default=None)
    return p


def parse_args(argv=None) -> TaskArgs:
    """Resolution order (later wins): dataclass defaults < --config YAML
    (with --set overrides) < explicit CLI flags."""
    ns = build_argparser().parse_args(argv)
    args = TaskArgs()
    if ns.config:
        from ppt_tpu.utils.config import apply_overrides, config_to_args, load_config

        cfg = load_config(ns.config)
        cfg = apply_overrides(cfg, ns.overrides or [])
        args = config_to_args(cfg, args)
    for k, v in vars(ns).items():
        if k in ("config", "overrides") or v is None:
            continue
        if k == "betas" and isinstance(v, list):
            v = tuple(v)
        setattr(args, k, v)
    return args
