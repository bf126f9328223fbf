from ppt_tpu.data.augment import (
    normalize_to_unit_sphere,
    translate_pointcloud,
    rotate_y,
    jitter,
    random_scale,
    shift,
    random_point_dropout,
    rotate_perturbation,
    shuffle_points,
    append_height,
    train_augment,
)
from ppt_tpu.data.datasets import (
    DATASET_REGISTRY,
    ArrayDataset,
    build_dataset,
    generate_fewshot,
    make_synthetic,
)
from ppt_tpu.data.loader import Loader

__all__ = [
    "normalize_to_unit_sphere",
    "translate_pointcloud",
    "rotate_y",
    "jitter",
    "random_scale",
    "shift",
    "random_point_dropout",
    "rotate_perturbation",
    "shuffle_points",
    "append_height",
    "train_augment",
    "DATASET_REGISTRY",
    "ArrayDataset",
    "build_dataset",
    "generate_fewshot",
    "make_synthetic",
    "Loader",
]
