from ppt_tpu.models.ulip import (
    Ulip,
    PromptArrays,
    build_model,
    trainable_mask,
    MODEL_REGISTRY,
)
from ppt_tpu.models.losses import (
    ulip_contrastive_loss,
    smoothed_cross_entropy,
)

__all__ = [
    "Ulip",
    "PromptArrays",
    "build_model",
    "trainable_mask",
    "MODEL_REGISTRY",
    "ulip_contrastive_loss",
    "smoothed_cross_entropy",
]
