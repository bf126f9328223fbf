from ppt_tpu.utils.metrics import (
    topk_accuracy,
    per_class_accuracy,
    partseg_ious,
    Meter,
)

__all__ = ["topk_accuracy", "per_class_accuracy", "partseg_ious", "Meter"]
