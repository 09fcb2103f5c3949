from ceigm_unet_tpu.eval.metrics import (
    dice_binary, SegMeter, surface_metrics, CLASS_COLOR_MAPS)
from ceigm_unet_tpu.eval.volume import eval_single_volume, predict_volume

__all__ = ["dice_binary", "SegMeter", "surface_metrics", "CLASS_COLOR_MAPS",
           "eval_single_volume", "predict_volume"]
