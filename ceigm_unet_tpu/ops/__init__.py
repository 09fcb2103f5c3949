from ceigm_unet_tpu.ops.selective_scan import selective_scan
from ceigm_unet_tpu.ops.cross_scan import (
    cross_scan_1d, cross_merge_1d, cross_scan_4d, cross_merge_4d,
)

__all__ = [
    "selective_scan",
    "cross_scan_1d", "cross_merge_1d", "cross_scan_4d", "cross_merge_4d",
]
