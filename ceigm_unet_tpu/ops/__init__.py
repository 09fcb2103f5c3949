from ceigm_unet_tpu.ops.selective_scan import selective_scan
from ceigm_unet_tpu.ops.cross_scan import (
    cross_scan_1d, cross_merge_1d, cross_scan_4d, cross_merge_4d,
)
from ceigm_unet_tpu.ops.resize import (
    zoom_slices, zoom_slices_nearest, zoom_matrix)
from ceigm_unet_tpu.ops.grid_sample import (
    grid_sample_bilinear, grid_sample_bilinear_mm)
from ceigm_unet_tpu.ops.dwconv_pallas import depthwise_conv2d


def flops_selective_scan(batch: int, length: int, dim: int,
                         n_state: int, with_d: bool = True) -> int:
    """Analytic FLOPs model for the selective scan (reference
    gm-unet/model/gm/csms6s.py:239-260): 9*B*L*D*N (+ B*D*L with D)."""
    f = 9 * batch * length * dim * n_state
    if with_d:
        f += batch * dim * length
    return f


__all__ = [
    "selective_scan", "flops_selective_scan",
    "cross_scan_1d", "cross_merge_1d", "cross_scan_4d", "cross_merge_4d",
    "zoom_slices", "zoom_slices_nearest", "zoom_matrix",
    "grid_sample_bilinear", "grid_sample_bilinear_mm", "depthwise_conv2d",
]
from ceigm_unet_tpu.ops.quad_scan import (
    scan2d, sscan_dir, sscan_quad_ln)
from ceigm_unet_tpu.ops.tapconv import lgag_gate_eval
