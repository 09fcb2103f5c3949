"""VSSM (VMamba backbone) torch checkpoint -> JAX pytree converter.

Covers the reference's second encoder family (model/vmamba/__init__.py:
117-171: vssm1_tiny_0230s / vssm1_small_0229s checkpoints) in the live
configuration: channel_first (ln2d), patchembed v2, downsample v3,
forward_type v05_noz (k_group=4, no z-gate).

Torch module names (reference vmamba.py:1385-1636):
    patch_embed.{0,2,5,7}       conv / ln2d / conv / ln2d
    layers.{i}.blocks.{j}.norm | .op.{in_proj, conv2d, x_proj_weight,
        dt_projs_weight, dt_projs_bias, A_logs, Ds, out_norm, out_proj}
        | .norm2 | .mlp.{fc1, fc2}
    downsamples.{i}.{1,3}       conv / ln2d
Linear2d weights are stored (out, in) like nn.Linear.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np

from ceigm_unet_tpu.convert.torch_import import (
    _SD, _dense, _conv, _ln, t_linear)


def _vssm_ss2d(sd: _SD, p: str) -> Dict[str, Any]:
    """SS2D op (k_group=4, v05_noz) -> flax SS2D tree."""
    return {
        "in_proj": {"kernel": t_linear(sd.get(p + ".in_proj.weight"))},
        "conv2d": _conv(sd, p + ".conv2d"),
        "ssm": {
            "x_proj_weight": sd.get(p + ".x_proj_weight"),
            "dt_projs_weight": sd.get(p + ".dt_projs_weight"),
            "dt_projs_bias": sd.get(p + ".dt_projs_bias"),
            "A_logs": sd.get(p + ".A_logs"),
            "Ds": sd.get(p + ".Ds"),
        },
        "out_norm": _ln(sd, p + ".out_norm"),
        "out_proj": {"kernel": t_linear(sd.get(p + ".out_proj.weight"))},
    }


def convert_vssm_state_dict(
    state_dict: Mapping[str, Any],
    depths: Sequence[int] = (2, 2, 8, 2),
) -> Dict[str, Any]:
    """VSSM torch state_dict -> params tree matching
    :class:`ceigm_unet_tpu.models.vmamba.VSSM` (patchembed v2 / ds v3)."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {
        "patch_embed0": _conv(sd, "patch_embed.0"),
        "patch_norm0": _ln(sd, "patch_embed.2"),
        "patch_embed1": _conv(sd, "patch_embed.5"),
        "patch_norm1": _ln(sd, "patch_embed.7"),
    }
    if sd.has("pos_embed"):
        pe = sd.get("pos_embed")            # (1, C, H, W) channel-first
        params["pos_embed"] = np.transpose(pe, (0, 2, 3, 1))

    for i, depth in enumerate(depths):
        for j in range(depth):
            b = f"layers.{i}.blocks.{j}"
            params[f"layer{i}_block{j}"] = {
                "norm": _ln(sd, b + ".norm"),
                "op": _vssm_ss2d(sd, b + ".op"),
                "norm2": _ln(sd, b + ".norm2"),
                "mlp": {"fc1": _dense(sd, b + ".mlp.fc1"),
                        "fc2": _dense(sd, b + ".mlp.fc2")},
            }
        if i < len(depths) - 1:
            params[f"downsample{i}_conv"] = _conv(sd, f"downsamples.{i}.1")
            params[f"downsample{i}_norm"] = _ln(sd, f"downsamples.{i}.3")
    return params
