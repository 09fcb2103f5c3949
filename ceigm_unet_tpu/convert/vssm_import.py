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
    _SD, _bn, _dense, _conv, _ln, t_linear)


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


def _ms_mlp(sd: _SD, p: str) -> Dict[str, Any]:
    """MS_MLP (reference decoder.py:2232-2262): fc1 -> GELU ->
    InceptionDWConv2d2 (square 3-5-7 chain | 1xk band | kx1 band) -> fc2."""
    mc = p + ".multiscale_conv"
    return {
        "fc1": _dense(sd, p + ".fc1"),
        "multiscale_conv": {
            "hw3": _conv(sd, mc + ".dwconv_hw.0"),
            "hw5": _conv(sd, mc + ".dwconv_hw.1"),
            "hw7": _conv(sd, mc + ".dwconv_hw.2"),
            "w11": _conv(sd, mc + ".dwconv_w.0"),
            "w5": _conv(sd, mc + ".dwconv_w.1"),
            "h11": _conv(sd, mc + ".dwconv_h.0"),
            "h5": _conv(sd, mc + ".dwconv_h.1"),
        },
        "fc2": _dense(sd, p + ".fc2"),
    }


def _lkpe(sd: _SD, p: str):
    """LKPE expand Sequential indices {0: conv1x1, 1: bn, 3: dw3x3}
    (reference decoder.py:2572-2597)."""
    bnp, bns = _bn(sd, p + ".expand.1")
    return ({"expand0": _conv(sd, p + ".expand.0"), "bn": bnp,
             "expand1": _conv(sd, p + ".expand.3"),
             "norm": _ln(sd, p + ".norm")}, {"bn": bns})


def _flkpe(sd: _SD, p: str):
    """FLKPE (reference decoder.py:2599-2633): LKPE pattern + 1x1 head."""
    params, stats = _lkpe(sd, p)
    params["out"] = _conv(sd, p + ".out")
    return params, stats


def _msvss_block(sd: _SD, b: str) -> Dict[str, Any]:
    return {
        "norm": _ln(sd, b + ".norm"),
        "op": _vssm_ss2d(sd, b + ".op"),
        "norm2": _ln(sd, b + ".norm2"),
        "mlp": _ms_mlp(sd, b + ".mlp"),
    }


def convert_legacy_decoder_state_dict(
    state_dict: Mapping[str, Any],
    depths: Sequence[int] = (2, 2, 2, 2),
):
    """Reference legacy MSVM-UNet Decoder (decoder.py:2655-2683) torch
    state_dict -> (params, batch_stats) matching
    :class:`ceigm_unet_tpu.models.vmamba.LegacyDecoder`."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    n_up = len(depths) - 1
    for i in range(n_up):
        p = f"layers.{i}"
        upp, ups = _lkpe(sd, p + ".up")
        blocks = {f"block{j}": _msvss_block(sd, f"{p}.vss_layer.blocks.{j}")
                  for j in range(depths[i + 1])}
        params[f"layer{i}"] = {
            "up": upp,
            "concat_layer": _dense(sd, p + ".concat_layer"),
            "vss_layer": blocks,
        }
        stats[f"layer{i}"] = {"up": ups}
    outp, outs = _flkpe(sd, "out_layers.0")
    params["out_layer"] = outp
    stats["out_layer"] = outs
    return params, stats


def convert_msvm_legacy_state_dict(
    enc_state_dict: Mapping[str, Any],
    dec_state_dict: Mapping[str, Any],
    enc_depths: Sequence[int] = (2, 2, 8, 2),
    dec_depths: Sequence[int] = (2, 2, 2, 2),
) -> Dict[str, Any]:
    """(VSSM encoder sd, legacy Decoder sd) -> flax variables for
    :class:`ceigm_unet_tpu.models.vmamba.MSVMUNetLegacy`."""
    enc_p = convert_vssm_state_dict(enc_state_dict, depths=enc_depths)
    dec_p, dec_s = convert_legacy_decoder_state_dict(dec_state_dict,
                                                     depths=dec_depths)
    return {"params": {"encoder": enc_p, "decoder": dec_p},
            "batch_stats": {"decoder": dec_s}}


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
