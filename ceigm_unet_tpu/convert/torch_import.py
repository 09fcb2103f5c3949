"""PyTorch checkpoint -> JAX pytree converter.

Covers the reference's three load paths (SURVEY.md §5.4):
  (a) pretrained GroupMamba encoder checkpoints with the key remapping of
      gm-unet/model/gm/__init__.py:27-58 (``layers.N.downsample`` ->
      ``downsamples.N``, ``ln_1`` -> ``norm``, ``self_attention`` -> ``op``,
      head/norm keys skipped),
  (b) Lightning training checkpoints (``_model.`` prefix strip,
      gm-unet/inference.py:175-221),
  (c) raw ``state_dict`` saves (model/__init__.py:40-41).

Weight-layout transforms:
  torch Linear  (out, in)            -> flax Dense kernel (in, out)
  torch Conv2d  (out, in/g, kh, kw)  -> flax Conv kernel (kh, kw, in/g, out)
  torch BN      weight/bias + running stats -> params scale/bias + batch_stats
  4x per-group SS2D modules (mamba_g1..g4)  -> stacked QuadGroupSS2D arrays

The converter consumes numpy-convertible mappings, so it works on
``torch.load(..., map_location="cpu")`` state dicts without importing torch
here.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        # copy=True: .numpy() is a VIEW of the live torch buffer, and on
        # CPU jnp.asarray can keep it zero-copy — an in-place torch update
        # (optimizer.step) would silently mutate the converted tree
        x = np.array(x.detach().cpu().numpy(), copy=True)
    return np.asarray(x)


def t_linear(w) -> np.ndarray:
    return _np(w).T


def t_conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def strip_lightning_prefix(sd: Mapping[str, Any],
                           prefix: str = "_model.") -> Dict[str, Any]:
    """Reference inference.get_model semantics (inference.py:175-221)."""
    out = {}
    for k, v in sd.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def remap_pretrained_groupmamba_keys(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Upstream GroupMamba classification ckpt -> gm-unet GroupMamba names.

    Mirrors load_pretrained_ckpt (gm-unet/model/gm/__init__.py:27-58):
    skip head/norm/dist_head keys, ``layers.N.downsample`` ->
    ``downsamples.N``, ``ln_1`` -> ``norm``, ``self_attention`` -> ``op``.
    """
    skip = ("norm.weight", "norm.bias", "head.weight", "head.bias",
            "dist_head.weight", "dist_head.bias")
    out = {}
    for k, v in sd.items():
        if k in skip:
            continue
        k = re.sub(r"^layers\.(\d+)\.downsample", r"downsamples.\1", k)
        k = k.replace("ln_1", "norm").replace("self_attention", "op")
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Builders for common leaves
# ---------------------------------------------------------------------------

class _SD:
    """State-dict view with prefix handling and consumption tracking."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = dict(sd)
        self.used = set()

    def get(self, key: str) -> np.ndarray:
        self.used.add(key)
        return _np(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _dense(sd: _SD, p: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": t_linear(sd.get(p + ".weight"))}
    if bias and sd.has(p + ".bias"):
        out["bias"] = sd.get(p + ".bias")
    return out


def _conv(sd: _SD, p: str) -> Dict[str, np.ndarray]:
    out = {"kernel": t_conv(sd.get(p + ".weight"))}
    if sd.has(p + ".bias"):
        out["bias"] = sd.get(p + ".bias")
    return out


def _ln(sd: _SD, p: str) -> Dict[str, np.ndarray]:
    return {"scale": sd.get(p + ".weight"), "bias": sd.get(p + ".bias")}


def _bn(sd: _SD, p: str) -> Tuple[Dict[str, np.ndarray],
                                  Dict[str, np.ndarray]]:
    params = {"scale": sd.get(p + ".weight"), "bias": sd.get(p + ".bias")}
    stats = {"mean": sd.get(p + ".running_mean"),
             "var": sd.get(p + ".running_var")}
    return params, stats


# ---------------------------------------------------------------------------
# SS2D / GroupMambaLayer
# ---------------------------------------------------------------------------

def _quad_ss2d(sd: _SD, p: str) -> Dict[str, Any]:
    """4 per-group SS2D modules (``{p}.mamba_g{1..4}``) -> stacked
    QuadGroupSS2D parameter arrays."""
    gs = [f"{p}.mamba_g{k}" for k in (1, 2, 3, 4)]

    in_proj = np.stack([t_linear(sd.get(g + ".in_proj.weight")) for g in gs])
    # depthwise convs concat along output channels
    conv_k = np.concatenate([t_conv(sd.get(g + ".conv2d.weight"))
                             for g in gs], axis=-1)
    conv_b = np.concatenate([sd.get(g + ".conv2d.bias") for g in gs])
    x_proj = np.concatenate([sd.get(g + ".x_proj_weight") for g in gs])
    dt_w = np.concatenate([sd.get(g + ".dt_projs_weight") for g in gs])
    dt_b = np.concatenate([sd.get(g + ".dt_projs_bias") for g in gs])
    A_logs = np.concatenate([sd.get(g + ".A_logs") for g in gs])
    Ds = np.concatenate([sd.get(g + ".Ds") for g in gs])
    on_scale = np.stack([sd.get(g + ".out_norm.weight") for g in gs])
    on_bias = np.stack([sd.get(g + ".out_norm.bias") for g in gs])
    out_proj = np.stack([t_linear(sd.get(g + ".out_proj.weight"))
                         for g in gs])
    return {
        "in_proj_weight": in_proj,
        "conv2d": {"kernel": conv_k, "bias": conv_b},
        "ssm": {"x_proj_weight": x_proj, "dt_projs_weight": dt_w,
                "dt_projs_bias": dt_b, "A_logs": A_logs, "Ds": Ds},
        "out_norm_scale": on_scale, "out_norm_bias": on_bias,
        "out_proj_weight": out_proj,
    }


def _gm_layer(sd: _SD, p: str) -> Dict[str, Any]:
    """GroupMambaLayer (reference groupmamba.py:85-159)."""
    return {
        "norm": _ln(sd, p + ".norm"),
        "fc1": _dense(sd, p + ".fc1"),
        "fc2": _dense(sd, p + ".fc2"),
        "skip_scale": sd.get(p + ".skip_scale"),
        "mamba": _quad_ss2d(sd, p),
        "proj": _dense(sd, p + ".proj"),
    }


def _pvt2ffn(sd: _SD, p: str) -> Dict[str, Any]:
    return {
        "fc1": _dense(sd, p + ".fc1"),
        "dwconv": _conv(sd, p + ".dwconv.dwconv"),
        "fc2": _dense(sd, p + ".fc2"),
    }


def _custom_ffn(sd: _SD, p: str) -> Dict[str, Any]:
    return {
        "fc1": _dense(sd, p + ".fc1"),
        "dwconv": _conv(sd, p + ".dwconv.dwconv"),
        "custom": {
            "dw3": _conv(sd, p + ".custom.dwconv_3x3"),
            "dw5": _conv(sd, p + ".custom.dwconv_5x5"),
            "dw7": _conv(sd, p + ".custom.dwconv_7x7"),
        },
        "fc2": _dense(sd, p + ".fc2"),
    }


def _block_mamba(sd: _SD, p: str, custom_ffn: bool) -> Dict[str, Any]:
    return {
        "attn": _gm_layer(sd, p + ".attn"),
        "norm2": _ln(sd, p + ".norm2"),
        "mlp": (_custom_ffn if custom_ffn else _pvt2ffn)(sd, p + ".mlp"),
    }


# ---------------------------------------------------------------------------
# GroupMamba encoder
# ---------------------------------------------------------------------------

def convert_groupmamba_state_dict(
    state_dict: Mapping[str, Any],
    depths: Sequence[int] = (3, 4, 9, 3),
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """GroupMamba torch module names -> (params, batch_stats) trees matching
    :class:`ceigm_unet_tpu.models.groupmamba.GroupMamba`."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # stem: torch Sequential conv.{0,1,3,4,6,7} + proj + norm
    pe = "patch_embed1"
    bn1p, bn1s = _bn(sd, pe + ".conv.1")
    bn2p, bn2s = _bn(sd, pe + ".conv.4")
    bn3p, bn3s = _bn(sd, pe + ".conv.7")
    params["patch_embed1"] = {
        "conv1": _conv(sd, pe + ".conv.0"), "bn1": bn1p,
        "conv2": _conv(sd, pe + ".conv.3"), "bn2": bn2p,
        "conv3": _conv(sd, pe + ".conv.6"), "bn3": bn3p,
        "proj": _conv(sd, pe + ".proj"),
        "norm": _ln(sd, pe + ".norm"),
    }
    stats["patch_embed1"] = {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s}

    for i in range(1, 4):
        p = f"patch_embed{i + 1}"
        params[p] = {"proj": _conv(sd, p + ".proj"),
                     "norm": _ln(sd, p + ".norm")}

    for i, depth in enumerate(depths):
        for j in range(depth):
            params[f"block{i + 1}_{j}"] = _block_mamba(
                sd, f"block{i + 1}.{j}", custom_ffn=False)
        params[f"norm{i + 1}"] = _ln(sd, f"norm{i + 1}")

    return params, stats


# ---------------------------------------------------------------------------
# EMCAD decoder
# ---------------------------------------------------------------------------

def _cab(sd: _SD, p: str) -> Dict[str, Any]:
    return {
        "conv1": _conv(sd, p + ".conv1"),
        "conv2_1": _conv(sd, p + ".conv2_1"),
        "conv2_2": _conv(sd, p + ".conv2_2"),
        "conv3": _conv(sd, p + ".conv3"),
        "fc": _conv(sd, p + ".fc.0"),
    }


def _sab(sd: _SD, p: str) -> Dict[str, Any]:
    return {"conv3": _conv(sd, p + ".conv3"),
            "conv7": _conv(sd, p + ".conv7"),
            "conv11": _conv(sd, p + ".conv11")}


def _paf(sd: _SD, p: str) -> Dict[str, Any]:
    return {
        "channel_attention": _cab(sd, p + ".channel_attention"),
        "spatial_attention": _sab(sd, p + ".spatial_attention"),
        "mix": sd.get(p + ".x").reshape(1),
        "final_conv": _conv(sd, p + ".final_conv"),
    }


def _lgag(sd: _SD, p: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    bnp, bns = _bn(sd, p + ".bn")
    psibnp, psibns = _bn(sd, p + ".psi.1")
    params = {f"W_{a}_{k}": _conv(sd, f"{p}.W_{a}_{k}")
              for a in ("g", "x") for k in (1, 3, 5)}
    params.update({"bn": bnp, "psi_conv": _conv(sd, p + ".psi.0"),
                   "psi_bn": psibnp})
    return params, {"bn": bns, "psi_bn": psibns}


def _dysample(sd: _SD, p: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    eubnp, eubns = _bn(sd, p + ".eu.up_dwc.1")
    params = {
        "offset0": _conv(sd, p + ".offset.0"),
        "offset1": _conv(sd, p + ".offset.1"),
        "eu": {"up_dwc": _conv(sd, p + ".eu.up_dwc.0"), "bn": eubnp,
               "pwc": _conv(sd, p + ".eu.pwc.0")},
    }
    return params, {"eu": {"bn": eubns}}


def _front(sd: _SD, p: str, depth: int) -> Dict[str, Any]:
    return {f"block{i}": _block_mamba(sd, f"{p}.cm_layer.blocks.{i}",
                                      custom_ffn=True)
            for i in range(depth)}


def convert_emcad_state_dict(
    state_dict: Mapping[str, Any],
    front_depths: Sequence[int] = (3, 2, 2),
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    sd = _SD(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for idx in (1, 2, 3, 4):
        params[f"cc{idx}"] = {"cw": _conv(sd, f"cc{idx}.cw")}
        params[f"para{idx}"] = _paf(sd, f"para{idx}")
    for idx in (1, 2, 3):
        lp, ls = _lgag(sd, f"lgag{idx}")
        params[f"lgag{idx}"] = lp
        stats[f"lgag{idx}"] = ls
        dp, dstat = _dysample(sd, f"eucb{idx}")
        params[f"eucb{idx}"] = dp
        stats[f"eucb{idx}"] = dstat
    for fi, depth in enumerate(front_depths):
        params[f"f{fi + 1}"] = _front(sd, f"f{fi + 1}", depth)
    params["out_head1"] = _conv(sd, "out_head1")
    return params, stats


def convert_msvm_unet_state_dict(
    state_dict: Mapping[str, Any],
    depths: Sequence[int] = (3, 4, 9, 3),
    front_depths: Sequence[int] = (3, 2, 2),
) -> Dict[str, Any]:
    """Full MSVMUNet torch state_dict -> flax variables
    {"params": ..., "batch_stats": ...}."""
    enc_sd = {k[len("encoder.gm_encoder."):]: v for k, v in
              state_dict.items() if k.startswith("encoder.gm_encoder.")}
    dec_sd = {k[len("decoder."):]: v for k, v in state_dict.items()
              if k.startswith("decoder.")}
    enc_p, enc_s = convert_groupmamba_state_dict(enc_sd, depths)
    dec_p, dec_s = convert_emcad_state_dict(dec_sd, front_depths)
    return {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }
