"""VMamba stack + legacy MSVM-UNet decoder (channel-last / NHWC).

Covers the reference capability surface of SURVEY.md §2.9-2.10:

- :class:`VSSBlock` — pre-norm residual SSM block + optional MLP branch
  (reference model/vmamba/vmamba.py:1035-1141; post-norm variant included).
- :class:`MsMlp` — MS_MLP: fc1 -> GELU -> InceptionDWConv2d2 (square
  3->5->7 chain, band 1x11->1x5, band 11x1->5x1 branches, residual) -> fc2
  (reference model/decoder.py:96-123, 2232-2262).
- :class:`MSVSS` — stack of VSSBlocks in the live decoder config
  (d_state=1, ssm_ratio=1, conv_bias=False, forward_type "v05_noz",
  customized MLP; reference decoder.py:2371-2420).
- :class:`LKPE` / :class:`FLKPE` — large-kernel patch-expand 2x / final 4x
  (conv1x1 expand + BN + ReLU + depthwise 3x3, pixel-shuffle rearrange,
  LN; reference decoder.py:2572-2633).
- :class:`UpBlock` / :class:`LegacyDecoder` — the published MSVM-UNet
  decoder (reference decoder.py:2635-2683).
- :class:`VSSM` — the VMamba backbone with patchembed v1/v2, downsample
  v1 (PatchMerging) / v2 / v3, optional pos-embed (reference
  vmamba.py:1385-1636); configs ``tiny_0230s`` / ``small_0229s``
  (model/vmamba/__init__.py:117-171).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ceigm_unet_tpu.ops.activations import gelu as fast_gelu

from ceigm_unet_tpu.models.ss2d import SS2D
from ceigm_unet_tpu.models.layers import DropPath, dw_conv
from ceigm_unet_tpu.utils.initializers import (
    trunc_normal, conv_fan_out_normal)


class InceptionDWConv2dBands(nn.Module):
    """InceptionDWConv2d2: residual 4-way split (identity | square 3-5-7 |
    1xk band | kx1 band chains), g = C/8 per conv branch."""
    band_kernel_size: int = 11
    branch_ratio: float = 0.125

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = int(c * self.branch_ratio)
        xi, xhw, xw, xh = jnp.split(x, [c - 3 * g, c - 2 * g, c - g],
                                    axis=-1)
        hw = dw_conv(g, 3, name="hw3")(xhw)
        hw = dw_conv(g, 5, name="hw5")(hw)
        hw = dw_conv(g, 7, name="hw7")(hw)

        def band(feat, kh, kw, name):
            from ceigm_unet_tpu.models.layers import DwConv
            return DwConv(features=g, kernel=(kh, kw), name=name)(feat)

        w = band(xw, 1, self.band_kernel_size, "w11")
        w = band(w, 1, 5, "w5")
        h = band(xh, self.band_kernel_size, 1, "h11")
        h = band(h, 5, 1, "h5")
        return x + jnp.concatenate([xi, hw, w, h], axis=-1)


class MsMlp(nn.Module):
    """MS_MLP (reference decoder.py:2232-2262)."""
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Dense(self.hidden, kernel_init=trunc_normal(),
                     dtype=self.dtype, name="fc1")(x)
        x = fast_gelu(x)
        x = InceptionDWConv2dBands(name="multiscale_conv")(x)
        return nn.Dense(c, kernel_init=trunc_normal(), dtype=self.dtype,
                        name="fc2")(x)


class Mlp(nn.Module):
    """Plain fc1 -> act -> fc2 (reference ss2d.py:99-117)."""
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Dense(self.hidden, kernel_init=trunc_normal(),
                     dtype=self.dtype, name="fc1")(x)
        x = fast_gelu(x)
        return nn.Dense(c, kernel_init=trunc_normal(), dtype=self.dtype,
                        name="fc2")(x)


class VSSBlock(nn.Module):
    """x + DropPath(SS2D(LN(x))); x + DropPath(MLP(LN2(x)))."""
    dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 1
    ssm_ratio: float = 1.0
    ssm_conv: int = 3
    ssm_conv_bias: bool = False
    forward_type: str = "v05_noz"
    mlp_ratio: float = 4.0
    mlp_type: str = "ms"            # "ms" (MS_MLP) | "plain"
    post_norm: bool = False
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.ssm_ratio > 0:
            op = SS2D(d_model=self.dim, d_state=self.ssm_d_state,
                      ssm_ratio=self.ssm_ratio, d_conv=self.ssm_conv,
                      conv_bias=self.ssm_conv_bias,
                      forward_type=self.forward_type,
                      scan_backend=self.scan_backend, dtype=self.dtype,
                      name="op")
            norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                name="norm")
            if self.post_norm:
                y = norm(op(x).astype(jnp.float32)).astype(self.dtype)
            else:
                y = op(norm(x.astype(jnp.float32)).astype(self.dtype))
            x = x + DropPath(self.drop_path, name="drop_path1")(
                y, deterministic)
        if self.mlp_ratio > 0:
            hidden = int(self.dim * self.mlp_ratio)
            xn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="norm2")(
                x.astype(jnp.float32)).astype(self.dtype)
            mlp_cls = MsMlp if self.mlp_type == "ms" else Mlp
            m = mlp_cls(hidden=hidden, dtype=self.dtype, name="mlp")(xn)
            x = x + DropPath(self.drop_path, name="drop_path2")(
                m, deterministic)
        return x


class MSVSS(nn.Module):
    """VSSBlock stack, live decoder config (reference decoder.py:2371-2420)."""
    dim: int
    depth: int
    drop_paths: Sequence[float] = (0.0,)
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for d in range(self.depth):
            dp = (self.drop_paths[d] if d < len(self.drop_paths)
                  else self.drop_paths[-1])
            x = VSSBlock(dim=self.dim, drop_path=float(dp),
                         scan_backend=self.scan_backend, dtype=self.dtype,
                         name=f"block{d}")(x, deterministic)
        return x


class LKPE(nn.Module):
    """Large-kernel patch expand 2x (reference decoder.py:2572-2597):
    conv1x1 (C -> 2C) + BN + ReLU + dw3x3, pixel-shuffle to C/2 @ 2x, LN."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.dim * 2
        x = nn.Conv(c2, (1, 1), kernel_init=conv_fan_out_normal(),
                    dtype=self.dtype, name="expand0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x).astype(self.dtype)
        x = dw_conv(c2, 3, name="expand1")(x)
        B, H, W, C = x.shape
        # rearrange "(p1 p2 c)" -> spatial (h p1) (w p2), c = C/4
        c_out = C // 4
        x = x.reshape(B, H, W, 2, 2, c_out)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 2, W * 2, c_out)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)).astype(self.dtype)


class FLKPE(nn.Module):
    """Final 4x expand + classifier head (reference decoder.py:2599-2633)."""
    dim: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c16 = self.dim * 16
        x = nn.Conv(c16, (1, 1), kernel_init=conv_fan_out_normal(),
                    dtype=self.dtype, name="expand0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x).astype(self.dtype)
        x = dw_conv(c16, 3, name="expand1")(x)
        B, H, W, C = x.shape
        c_out = C // 16
        x = x.reshape(B, H, W, 4, 4, c_out)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 4, W * 4, c_out)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)).astype(self.dtype)
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=conv_fan_out_normal(), dtype=self.dtype,
                       name="out")(x)


class UpBlock(nn.Module):
    """LKPE -> concat skip -> 1x1 proj -> MSVSS (reference
    decoder.py:2635-2653)."""
    out_channels: int
    depth: int
    drop_paths: Sequence[float]
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = LKPE(dim=x.shape[-1], dtype=self.dtype, name="up")(x, train)
        x = jnp.concatenate([x, skip], axis=-1)
        x = nn.Dense(self.out_channels, kernel_init=trunc_normal(),
                     dtype=self.dtype, name="concat_layer")(x)
        return MSVSS(dim=self.out_channels, depth=self.depth,
                     drop_paths=self.drop_paths,
                     scan_backend=self.scan_backend, dtype=self.dtype,
                     name="vss_layer")(x, deterministic=not train)


class LegacyDecoder(nn.Module):
    """The published MSVM-UNet decoder (reference decoder.py:2655-2683).
    ``dims`` is the reversed encoder pyramid, e.g. [768, 384, 192, 96]."""
    dims: Sequence[int]
    num_classes: int
    depths: Sequence[int] = (2, 2, 2, 2)
    drop_path_rate: float = 0.2
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        dims = list(self.dims)
        dpr = np.linspace(self.drop_path_rate, 0.0, (len(dims) - 1) * 2)
        x = feats[0]
        for i in range(1, len(dims)):
            lo = sum(self.depths[:i - 1])
            hi = sum(self.depths[:i])
            x = UpBlock(out_channels=dims[i], depth=self.depths[i],
                        drop_paths=list(dpr[lo:hi]) or [0.0],
                        scan_backend=self.scan_backend, dtype=self.dtype,
                        name=f"layer{i - 1}")(x, feats[i], train)
        return FLKPE(dim=dims[-1], num_classes=self.num_classes,
                     dtype=self.dtype, name="out_layer")(x, train)


# ---------------------------------------------------------------------------
# VSSM backbone
# ---------------------------------------------------------------------------

class PatchMerging2D(nn.Module):
    """Downsample v1 (reference ss2d.py:49-87): space-to-depth concat
    [x00, x10, x01, x11] -> LN(4C) -> Linear(4C -> 2C | out, no bias)."""
    out_dim: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)).astype(self.dtype)
        out = self.out_dim if self.out_dim > 0 else 2 * C
        return nn.Dense(out, use_bias=False, kernel_init=trunc_normal(),
                        dtype=self.dtype, name="reduction")(x)


VSSM_CONFIGS = {
    # test-only miniature (fast CI compiles); not a reference config
    "vssm_test": dict(dims=(16, 32, 48, 64), depths=(1, 1, 1, 1),
                      drop_path_rate=0.0),
    "tiny_0230s": dict(dims=(96, 192, 384, 768), depths=(2, 2, 8, 2),
                       drop_path_rate=0.2),
    "small_0229s": dict(dims=(96, 192, 384, 768), depths=(2, 2, 20, 2),
                        drop_path_rate=0.3),
}


class VSSM(nn.Module):
    """VMamba backbone (live config flavor: ssm d_state=1 ratio=1 conv_bias
    False forward_type v05_noz, patchembed v2, downsample v3, ln2d norms,
    plain MLP ratio 4). Returns [stage1..stage4] features channel-last —
    the reference's leading raw-input entry (vmamba.py:1626) is omitted;
    its Encoder wrapper (model/encoder.py:9-55) drops it anyway."""
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 8, 2)
    drop_path_rate: float = 0.2
    patchembed_version: str = "v2"
    downsample_version: str = "v3"
    posembed: bool = False
    forward_type: str = "v05_noz"
    ssm_d_state: int = 1
    ssm_ratio: float = 1.0
    ssm_conv_bias: bool = False
    mlp_ratio: float = 4.0
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d0 = self.dims[0]
        if self.patchembed_version == "v2":
            x = nn.Conv(d0 // 2, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=trunc_normal(), dtype=self.dtype,
                        name="patch_embed0")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="patch_norm0")(
                x.astype(jnp.float32)).astype(self.dtype)
            x = fast_gelu(x)
            x = nn.Conv(d0, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        kernel_init=trunc_normal(), dtype=self.dtype,
                        name="patch_embed1")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="patch_norm1")(
                x.astype(jnp.float32)).astype(self.dtype)
        else:
            x = nn.Conv(d0, (4, 4), strides=(4, 4), padding="VALID",
                        kernel_init=trunc_normal(), dtype=self.dtype,
                        name="patch_embed0")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="patch_norm0")(
                x.astype(jnp.float32)).astype(self.dtype)

        if self.posembed:
            B, H, W, C = x.shape
            pe = self.param("pos_embed", trunc_normal(), (1, H, W, C))
            x = x + pe.astype(self.dtype)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        feats = []
        for i, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            for d in range(depth):
                x = VSSBlock(dim=dim, drop_path=float(dpr[cur + d]),
                             ssm_d_state=self.ssm_d_state,
                             ssm_ratio=self.ssm_ratio,
                             ssm_conv_bias=self.ssm_conv_bias,
                             forward_type=self.forward_type,
                             mlp_ratio=self.mlp_ratio, mlp_type="plain",
                             scan_backend=self.scan_backend,
                             dtype=self.dtype,
                             name=f"layer{i}_block{d}")(
                    x, deterministic=not train)
            cur += depth
            feats.append(x)
            if i < len(self.dims) - 1:
                if self.downsample_version == "v1":
                    x = PatchMerging2D(out_dim=self.dims[i + 1],
                                       dtype=self.dtype,
                                       name=f"downsample{i}")(x)
                else:
                    k, pad = ((2, "VALID") if self.downsample_version == "v2"
                              else (3, [(1, 1), (1, 1)]))
                    x = nn.Conv(self.dims[i + 1], (k, k), strides=(2, 2),
                                padding=pad, kernel_init=trunc_normal(),
                                dtype=self.dtype,
                                name=f"downsample{i}_conv")(x)
                    x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                     name=f"downsample{i}_norm")(
                        x.astype(jnp.float32)).astype(self.dtype)
        return feats


def build_vssm(name: str = "tiny_0230s", **overrides) -> VSSM:
    cfg = dict(VSSM_CONFIGS[name])
    cfg.update(overrides)
    return VSSM(**cfg)


class MSVMUNetLegacy(nn.Module):
    """The upstream MSVM-UNet: VSSM encoder + legacy decoder (reference
    Encoder + Decoder wiring, model/encoder.py:9-55 + decoder.py:2655)."""
    num_classes: int = 9
    enc_name: str = "tiny_0230s"
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        cfg = VSSM_CONFIGS[self.enc_name]
        feats = VSSM(scan_backend=self.scan_backend, dtype=self.dtype,
                     name="encoder", **cfg)(x.astype(self.dtype), train)
        dims = list(cfg["dims"])[::-1]
        return LegacyDecoder(dims=dims, num_classes=self.num_classes,
                             scan_backend=self.scan_backend,
                             dtype=self.dtype, name="decoder")(
            feats[::-1], train)
