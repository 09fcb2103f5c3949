"""GroupMamba hierarchical encoder (channel-last / NHWC).

TPU rebuild of the reference encoder (gm-unet/model/gm/groupmamba.py):
Stem (stride-4) -> 4 stages of [patch-embed, Block_mamba x depth, LN],
returning the 4-level feature pyramid. Differences from the torch original
are layout-only: everything stays (B, H, W, C) — no token flatten/unflatten
round-trips — and the 4 per-group SS2D scans are fused (see
:class:`~ceigm_unet_tpu.models.ss2d.QuadGroupSS2D`).

Configs (reference groupmamba.py:457-491 + model/gm/__init__.py:14-20):
    tiny : stem 32, dims [64, 128, 348, 448], depths [3, 4, 9, 3]
    small: stem 64, dims [64, 128, 348, 512], depths [3, 4, 16, 3]
    base : stem 64, dims [96, 192, 424, 512], depths [3, 6, 21, 3]
with mlp_ratios [8, 8, 4, 4].
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
from ceigm_unet_tpu.models.layers import DropPath, Pvt2Ffn, CustomFfn
from ceigm_unet_tpu.utils.initializers import (
    trunc_normal, conv_fan_out_normal)


class GroupMambaLayer(nn.Module):
    """Modulated group mamba (reference groupmamba.py:85-159).

    LN -> channel-affinity SE -> fused quad-group SS2D * skip_scale * x
    -> channel modulation -> LN (same parameters as the first LN — a
    reference quirk preserved for weight parity, groupmamba.py:131,156)
    -> Linear proj.
    """
    dim: int
    d_state: int = 1
    expand: float = 1.0
    d_conv: int = 3
    reduction: int = 16
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C)."""
        norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")
        xn = norm(x.astype(jnp.float32)).astype(self.dtype)

        # channel affinity: global average over tokens -> squeeze-excite
        zc = jnp.mean(xn, axis=(1, 2))  # (B, C)
        zc = nn.Dense(self.dim // self.reduction,
                      kernel_init=trunc_normal(), dtype=self.dtype,
                      name="fc1")(zc)
        zc = nn.relu(zc)
        zc = nn.Dense(self.dim, kernel_init=trunc_normal(),
                      dtype=self.dtype, name="fc2")(zc)
        affinity = nn.sigmoid(zc)[:, None, None, :]   # (B, 1, 1, C)

        skip_scale = self.param("skip_scale", nn.initializers.ones, (1,))

        y = QuadGroupSS2D(dim=self.dim, d_state=self.d_state,
                          ssm_ratio=self.expand, d_conv=self.d_conv,
                          scan_backend=self.scan_backend, dtype=self.dtype,
                          name="mamba")(xn)
        y = y * skip_scale.astype(self.dtype) * xn
        y = y * affinity
        y = norm(y.astype(jnp.float32)).astype(self.dtype)
        return nn.Dense(self.dim, kernel_init=trunc_normal(),
                        dtype=self.dtype, name="proj")(y)


class BlockMamba(nn.Module):
    """Pre-norm residual block (reference Block_mamba, groupmamba.py:191-226):
    x + DropPath(GroupMambaLayer(x)); x + DropPath(FFN(LN(x)))."""
    dim: int
    mlp_ratio: float
    drop_path: float = 0.0
    use_custom_ffn: bool = False
    norm_eps: float = 1e-5  # encoder passes 1e-6 (ref groupmamba.py:463)
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        """x: (B, H, W, C)."""
        attn = GroupMambaLayer(dim=self.dim, scan_backend=self.scan_backend,
                               dtype=self.dtype, name="attn")(x)
        x = x + DropPath(self.drop_path, name="drop_path1")(
            attn, deterministic)
        xn = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32,
                          name="norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        hidden = int(self.dim * self.mlp_ratio)
        ffn = CustomFfn if self.use_custom_ffn else Pvt2Ffn
        m = ffn(hidden=hidden, dtype=self.dtype, name="mlp")(xn)
        return x + DropPath(self.drop_path, name="drop_path2")(
            m, deterministic)


class Stem(nn.Module):
    """Stride-4 convolutional stem (reference groupmamba.py:257-305):
    conv7x7 s2 (BN, ReLU) -> 2x conv3x3 (BN, ReLU) -> conv3x3 s2 -> LN."""
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # torch pads symmetrically (k//2); XLA "SAME" is asymmetric under
        # stride 2, so strided convs use explicit torch-style padding.
        conv = lambda f, k, s, nm: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, kernel_init=conv_fan_out_normal(),
            dtype=self.dtype, name=nm)
        bn = lambda nm: nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=jnp.float32, name=nm)
        x = nn.relu(bn("bn1")(conv(self.hidden_dim, 7, 2, "conv1")(x)))
        x = nn.relu(bn("bn2")(conv(self.hidden_dim, 3, 1, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(self.hidden_dim, 3, 1, "conv3")(x)))
        x = nn.Conv(self.out_dim, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)],
                    kernel_init=conv_fan_out_normal(), dtype=self.dtype,
                    name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)).astype(self.dtype)


class DownSample(nn.Module):
    """conv3x3 s2 + LN (reference DownSamples, groupmamba.py:228-255)."""
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = nn.Conv(self.out_dim, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)],
                    kernel_init=conv_fan_out_normal(), dtype=self.dtype,
                    name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)).astype(self.dtype)


GROUPMAMBA_CONFIGS = {
    # test-only miniature (fast CI compiles); not a reference config
    "gm_test": dict(stem_hidden_dim=8, embed_dims=(16, 32, 48, 64),
                    mlp_ratios=(2, 2, 2, 2), depths=(1, 1, 1, 1)),
    "gm_tiny": dict(stem_hidden_dim=32, embed_dims=(64, 128, 348, 448),
                    mlp_ratios=(8, 8, 4, 4), depths=(3, 4, 9, 3)),
    "gm_small": dict(stem_hidden_dim=64, embed_dims=(64, 128, 348, 512),
                     mlp_ratios=(8, 8, 4, 4), depths=(3, 4, 16, 3)),
    "gm_base": dict(stem_hidden_dim=64, embed_dims=(96, 192, 424, 512),
                    mlp_ratios=(8, 8, 4, 4), depths=(3, 6, 21, 3)),
}


class GroupMamba(nn.Module):
    """4-stage GroupMamba backbone returning the feature pyramid
    [C1@H/4, C2@H/8, C3@H/16, C4@H/32], channel-last.

    Reference: GroupMamba.forward_features (groupmamba.py:401-437); stage-i
    trailing LayerNorm included (``norm{i}``).
    """
    stem_hidden_dim: int = 32
    embed_dims: Sequence[int] = (64, 128, 348, 448)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    depths: Sequence[int] = (3, 4, 9, 3)
    drop_path_rate: float = 0.0
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @property
    def dims(self):
        return list(self.embed_dims)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        feats = []
        for i, (dim, ratio, depth) in enumerate(
                zip(self.embed_dims, self.mlp_ratios, self.depths)):
            if i == 0:
                x = Stem(hidden_dim=self.stem_hidden_dim, out_dim=dim,
                         dtype=self.dtype, name="patch_embed1")(x, train)
            else:
                x = DownSample(out_dim=dim, dtype=self.dtype,
                               name=f"patch_embed{i + 1}")(x)
            for j in range(depth):
                x = BlockMamba(dim=dim, mlp_ratio=ratio,
                               drop_path=float(dpr[cur + j]),
                               norm_eps=1e-6,
                               scan_backend=self.scan_backend,
                               dtype=self.dtype,
                               name=f"block{i + 1}_{j}")(
                    x, deterministic=not train)
            cur += depth
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name=f"norm{i + 1}")(
                x.astype(jnp.float32)).astype(self.dtype)
            feats.append(x)
        return feats


def build_groupmamba(name: str = "gm_tiny", **overrides) -> GroupMamba:
    cfg = dict(GROUPMAMBA_CONFIGS[name])
    cfg.update(overrides)
    return GroupMamba(**cfg)
