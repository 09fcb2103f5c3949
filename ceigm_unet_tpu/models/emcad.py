"""EMCAD decoder — efficient multi-scale convolutional-attention decoding.

TPU-native (channel-last) rebuild of the reference decoder
(gm-unet/model/best_decoder.py:469-590) with identical dataflow:

    per scale (coarse -> fine):
      SplitChannelsOddEven -> LightweightParallelAttentionFusion ->
      DySample 2x (dynamic bilinear resample + EUCB pointwise) ->
      LGAG attention gate on the skip -> additive aggregation ->
      Front (mamba-block refinement stack)
    head: 1x1 conv at the finest scale + 4x bilinear upsample.

Reference quirks preserved for weight/metric parity (SURVEY.md §7):
- LGAG computes both gate paths from ``g``; the skip enters only as
  ``x * psi`` (best_decoder.py:126-136).
- DySample's base grid is perturbed by ``sin(pi * (i+1)/S)``
  (best_decoder.py:393-394).
- EUCB2's channel shuffle uses groups == channels (identity permutation).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ceigm_unet_tpu.models.layers import channel_shuffle, bilinear_upsample
from ceigm_unet_tpu.models.groupmamba import BlockMamba
from ceigm_unet_tpu.ops.grid_sample import dysample_grid_sample
from ceigm_unet_tpu.utils.initializers import normal, torch_linear_default


def _conv(f, k, name, *, groups=1, bias=True, dilation=1, std=0.02,
          dtype=jnp.float32):
    """Decoder conv with the reference 'normal' init scheme
    (best_decoder.py:20-25: normal(std=.02), zero bias)."""
    return nn.Conv(f, (k, k), padding="SAME", feature_group_count=groups,
                   use_bias=bias, kernel_dilation=(dilation, dilation),
                   kernel_init=normal(std), dtype=dtype, name=name)


class _ConvP(nn.Module):
    """Parameter holder with nn.Conv-compatible names (kernel/bias)."""
    k: int
    cin_g: int
    cout: int

    def setup(self):
        self.kernel = self.param("kernel", normal(0.02),
                                 (self.k, self.k, self.cin_g, self.cout))
        self.bias = self.param("bias", nn.initializers.zeros, (self.cout,))


class _BNP(nn.Module):
    """Parameter/stat holder with nn.BatchNorm-compatible names."""
    c: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.c,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.c,))
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((self.c,), jnp.float32))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones((self.c,), jnp.float32))

    def __call__(self, x, train: bool):
        xf = x.astype(jnp.float32)
        if train:
            mu = jnp.mean(xf, axis=(0, 1, 2))
            vr = jnp.var(xf, axis=(0, 1, 2))
            if not self.is_initializing():
                self.mean.value = 0.9 * self.mean.value + 0.1 * mu
                self.var.value = 0.9 * self.var.value + 0.1 * vr
        else:
            mu, vr = self.mean.value, self.var.value
        return ((xf - mu) * jax.lax.rsqrt(vr + 1e-5)
                * self.scale + self.bias)


class LGAG(nn.Module):
    """Large-kernel grouped attention gate (reference best_decoder.py:86-136).

    Multi-kernel (1/3/5) grouped convs; one shared BatchNorm applied to both
    branch sums; psi = sigmoid(BN(conv1x1(act(gs + xs)))); returns x * psi.
    Both branches read ``g`` (reference quirk).

    Eval mode runs as ONE fused tap-conv Pallas kernel (BN folded,
    ops/tapconv.py): XLA's grouped-conv lowering for the 2-in-1-out groups
    profiled ~3 ms across the three decoder gates. Training keeps the
    differentiable XLA path; both share one parameter tree (nn.Conv /
    nn.BatchNorm-compatible paths).
    """
    f_int: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        C = g.shape[-1]
        gsz = C // self.groups              # channels per group (2 live)
        names = ["W_g_1", "W_g_3", "W_g_5", "W_x_1", "W_x_3", "W_x_5"]
        ks = [1, 3, 5, 1, 3, 5]
        ps = [_ConvP(k=k, cin_g=gsz, cout=self.f_int, name=nm)
              for k, nm in zip(ks, names)]
        bn = _BNP(c=self.f_int, name="bn")
        psi_p = _ConvP(k=1, cin_g=self.f_int, cout=1, name="psi_conv")
        psi_bn = _BNP(c=1, name="psi_bn")

        import os
        fuse = (jax.devices()[0].platform == "tpu" and not train
                and gsz == 2 and self.f_int * 2 == C
                and os.environ.get("CEIGM_LGAG", "1") == "1")
        if fuse:
            from ceigm_unet_tpu.ops.tapconv import lgag_gate_eval
            return lgag_gate_eval(
                g, x, [(p.kernel, p.bias) for p in ps],
                dict(scale=bn.scale, bias=bn.bias, mean=bn.mean.value,
                     var=bn.var.value),
                psi_p.kernel, psi_p.bias,
                dict(scale=psi_bn.scale, bias=psi_bn.bias,
                     mean=psi_bn.mean.value, var=psi_bn.var.value))

        def gconv(p):
            kern = p.kernel.astype(self.dtype)
            gd = g.astype(self.dtype)
            if gsz == 2 and kern.shape[0] > 1 and self.groups == self.f_int:
                # 2-in->1-out grouped conv as TWO depthwise convs summed:
                # group i reads channels (2i, 2i+1), so
                #   grouped(g, w) = dw(g[...,0::2], w[:,:,0]) +
                #                   dw(g[...,1::2], w[:,:,1]).
                # GSPMD partitions depthwise (groups==C) and dense convs
                # over a batch-sharded mesh but ALL-GATHERS the batch for
                # 1<groups<C windowed convs (probed on the 8-dev CPU
                # mesh, r5; tests/test_dp_inference.py guards this) — and
                # XLA's group-size-2 lowering is also the slow case the
                # eval-mode tapconv kernel exists to avoid.
                dw = lambda x, k: jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME",
                    feature_group_count=self.groups,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return (dw(gd[..., 0::2], kern[:, :, 0:1, :])
                        + dw(gd[..., 1::2], kern[:, :, 1:2, :])
                        + p.bias.astype(self.dtype))
            return jax.lax.conv_general_dilated(
                gd, kern, (1, 1), "SAME",
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + \
                p.bias.astype(self.dtype)

        gs = bn(gconv(ps[0]) + gconv(ps[1]) + gconv(ps[2]), train)
        xs = bn(gconv(ps[3]) + gconv(ps[4]) + gconv(ps[5]), train)
        psi = nn.relu(gs + xs).astype(self.dtype)
        psi = jax.lax.conv_general_dilated(
            psi, psi_p.kernel.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + \
            psi_p.bias.astype(self.dtype)
        psi = psi_bn(psi, train)
        return x * nn.sigmoid(psi).astype(self.dtype)


class MultiScaleCAB(nn.Module):
    """Channel attention with avg/max/min global-pool branches
    (reference OptimizedMultiScaleCAB2, best_decoder.py:193-247).

    reduced channels rc = smallest divisor of C that is >= C // 16 // 3.
    Output: sigmoid(fc(concat(branches)) + x) — a full-resolution map.
    """
    channels: int
    ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def reduced_channels(c: int, ratio: int = 16) -> int:
        factor = max(1, c // ratio // 3)
        while c % factor != 0:
            factor += 1
        return factor

    @nn.compact
    def __call__(self, x):
        c = self.channels
        rc = self.reduced_channels(c, self.ratio)
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        mn = jnp.min(x, axis=(1, 2), keepdims=True)

        avg_o = _conv(rc, 1, "conv1", bias=False, dtype=self.dtype)(avg)
        mx_o = _conv(rc, 1, "conv2_1", groups=rc, bias=False,
                     dtype=self.dtype)(mx)
        mx_o = _conv(rc, 1, "conv2_2", groups=rc, bias=False,
                     dtype=self.dtype)(mx_o)
        mn_o = _conv(rc, 1, "conv3", bias=False, dtype=self.dtype)(mn)

        comb = jnp.concatenate([avg_o, mx_o, mn_o], axis=-1)
        att = _conv(c, 1, "fc", bias=False, dtype=self.dtype)(comb)
        return nn.sigmoid(att + x)


class SAB(nn.Module):
    """Spatial attention: channel mean/max maps -> conv 3/7/11 sum -> sigmoid
    (reference ImprovedSAB, best_decoder.py:250-277)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        cat = jnp.concatenate([avg, mx], axis=-1)
        s = (_conv(1, 3, "conv3", bias=False, dtype=self.dtype)(cat)
             + _conv(1, 7, "conv7", bias=False, dtype=self.dtype)(cat)
             + _conv(1, 11, "conv11", bias=False, dtype=self.dtype)(cat))
        return nn.sigmoid(s)


class ParallelAttentionFusion(nn.Module):
    """Channel attention on x1 ∥ spatial attention on x2, arctan-mixed,
    fused by a learned sigmoid gate (reference
    LightweightParallelAttentionFusion, best_decoder.py:280-322)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        ca = MultiScaleCAB(channels=self.channels, dtype=self.dtype,
                           name="channel_attention")(x1)
        sa = SAB(dtype=self.dtype, name="spatial_attention")(x2)

        p = self.param("mix", nn.initializers.zeros, (1,))
        ca_w = 0.5 + jnp.arctan(jnp.pi * p) / jnp.pi
        sa_w = 1.0 - ca_w

        ca_out = x1 * ca * ca_w.astype(x1.dtype)
        sa_out = x2 * sa * sa_w.astype(x2.dtype)
        fusion = jnp.concatenate([ca_out, sa_out], axis=-1)
        fusion = _conv(self.channels, 1, "final_conv", dtype=self.dtype)(fusion)
        return (x1 + x2) * nn.sigmoid(fusion)


class SplitChannelsOddEven(nn.Module):
    """Odd/even channel interleave split through one shared 1x1 conv
    (C/2 -> C), reference best_decoder.py:327-346."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cw = _conv(self.channels, 1, "cw", dtype=self.dtype)
        return cw(x[..., 0::2]), cw(x[..., 1::2])


class EUCB2(nn.Module):
    """Depthwise conv + BN + ReLU -> (identity) channel shuffle -> pointwise
    conv to the next pyramid width (reference best_decoder.py:421-445)."""
    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(self.in_channels, 3, "up_dwc", groups=self.in_channels,
                  bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x).astype(self.dtype)
        x = channel_shuffle(x, self.in_channels)  # identity at groups == C
        return _conv(self.out_channels, 1, "pwc", dtype=self.dtype)(x)


class DySample(nn.Module):
    """Dynamic 2x upsampler ("lp" style, groups=4) + EUCB pointwise stage
    (reference best_decoder.py:363-418).

    The offset head predicts per-subpixel sampling offsets; the base grid is
    ``i + sin(pi * (i+1) / S)`` (reference quirk), sampled bilinearly with
    border padding over 4 consecutive channel groups.
    """
    in_channels: int
    out_channels: int
    scale: int = 2
    groups: int = 4
    dtype: jnp.dtype = jnp.float32

    def _init_pos(self) -> np.ndarray:
        """(2, groups, s, s): channel (a, g, j, i) = base[i] for a=0 (x),
        base[j] for a=1 (y). Matches reference _init_pos ordering
        (best_decoder.py:385-387)."""
        s = self.scale
        base = (np.arange((-s + 1) / 2, (s - 1) / 2 + 1) / s).astype(
            np.float32)
        pos = np.zeros((2, self.groups, s, s), np.float32)
        pos[0] = base[None, None, :]    # x varies with subpixel column i
        pos[1] = base[None, :, None]    # y varies with subpixel row j
        return pos

    @nn.compact
    def __call__(self, x, train: bool = False):
        s, g = self.scale, self.groups
        B, H, W, C = x.shape
        oc = 2 * g * s * s

        off = _conv(oc, 1, "offset0", std=1e-3, dtype=self.dtype)(x)
        off = nn.Conv(oc, (3, 3), padding="SAME", kernel_dilation=(2, 2),
                      use_bias=False, kernel_init=normal(1e-3),
                      dtype=self.dtype, name="offset1")(off)
        init_pos = jnp.asarray(self._init_pos().reshape(-1))
        off = off / g + init_pos.astype(off.dtype)

        # (B, H, W, 2, g, s, s) -> subpixel expansion
        off = off.reshape(B, H, W, 2, g, s, s)

        # base grid with the sin perturbation (reference :393-394)
        bw = jnp.arange(W, dtype=jnp.float32) + jnp.sin(
            jnp.pi * jnp.arange(1, W + 1, dtype=jnp.float32) / W)
        bh = jnp.arange(H, dtype=jnp.float32) + jnp.sin(
            jnp.pi * jnp.arange(1, H + 1, dtype=jnp.float32) / H)

        cx = bw[None, None, :, None, None, None] + off[..., 0, :, :, :]
        cy = bh[None, :, None, None, None, None] + off[..., 1, :, :, :]
        # normalize to [-1, 1] (align_corners=False convention)
        cx = 2.0 * cx / W - 1.0
        cy = 2.0 * cy / H - 1.0

        # pixel-shuffle (j, i) subpixels into space:
        # (B, H, W, g, s, s) -> (B, H*s, W*s, g)
        def shuffle(c):
            c = c.transpose(0, 1, 4, 2, 5, 3)  # B, H, j, W, i, g
            return c.reshape(B, H * s, W * s, g)

        gx = shuffle(cx)
        gy = shuffle(cy)
        grid = jnp.stack([gx, gy], axis=-1)  # (B, Hs, Ws, g, 2)

        # sample each of g consecutive channel groups with its own grid;
        # on the banded TPU path the group loop runs inside the kernel
        # (no regroup transposes), else it regroups + samples per group
        out = dysample_grid_sample(x, grid)

        return EUCB2(in_channels=C, out_channels=self.out_channels,
                     dtype=self.dtype, name="eu")(out, train)


class Front(nn.Module):
    """Mamba-block refinement stack (reference Front/cm,
    best_decoder.py:447-465 + model/gm/custom_module.py:36-61):
    Block_mamba x depth with the custom (inception-dw) FFN, drop-path
    linspace(0.2 -> 0) across the 7 decoder blocks."""
    dim: int
    depth: int
    drop_paths: Sequence[float]
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = BlockMamba(dim=self.dim, mlp_ratio=4.0,
                           drop_path=float(self.drop_paths[i]),
                           use_custom_ffn=True, norm_eps=1e-5,
                           scan_backend=self.scan_backend, dtype=self.dtype,
                           name=f"block{i}")(x, deterministic=not train)
        return x


class EMCAD(nn.Module):
    """The full decoder (reference best_decoder.py:469-590).

    ``channels`` is the reversed encoder pyramid, e.g. [448, 348, 128, 64].
    Input: list of 4 channel-last features [coarse..fine]; output: logits
    upsampled 4x from the finest scale.
    """
    channels: Sequence[int] = (448, 348, 128, 64)
    num_classes: int = 9
    drop_path_rate: float = 0.2
    front_depths: Sequence[int] = (3, 2, 2)
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ch = list(self.channels)
        x, skips = feats[0], [feats[1], feats[2], feats[3]]

        total = sum(self.front_depths)
        dpr = np.linspace(self.drop_path_rate, 0.0, total)
        dp_slices = []
        off = 0
        for d in self.front_depths:
            dp_slices.append(dpr[off:off + d])
            off += d

        def mscam(d, c, idx):
            c1, s1 = SplitChannelsOddEven(channels=c, dtype=self.dtype,
                                          name=f"cc{idx}")(d)
            return ParallelAttentionFusion(channels=c, dtype=self.dtype,
                                           name=f"para{idx}")(c1, s1)

        d4 = mscam(x, ch[0], 4)

        d3 = DySample(in_channels=ch[0], out_channels=ch[1],
                      dtype=self.dtype, name="eucb3")(d4, train)
        x3 = LGAG(f_int=ch[1] // 2, groups=ch[1] // 2, dtype=self.dtype,
                  name="lgag3")(d3, skips[0], train)
        d3 = Front(dim=ch[1], depth=self.front_depths[0],
                   drop_paths=dp_slices[0], scan_backend=self.scan_backend,
                   dtype=self.dtype, name="f1")(d3 + x3, train)
        d3 = mscam(d3, ch[1], 3)

        d2 = DySample(in_channels=ch[1], out_channels=ch[2],
                      dtype=self.dtype, name="eucb2")(d3, train)
        x2 = LGAG(f_int=ch[2] // 2, groups=ch[2] // 2, dtype=self.dtype,
                  name="lgag2")(d2, skips[1], train)
        d2 = Front(dim=ch[2], depth=self.front_depths[1],
                   drop_paths=dp_slices[1], scan_backend=self.scan_backend,
                   dtype=self.dtype, name="f2")(d2 + x2, train)
        d2 = mscam(d2, ch[2], 2)

        d1 = DySample(in_channels=ch[2], out_channels=ch[3],
                      dtype=self.dtype, name="eucb1")(d2, train)
        x1 = LGAG(f_int=ch[3] // 2, groups=ch[3] // 2, dtype=self.dtype,
                  name="lgag1")(d1, skips[2], train)
        d1 = Front(dim=ch[3], depth=self.front_depths[2],
                   drop_paths=dp_slices[2], scan_backend=self.scan_backend,
                   dtype=self.dtype, name="f3")(d1 + x1, train)
        d1 = mscam(d1, ch[3], 1)

        p1 = nn.Conv(self.num_classes, (1, 1),
                     kernel_init=torch_linear_default(), dtype=self.dtype,
                     name="out_head1")(d1)
        # logits stay in the model compute dtype: an fp32 upcast BEFORE
        # the 4x upsample materialized a 115 MB f32[B,224,224,9] plane
        # plus a 0.4 ms XLA layout copy at the jit output boundary (r3
        # HLO trace) without adding information (p1 is already compute-
        # dtype). Losses/metrics upcast internally (losses.py:51).
        return bilinear_upsample(p1, 4)
