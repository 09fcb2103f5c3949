"""SS2D — 2-D selective-scan modules (channel-last, TPU-first).

Two flavors cover the reference's live configurations:

- :class:`SS2D`: the VMamba-style op — K scan directions over the *full*
  channel set, stacked projection weights, one fused scan call.
  Reference: SS2Dv2.forward_corev2 (gm-unet/model/gm/ss2d.py:349-519,
  model/vmamba/vmamba.py:356-720). Supports the live forward-type tags
  ``v2`` (z-gate, fp32) and ``v05_noz`` (no z-gate, oflex fp32 out).
- :class:`QuadGroupSS2D`: the GroupMamba "modulated group mamba" inner op —
  channels split into 4 groups, group k scanned in direction k
  (reference: 4 separate SS2D modules + CrossScan_1..4,
  gm-unet/model/gm/groupmamba.py:99-146). On TPU each group runs through an
  in-place directional Pallas kernel (ops/quad_scan.py) that evaluates the
  whole d_state=1 selective-scan pipeline — softplus/decay/drive, two-level
  doubling scan in the group's pixel order, C*h+D*u, group-LayerNorm — in
  VMEM, and the K-grouped projections run as single block-diagonal dense
  GEMMs. The reference's CrossScan/CrossMerge layout machinery has no
  runtime counterpart at all (directions are baked into the kernels).

Weight layouts deliberately match the torch parameter stacking
(``x_proj_weight`` (K, R+2N, D), ``dt_projs_weight`` (K, D, R), ``A_logs``
(K*D, N), gm-unet/model/gm/ss2d.py:309-335) so checkpoint conversion is a
reshape-free copy.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ceigm_unet_tpu.ops.selective_scan import selective_scan
from ceigm_unet_tpu.ops.cross_scan import cross_scan_1d, cross_merge_1d
from ceigm_unet_tpu.utils.initializers import (
    trunc_normal, torch_linear_default, uniform_sym, dt_bias_init,
    s4d_a_log_init, conv_fan_out_normal_grouped)


def ssm_scan_core(
    xs: jnp.ndarray,            # (B, K, D, L) post-conv activations
    x_proj_w: jnp.ndarray,      # (K, R + 2N, D)
    dt_w: jnp.ndarray,          # (K, D, R)
    dt_b: jnp.ndarray,          # (K, D)
    A_logs: jnp.ndarray,        # (K * D, N)
    Ds: jnp.ndarray,            # (K * D,)
    d_state: int,
    dt_rank: int,
    backend: str = "auto",
) -> jnp.ndarray:
    """Project, scan, return ys (B, K, D, L) in fp32.

    Equivalent of forward_corev2's einsum path (ss2d.py:459-484), with the
    K direction/group axis folded into the scan's group dimension so the
    whole thing is ONE selective-scan invocation.
    """
    B_, K, D, L = xs.shape
    N = d_state
    R = dt_rank

    x_dbl = jnp.einsum("bkdl,kcd->bkcl", xs, x_proj_w)
    dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=2)
    dts = jnp.einsum("bkrl,kdr->bkdl", dts, dt_w)

    u = xs.reshape(B_, K * D, L)
    delta = dts.reshape(B_, K * D, L)
    A = -jnp.exp(A_logs.astype(jnp.float32))
    ys = selective_scan(
        u, delta, A, Bs, Cs, Ds, dt_b.reshape(-1),
        delta_softplus=True, backend=backend, out_dtype=jnp.float32)
    # opt-in debug guards (reference csms6s.py:231-235 / ss2d.py:488-493);
    # compile to nothing when the CEIGM_DEBUG_* env flags are off
    from ceigm_unet_tpu.utils.debug import check_nan_inf, capture
    ys = check_nan_inf("ssm_scan_core.ys", ys)
    capture("ssm_scan_core", us=xs, dts=dts, Bs=Bs, Cs=Cs, ys=ys)
    return ys.reshape(B_, K, D, L)


def _resolved_backend(backend: str) -> str:
    from ceigm_unet_tpu.ops.selective_scan import _resolve_backend
    return _resolve_backend(backend)


def _use_quad_nhwc(d_state: int, backend: str) -> bool:
    """Gate for the in-place NHWC directional-scan path (TPU default)."""
    import os
    return (os.environ.get("CEIGM_QUAD", "1") == "1"
            and d_state == 1
            and _resolved_backend(backend) == "pallas")


def quad_ssm_nhwc(xc_k: jnp.ndarray, p, R: int,
                  directions: Sequence[int]) -> jnp.ndarray:
    """d_state=1 SSM core with in-place directional scans (no layout ops).

    xc_k: (B, H, W, K, D) per-direction post-conv activations (for the
    grouped flavor these are the 4 channel groups; for the VMamba flavor
    the same channels repeated per direction). Returns y (B, H, W, K, D)
    fp32 — already in pixel order, so the reference's CrossMerge is a plain
    sum/stack at the caller.

    Replaces cross_scan_1d -> selective_scan -> cross_merge_1d: the
    (B, C, L) transposes and HBM flips of that pipeline (reference
    csms6s.py:56-206) are gone; the only non-elementwise op left is the
    Pallas two-level scan itself (ops/quad_scan.py).
    """
    from ceigm_unet_tpu.ops.quad_scan import sscan_dir
    B_, H, W, K, D = xc_k.shape
    L = H * W

    x_dbl = jnp.einsum("bhwkd,kcd->bhwkc", xc_k,
                       p.x_proj_weight.astype(xc_k.dtype))
    dts, Bs, Cs = jnp.split(x_dbl, [R, R + 1], axis=-1)
    dt = jnp.einsum("bhwkr,kdr->bhwkd", dts,
                    p.dt_projs_weight.astype(xc_k.dtype))

    A = -jnp.exp(p.A_logs.astype(jnp.float32)).reshape(K, D)
    bias = p.dt_projs_bias.astype(jnp.float32)
    Ds = p.Ds.astype(jnp.float32).reshape(K, D)

    def bc(x, i):  # (B,H,W,1) scalar B/C -> (B, L, D), autodiff sums back
        return jnp.broadcast_to(x[:, :, :, i], (B_, H, W, D)).reshape(
            B_, L, D)

    ys = [sscan_dir(xc_k[:, :, :, i].reshape(B_, L, D),
                    dt[:, :, :, i].reshape(B_, L, D),
                    bc(Bs, i), bc(Cs, i),
                    A[i], bias[i], Ds[i], H, W, int(k))
          for i, k in enumerate(directions)]
    y = jnp.stack(ys, axis=2).reshape(B_, H, W, K, D)
    from ceigm_unet_tpu.utils.debug import check_nan_inf
    return check_nan_inf("quad_ssm_nhwc.y", y)


def _quad_pergroup(xc, p, R, ln_scale, ln_bias, directions, H, W, D,
                   dtype, cat=False):
    """Per-group fused quad path (v3): dt/B/C projections as
    block-diagonal dense GEMMs, then one pallas launch per group scanning
    its (H, W*D) block in its own direction with the group-LN fused in
    the kernel (ops/quad_scan.py:sscan_quad_ln). B/C enter as per-pixel
    scalar maps, lane-expanded in-kernel. (The v5 planar all-direction
    kernel that A/B'd against this path lost on hardware — r3 — and was
    deleted in r5 after the batch-last sandwich superseded its goal;
    postmortem in docs/STATUS.md.)

    xc: (B, H, W, K*D) planar post conv+silu -> normalized (ungated)
    activation (B, K, L, D) in `dtype`, pixel-ordered (merge-free) — or
    lane-concatenated (B, L, K*D) with ``cat=True`` (skips the
    group-planar stack + swapaxes round trip on the output side).
    """
    from ceigm_unet_tpu.ops.quad_scan import (sscan_quad_ln,
                                              sscan_quad_ln_cat,
                                              sscan_quad_ln_cat_q8)
    K = len(directions)
    B_ = xc.shape[0]
    L = H * W
    xcf = xc.reshape(B_ * L, K * D)

    wx_bd = jax.scipy.linalg.block_diag(
        *[jnp.swapaxes(p.x_proj_weight[k], 0, 1) for k in range(K)]
    ).astype(dtype)                                 # (K*D, K*(R+2))
    x_dbl = (xcf @ wx_bd).reshape(B_, L, K, R + 2)
    dts, Bs, Cs = x_dbl[..., :R], x_dbl[..., R], x_dbl[..., R + 1]

    wdt_bd = jax.scipy.linalg.block_diag(
        *[jnp.swapaxes(p.dt_projs_weight[k], 0, 1) for k in range(K)]
    ).astype(dtype)                                 # (K*R, K*D)
    dt = dts.reshape(B_ * L, K * R) @ wdt_bd        # (B*L, K*D)

    A = -jnp.exp(p.A_logs.astype(jnp.float32)).reshape(K, D)
    bias = p.dt_projs_bias.astype(jnp.float32)
    Ds = p.Ds.astype(jnp.float32).reshape(K, D)
    Bt = jnp.swapaxes(Bs, 1, 2)                        # (B, K, L)
    Ct = jnp.swapaxes(Cs, 1, 2)

    if cat and _use_quant():
        # sub-bf16 activation-storage experiment (CEIGM_QUANT=1,
        # inference-only): quantize u/dt to int8 with dynamic per-lane
        # scales BEFORE the (B,L,K,D)->(B,K,L,D) transposes, so the
        # boundary relayout copies move half the bytes; the scan kernel
        # dequantizes in its fp32 prologue. Forward-only (int8 rounding
        # has no gradient) — bench/eval measurement path.
        def q8(t4):
            amax = jnp.max(jnp.abs(t4.astype(jnp.float32)), axis=(0, 1))
            scale = jnp.maximum(amax, 1e-6) / 127.0     # (K, D)
            q = jnp.clip(jnp.round(t4.astype(jnp.float32) / scale),
                         -127.0, 127.0).astype(jnp.int8)
            return q, scale
        uq, su = q8(xc.reshape(B_, L, K, D))
        dq, sdt = q8(dt.reshape(B_, L, K, D))

        # loud, descriptive failure under differentiation (the int8 scan
        # kernel has no VJP — without this guard training with
        # CEIGM_QUANT=1 dies in a pallas differentiation error deep in
        # the graph; advisor r4)
        @jax.custom_vjp
        def _q8_scan(uq, dq, su, sdt, Bt, Ct, A, bias, Ds, lns, lnb):
            return sscan_quad_ln_cat_q8(
                uq, dq, su, sdt, Bt, Ct, A, bias, Ds, (lns, lnb),
                H, W, tuple(int(d) for d in directions))

        def _q8_fwd(*args):
            return _q8_scan(*args), None

        def _q8_bwd(res, g):
            raise NotImplementedError(
                "CEIGM_QUANT=1 selects the int8 activation-storage scan "
                "path, which is inference-only (int8 rounding has no "
                "gradient). Unset CEIGM_QUANT to train.")

        _q8_scan.defvjp(_q8_fwd, _q8_bwd)
        y = _q8_scan(jnp.swapaxes(uq, 1, 2), jnp.swapaxes(dq, 1, 2),
                     su, sdt, Bt, Ct, A, bias, Ds, ln_scale, ln_bias)
        from ceigm_unet_tpu.utils.debug import check_nan_inf
        return check_nan_inf("quad_pergroup.y", y)

    if cat and _use_blast() == 1:
        # batch-LAST boundary (r5 layout restructure, CEIGM_BLAST=1):
        # the kernel consumes (K, D, L, B) — B in the lanes, where the
        # GEMM emitters already put it — instead of forcing the
        # (B, K, L, D) row-major relayout (ops/quad_scan_bl.py).
        from ceigm_unet_tpu.ops.quad_scan_bl import sscan_quad_ln_cat_bl
        u_bl = jnp.transpose(xc.reshape(B_, L, K, D), (2, 3, 1, 0))
        dt_bl = jnp.transpose(dt.reshape(B_, L, K, D), (2, 3, 1, 0))
        bs_bl = jnp.transpose(Bs, (2, 1, 0))           # (K, L, B)
        cs_bl = jnp.transpose(Cs, (2, 1, 0))
        y2 = sscan_quad_ln_cat_bl(u_bl, dt_bl, bs_bl, cs_bl, A, bias,
                                  Ds, (ln_scale, ln_bias), H, W,
                                  tuple(int(d) for d in directions))
        y = jnp.transpose(y2, (2, 1, 0))               # (B, L, K*D)
        from ceigm_unet_tpu.utils.debug import check_nan_inf
        return check_nan_inf("quad_pergroup.y", y)

    ut = jnp.swapaxes(xc.reshape(B_, L, K, D), 1, 2)   # (B, K, L, D)
    dtt = jnp.swapaxes(dt.reshape(B_, L, K, D), 1, 2)
    scan = sscan_quad_ln_cat if cat else sscan_quad_ln
    y = scan(ut, dtt, Bt, Ct, A, bias, Ds, (ln_scale, ln_bias),
             H, W, tuple(int(d) for d in directions))
    from ceigm_unet_tpu.utils.debug import check_nan_inf
    return check_nan_inf("quad_pergroup.y", y)


def _use_blast() -> int:
    """Level of the batch-last quad restructure (ops/quad_scan_bl.py;
    r5 verdict #1 experiment flag). CEIGM_BLAST: 0 off, 1 = batch-last
    KERNEL boundary only (transposes at the scan edges), 2 = the fully
    transposed sandwich — in-proj/dt GEMMs, dwconv, scan, gate and
    out-proj all computed in (C, L*B) space, so every operand sits in
    the tokens-minor physical layout XLA's emitters pick and only ONE
    entry/exit transpose per quad block remains. Differentiable at both
    levels (recompute custom VJPs).

    Returns -1 when the env is unset — the module then defaults to
    level 2 for batches >= 64 (lanes hold the batch: measured +4.3 ms
    at b128 224² bf16, r5) and 0 for small batches (the b8 512² regime
    would waste 15/16 of every lane tile)."""
    import os
    v = os.environ.get("CEIGM_BLAST", "")
    return int(v) if v.isdigit() else -1


def _use_quant() -> bool:
    """Gate (CEIGM_QUANT=1): int8 storage for the quad-boundary u/dt
    activations (the sub-bf16 storage experiment, r3 verdict #2).
    Inference-only — the quantization has no gradient."""
    import os
    return os.environ.get("CEIGM_QUANT", "0") == "1"


class _SSMParams(nn.Module):
    """Shared parameter bundle for the stacked SSM projections."""
    k: int
    d_inner: int
    d_state: int
    dt_rank: int

    def setup(self):
        K, D, N, R = self.k, self.d_inner, self.d_state, self.dt_rank
        self.x_proj_weight = self.param(
            "x_proj_weight", torch_linear_default_stacked(D), (K, R + 2 * N, D))
        self.dt_projs_weight = self.param(
            "dt_projs_weight", uniform_sym(R ** -0.5), (K, D, R))
        self.dt_projs_bias = self.param("dt_projs_bias", dt_bias_init(),
                                        (K, D))
        self.A_logs = self.param("A_logs", s4d_a_log_init(), (K * D, N))
        self.Ds = self.param("Ds", nn.initializers.ones, (K * D,))


def torch_linear_default_stacked(fan_in: int):
    """Torch nn.Linear default init for weights stored (out, in)-style."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SS2D(nn.Module):
    """VMamba-flavor SS2D: K directions over full channels, fused scan.

    ``forward_type`` live values: "v2" (z-gate) and "v05_noz" (no z-gate);
    the reference distinction SelectiveScanCore vs Oflex collapses here —
    every backend computes fp32 internally and emits fp32 pre-norm.
    """
    d_model: int
    d_state: int = 1
    ssm_ratio: float = 1.0
    dt_rank: str | int = "auto"
    d_conv: int = 3
    conv_bias: bool = True
    bias: bool = False
    forward_type: str = "v2"
    directions: Sequence[int] = (1, 2, 3, 4)
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, d_model)
        tag = self.forward_type
        disable_z = tag.endswith("_noz")
        d_inner = int(self.ssm_ratio * self.d_model)
        R = (math.ceil(self.d_model / 16) if self.dt_rank == "auto"
             else int(self.dt_rank))
        K = len(self.directions)
        B_, H, W, _ = x.shape
        L = H * W

        d_proj = d_inner if disable_z else 2 * d_inner
        xz = nn.Dense(d_proj, use_bias=self.bias, kernel_init=trunc_normal(),
                      dtype=self.dtype, name="in_proj")(x)
        if disable_z:
            xc, z = xz, None
        else:
            xc, z = jnp.split(xz, 2, axis=-1)
            z = nn.silu(z)

        if self.d_conv > 1:
            from ceigm_unet_tpu.models.layers import DwConv
            xc = DwConv(features=d_inner, kernel=self.d_conv,
                        use_bias=self.conv_bias, name="conv2d")(xc)
        xc = nn.silu(xc)

        p = _SSMParams(k=K, d_inner=d_inner, d_state=self.d_state,
                       dt_rank=R, name="ssm")

        if _use_quad_nhwc(self.d_state, self.scan_backend):
            # same channels fed to every direction; merge = sum (in place)
            xck = jnp.broadcast_to(xc[:, :, :, None, :],
                                   (B_, H, W, K, d_inner))
            yk = quad_ssm_nhwc(xck, p, R, self.directions)
            y = jnp.sum(yk, axis=3)                      # (B, H, W, D)
        else:
            xs = jnp.stack([cross_scan_1d(xc, k) for k in self.directions],
                           axis=1)  # (B, K, D, L)
            ys = ssm_scan_core(xs, p.x_proj_weight, p.dt_projs_weight,
                               p.dt_projs_bias, p.A_logs, p.Ds,
                               self.d_state, R, self.scan_backend)
            y = sum(cross_merge_1d(ys[:, i], k, H, W)
                    for i, k in enumerate(self.directions))  # sum-merge
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_norm")(y)
        y = y.astype(self.dtype)
        if z is not None:
            y = y * z
        return nn.Dense(self.d_model, use_bias=self.bias,
                        kernel_init=trunc_normal(), dtype=self.dtype,
                        name="out_proj")(y)


class QuadGroupSS2D(nn.Module):
    """Four channel-groups, each selective-scanned in its own direction —
    fused into one scan call (the TPU rebuild of GroupMambaLayer's
    mamba_g1..g4, gm-unet/model/gm/groupmamba.py:99-146).

    Input/Output: (B, H, W, C). Per-group d_model = C // 4, and with the
    live config (ssm_ratio=1) d_inner == d_model_per_group.
    """
    dim: int
    d_state: int = 1
    ssm_ratio: float = 1.0
    d_conv: int = 3
    conv_bias: bool = True
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32
    directions: Sequence[int] = (1, 2, 3, 4)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C)."""
        K = len(self.directions)
        dg = self.dim // K                      # per-group d_model
        d_inner = int(self.ssm_ratio * dg)
        Din = K * d_inner
        R = math.ceil(dg / 16)
        B_ = x.shape[0]
        H, W = x.shape[1:3]
        C = x.shape[-1]
        L = H * W

        quad_fast = _use_quad_nhwc(self.d_state, self.scan_backend)

        # per-group in_proj (stacked): (K, dg, 2*d_inner). Computed as ONE
        # dense block-diagonal matmul — the K-grouped einsum's tiny
        # (dg x 2*d_inner) contractions profile ~5x slower than a full
        # MXU-tiled (C x 2*Din) GEMM; the zero blocks are free FLOPs.
        w_in = self.param("in_proj_weight", trunc_normal(),
                          (K, dg, 2 * d_inner))
        w_xc_bd = jax.scipy.linalg.block_diag(
            *[w_in[k][:, :d_inner] for k in range(K)]).astype(self.dtype)
        w_z_bd = jax.scipy.linalg.block_diag(
            *[w_in[k][:, d_inner:] for k in range(K)]).astype(self.dtype)

        from ceigm_unet_tpu.models.layers import _DwParams
        dwp = _DwParams(self.d_conv, Din, use_bias=self.conv_bias,
                        name="conv2d")
        dwk = dwp.kernel
        dwb = dwp.bias if self.conv_bias else None

        p = _SSMParams(k=K, d_inner=d_inner, d_state=self.d_state,
                       dt_rank=R, name="ssm")
        ln_scale = self.param("out_norm_scale", nn.initializers.ones,
                              (K, d_inner))
        ln_bias = self.param("out_norm_bias", nn.initializers.zeros,
                             (K, d_inner))
        w_out = self.param("out_proj_weight", trunc_normal(),
                           (K, d_inner, dg))

        # sequence-parallel island (parallel/sp_context.py): under an
        # active sp_scan_island context the whole block runs H-sharded
        # through shard_map — the ring scan covers the one op GSPMD
        # cannot partition, so no all-gather of L is ever emitted
        from ceigm_unet_tpu.parallel import sp_context
        ctx = sp_context.active()
        if ctx is not None:
            # only H- and W-divisible stages run the island (the halo
            # ppermute and the column-major all_to_all shard H and W
            # respectively); deeper pyramid levels, where the feature
            # map is small and cheap, stay on the plain-GSPMD path
            n_sp = ctx[0].shape[ctx[1]]
            if (H % n_sp or W % n_sp or self.d_state != 1
                    or self.ssm_ratio != 1):
                ctx = None
        if ctx is not None:
            import functools as _ft
            from jax import shard_map
            from jax.sharding import PartitionSpec as _P
            from ceigm_unet_tpu.parallel.sp_ss2d import quad_group_ss2d_sp
            mesh, axis = ctx
            fparams = {
                "in_proj_weight": w_in,
                "conv2d": ({"kernel": dwk, "bias": dwb}
                           if dwb is not None else {"kernel": dwk}),
                "ssm": {"x_proj_weight": p.x_proj_weight,
                        "dt_projs_weight": p.dt_projs_weight,
                        "dt_projs_bias": p.dt_projs_bias,
                        "A_logs": p.A_logs, "Ds": p.Ds},
                "out_norm_scale": ln_scale,
                "out_norm_bias": ln_bias,
                "out_proj_weight": w_out,
            }
            f = shard_map(
                _ft.partial(quad_group_ss2d_sp, axis_name=axis,
                            directions=tuple(int(d)
                                             for d in self.directions)),
                mesh=mesh,
                in_specs=(_P(), _P(None, axis, None, None)),
                out_specs=_P(None, axis, None, None))
            return f(fparams, x.astype(self.dtype))

        blast = _use_blast()
        if blast < 0:
            blast = 2 if B_ >= 64 else 0
        if quad_fast and self.d_state == 1 and blast >= 2:
            # CEIGM_BLAST=2: fully transposed sandwich. One entry
            # transpose to (C, L*B); every GEMM runs with tokens in the
            # lanes (the layout XLA's batch-in-lanes emitters choose
            # anyway — the NHWC formulation pays ~7x 49 MiB relayouts
            # per stage-1 block to keep bouncing between views, r5 copy
            # attribution); dwconv + scan are batch-last pallas kernels;
            # one exit transpose back to NHWC.
            from ceigm_unet_tpu.ops.quad_scan_bl import (
                dwconv_bl, sscan_quad_ln_cat_bl)
            D = d_inner
            xT = jnp.transpose(x.astype(self.dtype), (3, 1, 2, 0))
            xTf = xT.reshape(C, L * B_)
            xc2 = jnp.swapaxes(w_xc_bd, 0, 1) @ xTf        # (Din, L*B)
            z2 = nn.silu(jnp.swapaxes(w_z_bd, 0, 1) @ xTf)
            dwb_a = (dwb if dwb is not None
                     else jnp.zeros((Din,), jnp.float32))
            import os
            if os.environ.get("CEIGM_BLDW", "xla") == "xla":
                # XLA depthwise directly in CHWN space — measured
                # 82.95 vs 86.77 ms with the pallas batch-last conv
                # (the 9-tap f32 concat-shift kernel is VPU-bound;
                # XLA's CHWN emitter handles this layout natively)
                xc4 = jax.lax.conv_general_dilated(
                    xc2.reshape(Din, H, W, B_),
                    dwk.astype(self.dtype), (1, 1), "SAME",
                    feature_group_count=Din,
                    dimension_numbers=("CHWN", "HWIO", "CHWN"))
                xc4 = xc4 + dwb_a.astype(self.dtype)[:, None, None,
                                                     None]
                xc2 = nn.silu(xc4.reshape(Din, L * B_))
            else:
                xc2 = nn.silu(dwconv_bl(xc2.reshape(Din, H, W, B_),
                                        dwk, dwb_a, H,
                                        W).reshape(Din, L * B_))
            # x_dbl with ROW-reordered weights [dts k-major | B | C]:
            # every consumer is then a contiguous row slice
            bd = jax.scipy.linalg.block_diag
            w2 = jnp.concatenate([
                bd(*[p.x_proj_weight[k][:R] for k in range(K)]),
                bd(*[p.x_proj_weight[k][R:R + 1] for k in range(K)]),
                bd(*[p.x_proj_weight[k][R + 1:R + 2] for k in range(K)]),
            ], axis=0).astype(self.dtype)                  # (K(R+2), KD)
            x_dbl2 = w2 @ xc2
            dts2 = x_dbl2[:K * R]
            Bs2 = x_dbl2[K * R:K * R + K].reshape(K, L, B_)
            Cs2 = x_dbl2[K * R + K:].reshape(K, L, B_)
            wdt2 = bd(*[p.dt_projs_weight[k] for k in range(K)]).astype(
                self.dtype)                                # (KD, KR)
            dt2 = wdt2 @ dts2                              # (KD, L*B)

            A = -jnp.exp(p.A_logs.astype(jnp.float32)).reshape(K, D)
            bias = p.dt_projs_bias.astype(jnp.float32)
            Dsv = p.Ds.astype(jnp.float32).reshape(K, D)
            y2 = sscan_quad_ln_cat_bl(
                xc2.reshape(K, D, L, B_), dt2.reshape(K, D, L, B_),
                Bs2, Cs2, A, bias, Dsv, (ln_scale, ln_bias), H, W,
                tuple(int(d) for d in self.directions))    # (KD, L, B)
            wout_bd = jax.scipy.linalg.block_diag(
                *[w_out[k] for k in range(K)]).astype(self.dtype)
            gated = y2.reshape(Din, L * B_).astype(self.dtype) * z2
            out2 = jnp.swapaxes(wout_bd, 0, 1) @ gated     # (C, L*B)
            from ceigm_unet_tpu.utils.debug import check_nan_inf
            return check_nan_inf(
                "quad_sandwich.out",
                jnp.transpose(out2.reshape(C, H, W, B_), (3, 1, 2, 0)))

        xp = x.astype(self.dtype).reshape(B_ * L, C)
        # two GEMMs (not one + lane slice): each output feeds a
        # different consumer layout; slicing a fused GEMM output
        # costs a relayout
        xc = (xp @ w_xc_bd).reshape(B_, L, Din)
        z = nn.silu(xp @ w_z_bd)            # (B*L, Din)

        from ceigm_unet_tpu.ops.dwconv_pallas import depthwise_conv2d
        xc = xc.reshape(B_, H, W, Din)
        xc = nn.silu(depthwise_conv2d(xc, dwk, dwb))

        if quad_fast and self.d_state == 1:
            # lane-concatenated (B, L, Din) straight from the
            # scan outputs — no group-planar stack + swapaxes
            yt = _quad_pergroup(xc, p, R, ln_scale, ln_bias,
                                self.directions, H, W, d_inner,
                                self.dtype, cat=True).reshape(
                                    B_ * L, Din)
            wout_bd = jax.scipy.linalg.block_diag(
                *[w_out[k] for k in range(K)]).astype(self.dtype)
            # z-gate fused into the out-proj GEMM prologue
            out = (yt.astype(self.dtype) * z) @ wout_bd
            return out.reshape(B_, H, W, C)

        z = z.reshape(B_, H, W, Din)

        # generic path: row-layout cross-scan + grouped scan op
        xcg = xc.reshape(B_, H, W, K, d_inner)
        xs = jnp.stack(
            [cross_scan_1d(xcg[:, :, :, i], k)
             for i, k in enumerate(self.directions)], axis=1)  # (B,K,D,L)
        ys = ssm_scan_core(xs, p.x_proj_weight, p.dt_projs_weight,
                           p.dt_projs_bias, p.A_logs, p.Ds,
                           self.d_state, R, self.scan_backend)
        yg = jnp.stack(
            [cross_merge_1d(ys[:, i], k, H, W)
             for i, k in enumerate(self.directions)], axis=3)

        yg = yg.astype(jnp.float32)
        mu = jnp.mean(yg, axis=-1, keepdims=True)
        var = jnp.var(yg, axis=-1, keepdims=True)
        yg = (yg - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias
        yg = yg.astype(self.dtype) * z.reshape(B_, H, W, K, d_inner)

        out = jnp.einsum("bhwkd,kdc->bhwkc", yg, w_out.astype(self.dtype))
        return out.reshape(B_, H, W, self.dim)
