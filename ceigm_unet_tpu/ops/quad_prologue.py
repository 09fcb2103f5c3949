"""Fused QuadGroupSS2D prologue: xc/z in-projections + depthwise 3x3 +
SiLU + the rank-R dt chain, in one VMEM-resident pallas kernel.

The unfused chain is emitter-bound, not FLOPs-bound: at stage-1 widths
(C = Din = 64) every projection is a skinny GEMM for which XLA picks
tokens-on-lanes emitters and relayouts the (B, L, C) input per GEMM
(r3 trace: ~0.9 ms/block of dots + conv + silu + input copies for
~0.15 ms of traffic). This kernel reads the normalized block input once
per image and emits the three planar tensors the scan stage consumes:

    xs = silu(dwconv3x3(x @ Wxc) + bdw)        (B, L, Din)  [scan u]
    z  = silu(x @ Wz)                           (B, L, Din)  [gate]
    dt = ((xs @ Wxdt) @ Wdt)                    (B, L, Din)  [pre-bias]

The depthwise 3x3 runs as 9 masked sublane shifts in the (L, Din) pixel
view (same pattern as ops/ffn_pallas.py); 'SAME' zero padding is exact.
Weights arrive as the dense block-diagonal matrices the model already
builds at trace time (models/ss2d.py). Backward: recompute-based custom
VJP through the equivalent XLA composition — exact adjoint.

Reference counterpart: the in_proj/conv2d/x_proj/dt_projs chain of SS2D
(gm-unet/model/gm/vmamba.py forward_corev2 path; groupmamba.py:99-146).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ceigm_unet_tpu.ops.ffn_pallas import _dw_shift


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _prologue_kernel(L, W, G, x_ref, wxc_ref, wz_ref, wxdt_ref, wdt_ref,
                     dwk_ref, consts_ref, xs_ref, z_ref, dt_ref):
    # consts rows: [dwconv bias] (1, Din)
    wxc = wxc_ref[...]
    wz = wz_ref[...]
    wxdt = wxdt_ref[...]
    wdt = wdt_ref[...]
    dwk = dwk_ref[...].astype(jnp.float32)
    for g in range(G):
        x = x_ref[g]
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xc = dot(x, wxc)
        xs = _silu(_dw_shift(xc, L, W, 3, dwk) + consts_ref[0:1, :])
        xs_ref[g] = xs.astype(xs_ref.dtype)
        z_ref[g] = _silu(dot(x, wz)).astype(z_ref.dtype)
        dts = dot(xs.astype(wxdt.dtype), wxdt)
        dt_ref[g] = dot(dts.astype(wdt.dtype), wdt).astype(dt_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _prologue_call(x, wxc, wz, wxdt, wdt, dwk, consts, H, W,
                   interpret=False):
    B, L, C = x.shape
    Din = wxc.shape[1]
    KR = wxdt.shape[1]
    G = 4 if B % 4 == 0 else 1
    spec_x = pl.BlockSpec((G, L, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((G, L, Din), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((B, L, Din), x.dtype)
    return pl.pallas_call(
        functools.partial(_prologue_kernel, L, W, G),
        grid=(B // G,),
        in_specs=[spec_x, full((C, Din)), full((C, Din)),
                  full((Din, KR)), full((KR, Din)), full((9, Din)),
                  full((1, Din))],
        out_specs=[spec_o, spec_o, spec_o],
        out_shape=[out, out, out],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wxc, wz, wxdt, wdt, dwk, consts)


def _prologue_ref(x, wxc, wz, wxdt, wdt, dwk, dwb, H, W):
    """Equivalent XLA composition (bwd recompute + CPU/fp32 reference)."""
    B, L, C = x.shape
    Din = wxc.shape[1]
    xc = (x @ wxc).reshape(B, H, W, Din)
    xc = jax.lax.conv_general_dilated(
        xc, dwk.astype(xc.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=Din)
    xs = jax.nn.silu((xc + dwb.astype(xc.dtype)).astype(jnp.float32)
                     ).reshape(B, L, Din).astype(x.dtype)
    z = jax.nn.silu((x @ wz).astype(jnp.float32)).astype(x.dtype)
    dt = (xs @ wxdt) @ wdt
    return xs, z, dt


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def quad_prologue(x, wxc, wz, wxdt, wdt, dwk, dwb, H, W):
    """Fused SS2D prologue on (B, H*W, C) pixel-flat input.

    wxc/wz (C, Din) block-diagonal in-projections, wxdt (Din, K*R) the
    stacked x_proj dt rows, wdt (K*R, Din) the stacked dt_projs, dwk
    (3, 3, 1, Din) depthwise kernel, dwb (Din,) or zeros. Returns
    (xs, z, dt), each (B, H*W, Din) in x.dtype (dt pre-bias — the scan
    kernel adds dt_projs_bias)."""
    return _prologue_fwd(x, wxc, wz, wxdt, wdt, dwk, dwb, H, W)[0]


def _prologue_fwd(x, wxc, wz, wxdt, wdt, dwk, dwb, H, W):
    interpret = jax.default_backend() != "tpu"
    Din = wxc.shape[1]
    dt_ = x.dtype
    consts = dwb.astype(jnp.float32).reshape(1, Din)
    y = _prologue_call(x, wxc.astype(dt_), wz.astype(dt_),
                       wxdt.astype(dt_), wdt.astype(dt_),
                       dwk.reshape(9, Din).astype(dt_), consts, H, W,
                       interpret=interpret)
    return y, (x, wxc, wz, wxdt, wdt, dwk, dwb)


def _prologue_bwd(H, W, res, ct):
    x, wxc, wz, wxdt, wdt, dwk, dwb = res
    _, vjp = jax.vjp(lambda *a: _prologue_ref(*a, H, W),
                     x, wxc, wz, wxdt, wdt, dwk, dwb)
    return vjp(ct)


quad_prologue.defvjp(_prologue_fwd, _prologue_bwd)
