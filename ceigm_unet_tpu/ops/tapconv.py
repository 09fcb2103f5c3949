"""Tap-conv Pallas kernels: convolutions evaluated in the (L, C) view —
pixels on sublanes, channels on lanes.

In this layout a conv tap (dy, dx) is a masked SUBLANE shift by dy*W + dx
(vertical out-of-range rows drop off the array edge, horizontal wrap is
masked with an iota test), and the channel mixing of grouped/pointwise
convs is a plain MXU matmul — no grouped-conv lowering, no channel
interleave gymnastics. This turns the reference decoder's conv zoo
(grouped 1/3/5 gates, multi-branch CABs) from XLA grouped-conv calls that
profile in milliseconds into a single VMEM-resident kernel.

First user: the LGAG attention gate (reference best_decoder.py:86-136) in
eval mode — all six grouped convs (both branches read ``g``), the shared
BatchNorm (folded), ReLU, the psi 1x1 conv + BN + sigmoid, fused into one
kernel that emits the psi map. Training keeps the differentiable XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def shift_px(x, s, mask):
    """Sublane shift of (L, C) by s pixels (s may be negative), then apply
    the (L, 1) horizontal-validity mask."""
    L, C = x.shape
    if s == 0:
        return x * mask
    if s > 0:
        sh = jnp.concatenate(
            [jnp.zeros((s, C), x.dtype), x[:-s]], axis=0)
    else:
        sh = jnp.concatenate(
            [x[-s:], jnp.zeros((-s, C), x.dtype)], axis=0)
    return sh * mask


def _hmask(L, W, dx):
    """(L, 1) fp32 mask: 1 where the source column x - dx is in [0, W)."""
    xcol = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) % W
    ok = jnp.logical_and(xcol - dx >= 0, xcol - dx < W)
    return ok.astype(jnp.float32)


def _lgag_kernel(W, r, G, g_ref, x_ref, m_ref, c_ref, out_ref):
    """G batch items: (g, x) (G, L, C) -> x * psi (G, L, C).

    The gate multiply lives IN the kernel: emitting psi as a (L, 8)
    column-broadcast plus an XLA-side slice + broadcast-multiply cost
    ~0.6 ms/gate of pure relayout at the finest decoder gate (r3 trace);
    reading x here and writing the gated activations is the same HBM
    traffic the external multiply already paid.

    m_ref: (2r+1, 2r+1, C, C2) per-tap channel-mix blocks (all six convs
    folded; block [i, j] holds the (dy_j, dx_i) tap weights);
    c_ref: (8, C2) rows [bn_a, bn_b, psi_w, psi_scalars...].

    Shift-traffic note (r3): the previous design lane-concatenated k
    dx-shifted copies of g and row-shifted the fat (L, k*C) block per dy
    (~11M VPU element-moves/image at the finest gate). Shifts along L
    commute with the row-wise channel-mix matmul, so here each tap is
    matmul'ed FIRST and the k*k taps become sublane shifts of narrow
    (L, C2) slices (~2.5M moves). The taps run as k*k separate (C, C2)
    matmuls rather than k fat (C, k*C2) ones with lane slicing: slicing
    a non-128-multiple C2 out of the fat product gives the shift concat
    an offset-layout operand, which Mosaic refuses to lower ("offset
    mismatch on non-concat dimension" — hit on the real toolchain at the
    W=14 gate, C2=58: offset 174 mod 128 = 46). A tap's combined shift
    by dy*W+dx with the dest-column mask is exact: a source crossing a
    row edge lands with px+dx outside [0, W), which the mask kills;
    py+dy off the image with px+dx valid implies the flat index is also
    off the array. Input-dtype matmuls, fp32 accumulation.
    """
    L, C = g_ref.shape[1:]
    bn_a = c_ref[0:1, :]
    bn_b = c_ref[1:2, :]
    psi_w = c_ref[2:3, :]
    psi_bias = c_ref[3, 0]
    a2 = c_ref[3, 1]
    c2 = c_ref[3, 2]

    for b in range(G):
        g = g_ref[b]
        acc = None
        # correlation orientation: out[p] += in[p + (dy,dx)] * K[...]
        for i, dx in enumerate(range(-r, r + 1)):
            mask = _hmask(L, W, -dx)
            for j, dy in enumerate(range(-r, r + 1)):
                Q = jax.lax.dot_general(
                    g, m_ref[i, j].astype(g.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (L, C2) f32
                v = shift_px(Q, -(dy * W + dx), mask)
                acc = v if acc is None else acc + v

        relu = jnp.maximum(acc * bn_a + bn_b, 0.0)
        p = jnp.sum(relu * psi_w, axis=1, keepdims=True)  # 1x1 conv
        p = jax.nn.sigmoid(a2 * (p + psi_bias) + c2)
        out_ref[b] = (x_ref[b].astype(jnp.float32) * p).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("W", "r", "interpret"))
def _lgag_call(g2, x2, M, consts, W, r, interpret=False):
    B, L, C = g2.shape
    nk, _, _, C2 = M.shape
    # images per grid step: grow while the g block stays under ~1 MiB
    # (same overhead-amortization policy as the merged scan kernel)
    G = 1
    img = L * C * g2.dtype.itemsize
    while G < 8 and B % (G * 2) == 0 and (G * 2) * img <= (1 << 20):
        G *= 2
    return pl.pallas_call(
        functools.partial(_lgag_kernel, W, r, G),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, L, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nk, nk, C, C2), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(g2, x2, M, consts)


def lgag_gate_eval(g, x, convs, bn, psi_w, psi_b, psi_bn):
    """Fused eval-mode LGAG gate: returns x * psi, psi fused in-kernel.

    g, x: (B, H, W, C). convs: list of (kernel, bias) for the six grouped
    convs [W_g_1, W_g_3, W_g_5, W_x_1, W_x_3, W_x_5], each kernel
    (k, k, 2, C2) flax-layout with feature_group_count = C2 = C // 2.
    bn / psi_bn: dicts with scale, bias, mean, var. psi_w: (1, 1, C2, 1).
    Returns x * sigmoid(psi_bn(conv(relu(...)))) in x.dtype, (B, H, W, C).
    """
    B, H, Wd, C = g.shape
    C2 = C // 2
    L = H * Wd

    # Embed all six convs into one (5, 5, 2, C2) tap stack (sum of the two
    # branches since both read g; smaller kernels centered).
    K = jnp.zeros((5, 5, 2, C2), jnp.float32)
    for kern, _ in convs:
        k = kern.shape[0]
        o = (5 - k) // 2
        K = K.at[o:5 - o, o:5 - o].add(kern.astype(jnp.float32))
    bias_total = sum(b.astype(jnp.float32) for _, b in convs)

    # per-tap dense channel-mix matrices (group c covers input channels
    # (2c, 2c+1)), pre-split per tap for the kernel's matmul-then-shift
    # formulation: Mstk[i, j] = tap (dy_j, dx_i)
    mats = {}
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            w = K[2 + dy, 2 + dx]                       # (2, C2)
            M = jnp.zeros((C, C2), jnp.float32)
            idx = np.arange(C2)
            M = M.at[2 * idx, idx].set(w[0])
            M = M.at[2 * idx + 1, idx].set(w[1])
            mats[(dy, dx)] = M
    Mstk = jnp.stack([jnp.stack(
        [mats[(dy, dx)] for dy in range(-2, 3)])
        for dx in range(-2, 3)])                        # (5, 5, C, C2)

    eps = 1e-5
    a1 = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    # bn(Sg) + bn(Sx) = a1*(Sg_c + Sx_c) + a1*bias_total
    #                   - 2*a1*mean + 2*bn_bias
    # where acc (kernel) holds Sg_c + Sx_c (pure convs, both branches).
    b1 = a1 * bias_total + 2.0 * (bn["bias"] - a1 * bn["mean"])

    a2 = psi_bn["scale"][0] * jax.lax.rsqrt(psi_bn["var"][0] + eps)
    c2v = psi_bn["bias"][0] - a2 * psi_bn["mean"][0]

    consts = jnp.zeros((8, C2), jnp.float32)
    consts = consts.at[0].set(a1)
    consts = consts.at[1].set(b1)
    consts = consts.at[2].set(psi_w.reshape(-1).astype(jnp.float32))
    consts = consts.at[3, 0].set(psi_b.reshape(()).astype(jnp.float32))
    consts = consts.at[3, 1].set(a2)
    consts = consts.at[3, 2].set(c2v)

    interpret = jax.default_backend() != "tpu"
    out = _lgag_call(g.reshape(B, L, C), x.reshape(B, L, C), Mstk,
                     consts, Wd, 2, interpret=interpret)
    return out.reshape(B, H, Wd, C)
