"""Pallas TPU kernel: batched first-order linear recurrence (the scan at the
heart of the selective-scan op).

TPU equivalent of the reference CUDA kernels' chunked block scan
(gm-unet/kernels/selective_scan/csrc/.../selective_scan_fwd_kernel_oflex.cuh:
67-211: cub::BlockScan + running-prefix callback, chunk carry in the ``x``
tensor). The design is TPU-first rather than a translation:

- rows (batch*dim*state) on sublanes, sequence L on lanes;
- within an L-block, the scan runs as a Hillis-Steele doubling scan on the
  (a, b) pair under the associative combine (a2, b2)∘(a1, b1) =
  (a2*a1, a2*b1 + b2): log2(L) vectorized steps of lane-shifted
  multiply-adds — numerically identical to the sequential recurrence
  (products of a only, no log/exp rescaling), fully VPU-parallel;
- long sequences stream as grid steps over L-blocks with an (R, 1) VMEM
  scratch carry that persists across the sequential TPU grid — the
  analogue of the CUDA running-prefix callback;
- one HBM read per input and one write for the output; all log2(L)
  intermediate scan levels live in VMEM/registers (an XLA
  ``associative_scan`` materializes each level to HBM).

fp32 compute regardless of input dtype (reference kernels accumulate fp32,
selective_scan_oflex.cpp:327-328).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128       # rows per grid step (sublane dim)
L_BLOCK = 1024       # lanes per grid step; carry crosses blocks via scratch


def _scan_block_kernel(a_ref, b_ref, out_ref, carry_ref):
    """One (ROW_TILE, L_BLOCK) block: doubling scan + carried prefix."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    a = a_ref[:, :].astype(jnp.float32)
    b = b_ref[:, :].astype(jnp.float32)
    rows, width = a.shape

    k = 1
    while k < width:  # static unroll: log2(L_BLOCK) steps
        a_sh = jnp.concatenate(
            [jnp.ones((rows, k), jnp.float32), a[:, :-k]], axis=1)
        b_sh = jnp.concatenate(
            [jnp.zeros((rows, k), jnp.float32), b[:, :-k]], axis=1)
        b = b + a * b_sh
        a = a * a_sh
        k *= 2

    carry = carry_ref[:, :]
    h = b + a * carry            # fold in the running prefix
    out_ref[:, :] = h.astype(out_ref.dtype)
    carry_ref[:, :] = h[:, width - 1:width]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_rows(a2: jnp.ndarray, b2: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """(M, L) -> (M, L) inclusive scan along the last axis, fp32."""
    M, L = a2.shape
    # pad lanes to the 128-tile only, then pick the largest block size
    # <= L_BLOCK (multiple of 128) that divides the padded length — avoids
    # the ~30% padding a pow2 block would cost at L = 3136.
    Mp = -(-M // ROW_TILE) * ROW_TILE
    Lp = -(-L // 128) * 128
    lb = max(d for d in range(128, L_BLOCK + 1, 128) if Lp % d == 0)
    # pad with the scan identity (a=1, b=0); extra rows are junk, sliced off
    a_p = jnp.pad(a2.astype(jnp.float32), ((0, Mp - M), (0, Lp - L)),
                  constant_values=1.0)
    b_p = jnp.pad(b2.astype(jnp.float32), ((0, Mp - M), (0, Lp - L)),
                  constant_values=0.0)

    out = pl.pallas_call(
        _scan_block_kernel,
        grid=(Mp // ROW_TILE, Lp // lb),
        in_specs=[
            pl.BlockSpec((ROW_TILE, lb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, lb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, lb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Lp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROW_TILE, 1), jnp.float32)],
        interpret=interpret,
    )(a_p, b_p)
    return out[:M, :L]


def scan_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """h = scan(a, b) along the last axis; any leading shape."""
    shape = a.shape
    L = shape[-1]
    a2 = a.reshape(-1, L)
    b2 = b.reshape(-1, L)
    interpret = jax.default_backend() != "tpu"
    return _scan_rows(a2, b2, interpret=interpret).reshape(shape)


# ---------------------------------------------------------------------------
# Fused selective scan, d_state = 1 fast path
# ---------------------------------------------------------------------------

def _fused_kernel(u_ref, dt_ref, bc_ref, row_ref, out_ref, carry_ref):
    """Fully fused N=1 selective scan for one (ROW_TILE, L_BLOCK) block.

    The TPU counterpart of the reference's ``ndstate`` CUDA specialization
    (selective_scan_ndstate.h:26-58): with d_state=1 the per-row state is a
    scalar, so softplus/decay/drive construction, the doubling scan, and the
    output emission all stay in VMEM — none of the fp32 (B, D, L)
    intermediates the unfused path writes to HBM exist at all.

    bc_ref: (2, R, S) stacked per-row-broadcast B and C sequences.
    row_ref: (3, R, 1) per-row constants [A, delta_bias, D].
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    u = u_ref[:, :].astype(jnp.float32)
    dt = dt_ref[:, :].astype(jnp.float32)
    Bv = bc_ref[0].astype(jnp.float32)
    Cv = bc_ref[1].astype(jnp.float32)
    A = row_ref[0]        # (R, 1), negative
    bias = row_ref[1]
    Dv = row_ref[2]

    dt = jax.nn.softplus(dt + bias)
    a = jnp.exp(dt * A)
    b = dt * u * Bv

    rows, width = a.shape
    k = 1
    while k < width:  # static unroll: log2(L_BLOCK) steps
        a_sh = jnp.concatenate(
            [jnp.ones((rows, k), jnp.float32), a[:, :-k]], axis=1)
        b_sh = jnp.concatenate(
            [jnp.zeros((rows, k), jnp.float32), b[:, :-k]], axis=1)
        b = b + a * b_sh
        a = a * a_sh
        k *= 2

    h = b + a * carry_ref[:, :]
    out_ref[:, :] = (Cv * h + Dv * u).astype(out_ref.dtype)
    carry_ref[:, :] = h[:, width - 1:width]


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def selective_scan_fused_n1(u, delta, A_row, B_row, C_row, D_row, bias_row,
                            out_dtype=jnp.float32, interpret=None):
    """Fused d_state=1 selective scan over rows.

    u, delta, B_row, C_row: (M, L); A_row, D_row, bias_row: (M,) fp32.
    Returns y (M, L) in ``out_dtype`` (fp32 default = oflex semantics).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, L = u.shape
    Mp = -(-M // ROW_TILE) * ROW_TILE
    Lp = -(-L // 128) * 128
    lb = max(d for d in range(128, L_BLOCK + 1, 128) if Lp % d == 0)

    def pad2(x, cval=0.0):
        return jnp.pad(x, ((0, Mp - M), (0, Lp - L)), constant_values=cval)

    up = pad2(u)
    dtp = pad2(delta)
    bc = jnp.stack([pad2(B_row), pad2(C_row)])
    rows = jnp.stack([
        jnp.pad(A_row.astype(jnp.float32), (0, Mp - M),
                constant_values=-1.0),
        jnp.pad(bias_row.astype(jnp.float32), (0, Mp - M)),
        jnp.pad(D_row.astype(jnp.float32), (0, Mp - M)),
    ])[..., None]                                   # (3, Mp, 1)

    out = pl.pallas_call(
        _fused_kernel,
        grid=(Mp // ROW_TILE, Lp // lb),
        in_specs=[
            pl.BlockSpec((ROW_TILE, lb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, lb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ROW_TILE, lb), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ROW_TILE, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, lb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Lp), out_dtype),
        scratch_shapes=[pltpu.VMEM((ROW_TILE, 1), jnp.float32)],
        interpret=interpret,
    )(up, dtp, bc, rows)
    return out[:M, :L]
