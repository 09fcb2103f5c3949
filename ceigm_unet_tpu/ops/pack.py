"""Group pack/unpack: (B, L, K*D) <-> (B, K, L, D) as Pallas kernels.

The quad scan path converts between the planar layout the projection
GEMMs emit and the group-planar layout the directional scan kernels
consume. XLA lowers those transposes to strided HBM copies with
D-contiguous granularity (32 B at stage 1 bf16, well off bandwidth).
These kernels read and write HBM contiguously (blocks over L) and do
the group rearrangement as static lane slices in VMEM.

Both are pure permutations, so each is the other's VJP.

Reference counterpart: the CUDA build hides this entirely inside its
fused kernel's thread indexing (selective_scan_fwd_kernel_oflex.cuh);
on TPU the scan kernels live in the (H, W*D) view, so the boundary is
explicit and must at least run at copy speed-of-light.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _lb(L: int, cap: int = 1024) -> int:
    """Largest divisor of L that is <= cap and a multiple of 8 (sublane
    granularity), else L itself for small L, else cap (padded)."""
    if L <= cap:
        return L
    best = 0
    for t in range(8, cap + 1, 8):
        if L % t == 0:
            best = t
    return best or cap


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pack_groups(x: jnp.ndarray, K: int, interpret: bool = False):
    """(B, L, K*D) -> (B, K, L, D)."""
    return _pack_impl(x, K, interpret)


def _pack_impl(x, K, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, L, KD = x.shape
    D = KD // K
    lb = _lb(L)
    Lp = -(-L // lb) * lb
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))

    def kernel(x_ref, o_ref):
        v = x_ref[...]
        for k in range(K):
            o_ref[k] = v[:, k * D:(k + 1) * D]

    out = pl.pallas_call(
        kernel,
        grid=(B, Lp // lb),
        in_specs=[pl.BlockSpec((None, lb, KD), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, K, lb, D), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, Lp, D), x.dtype),
        interpret=interpret,
    )(x)
    return out[:, :, :L] if Lp != L else out


def _pack_fwd(x, K, interpret):
    return _pack_impl(x, K, interpret), None


def _pack_bwd(K, interpret, _, g):
    return (_unpack_impl(g, interpret),)


pack_groups.defvjp(_pack_fwd, _pack_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def unpack_groups(y: jnp.ndarray, interpret: bool = False):
    """(B, K, L, D) -> (B, L, K*D)."""
    return _unpack_impl(y, interpret)


def _unpack_impl(y, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, K, L, D = y.shape
    lb = _lb(L)
    Lp = -(-L // lb) * lb
    if Lp != L:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))

    def kernel(y_ref, o_ref):
        o_ref[...] = jnp.concatenate([y_ref[k] for k in range(K)], axis=-1)

    out = pl.pallas_call(
        kernel,
        grid=(B, Lp // lb),
        in_specs=[pl.BlockSpec((None, K, lb, D), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, lb, K * D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, K * D), y.dtype),
        interpret=interpret,
    )(y)
    return out[:, :L] if Lp != L else out


def _unpack_fwd(y, interpret):
    return _unpack_impl(y, interpret), (y.shape[1],)


def _unpack_bwd(interpret, res, g):
    (K,) = res
    return (_pack_impl(g, K, interpret),)


unpack_groups.defvjp(_unpack_fwd, _unpack_bwd)
