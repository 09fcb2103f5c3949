"""Probe: can the quad kernels consume the planar (B, L, K*D) tensor
directly, eliminating the (B,L,K,D)<->(B,K,L,D) transposes at the pallas
boundaries (the ~17 ms layout-copy bucket in the r3 trace)?

Three candidate mechanisms, in cost order:

A. in-kernel retile: BlockSpec hands the kernel (H, W, D); kernel
   reshapes to the lane-packed (H, W*D) scan view. (Blocked on the r2
   toolchain — re-probe.)
B. K-axis BlockSpec slice: grid over (B, K) on the 5-D (B, H, W, K, D)
   view with block (None, H, W, None, D) — no transpose in HBM, but same
   in-kernel (H, W, D) -> (H, W*D) question.
C. full-lane planar kernel: ONE kernel reads (H, W*Din) (Din = K*D,
   group-major planar) and runs EVERY direction's scan over the full
   Din lanes (shift stride Din), then lane-masks each direction to its
   group. 4x redundant scan arithmetic, zero layout ops.

Run: python tools/exp_planar.py            (TPU compile + timing)
     JAX_PLATFORMS=cpu python tools/exp_planar.py --interpret  (numerics)
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv


# --------------------------------------------------------------- A: retile
def _retile_kernel(H, W, D, x_ref, o_ref):
    x = x_ref[...]                       # (H, W, D)
    xf = x.reshape(H, W * D)
    y = xf * 2.0
    o_ref[...] = y.reshape(H, W, D)


def probe_retile(B=2, H=8, W=8, D=16):
    x = jnp.arange(B * H * W * D, dtype=jnp.float32).reshape(B, H, W, D)
    try:
        out = pl.pallas_call(
            functools.partial(_retile_kernel, H, W, D),
            grid=(B,),
            in_specs=[pl.BlockSpec((None, H, W, D), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, H, W, D), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, D), jnp.float32),
            interpret=INTERPRET,
        )(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
        print("A retile (H,W,D)->(H,W*D): OK")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"A retile: FAIL [{type(e).__name__}] {str(e)[:300]}")
        return False


# ------------------------------------------------------- B: K-axis slicing
def probe_kslice(B=2, H=8, W=8, K=4, D=16):
    x = jnp.arange(B * H * W * K * D, dtype=jnp.float32).reshape(
        B, H, W, K, D)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    try:
        out = pl.pallas_call(
            kern,
            grid=(B, K),
            in_specs=[pl.BlockSpec((None, H, W, None, D),
                                   lambda i, g: (i, 0, 0, g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, H, W, None, D),
                                   lambda i, g: (i, 0, 0, g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, K, D), jnp.float32),
            interpret=INTERPRET,
        )(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
        print("B K-axis BlockSpec slice: OK")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"B K-slice: FAIL [{type(e).__name__}] {str(e)[:300]}")
        return False


# ---------------------------------------------- C: full-lane planar kernel
def probe_planar_scan(B=4, H=56, W=56, K=4, D=16):
    """All-direction scan over (H, W*Din) with lane-masked combine, vs
    the existing per-group scan2d calls."""
    from ceigm_unet_tpu.ops.quad_scan import (
        _rowmajor, _colmajor, scan2d)

    Din = K * D
    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (B, H * W, Din), jnp.float32, 0.5, 0.99)
    b = jax.random.normal(jax.random.PRNGKey(1), (B, H * W, Din))

    def planar_kernel(a_ref, b_ref, o_ref):
        av = a_ref[...]
        bv = b_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (H, W * Din), 1)
        grp = (lane % Din) // D
        out = jnp.zeros((H, W * Din), jnp.float32)
        for g, dirn in enumerate((1, 2, 3, 4)):
            if dirn in (1, 3):
                h = _rowmajor(av, bv, H, W, Din, backward=(dirn == 3))
            else:
                h = _colmajor(av, bv, H, W, Din, backward=(dirn == 4))
            out = jnp.where(grp == g, h, out)
        o_ref[...] = out

    spec = pl.BlockSpec((None, H, W * Din), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def planar(a, b):
        return pl.pallas_call(
            planar_kernel, grid=(B,), in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, W * Din), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(a.reshape(B, H, W * Din), b.reshape(B, H, W * Din)).reshape(
            B, H * W, Din)

    out = planar(a, b)

    # reference: per-group scan2d in the group's direction
    outs = []
    for g, dirn in enumerate((1, 2, 3, 4)):
        ag = a[..., g * D:(g + 1) * D]
        bg = b[..., g * D:(g + 1) * D]
        outs.append(scan2d(ag, bg, H, W, dirn))
    want = jnp.concatenate(outs, axis=-1)
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"C planar all-dir scan: max err {err:.2e} "
          f"{'OK' if err < 1e-4 else 'MISMATCH'}")

    if jax.default_backend() == "tpu":
        from tools.trace_attr import trace_ops
        rows = trace_ops(planar, a, b, iters=8)
        tot = sum(d for d, _, _ in rows)
        print(f"  planar kernel: {tot:.3f} ms "
              f"[{', '.join(f'{d:.3f} {n[:24]}' for d, n, _ in rows[:3])}]")

        @jax.jit
        def pergroup(a, b):
            outs = []
            for g, dirn in enumerate((1, 2, 3, 4)):
                outs.append(scan2d(a[..., g * D:(g + 1) * D],
                                   b[..., g * D:(g + 1) * D], H, W, dirn))
            return jnp.concatenate(outs, axis=-1)
        rows = trace_ops(pergroup, a, b, iters=8)
        tot = sum(d for d, _, _ in rows)
        print(f"  per-group slices: {tot:.3f} ms "
              f"[{', '.join(f'{d:.3f} {n[:24]}' for d, n, _ in rows[:3])}]")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} interpret={INTERPRET}")
    probe_retile()
    probe_kslice()
    probe_planar_scan()
