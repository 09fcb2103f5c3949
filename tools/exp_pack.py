"""A/B: Pallas lane-slice repack vs XLA transpose at the quad boundary.

The v3 quad path pays three (B, L, K*D) <-> (B, K, L, D) relayouts per
block (u, dt in; y out). XLA lowers them to strided copies with
Dw-contiguous granularity (32 B at stage 1 bf16). This kernel reads the
planar layout CONTIGUOUSLY (blocks over L), does the group extraction as
static lane slices in VMEM, and writes each group's (Lb, D) block
contiguously — the strided access pattern never touches HBM.

Run on TPU: python tools/exp_pack.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))


def pack_pallas(x, K, lb=512, interpret=False):
    """(B, L, K*D) -> (B, K, L, D) via contiguous DMA + VMEM lane slices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, L, KD = x.shape
    D = KD // K
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


def unpack_pallas(y, lb=512, interpret=False):
    """(B, K, L, D) -> (B, L, K*D): the inverse lane placement."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, K, L, D = y.shape
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


def timeit(fn, *args, iters=50):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))

    # differential n vs 2n on a scalar-fetched fori chain
    def run(n):
        @jax.jit
        def go(x):
            def body(i, x):
                y = f(x, *args[1:])
                flat = y.reshape(-1)
                return x + 1e-12 * flat[0].astype(x.dtype)
            return jax.lax.fori_loop(0, n, body, x)
        t0 = time.perf_counter()
        np.asarray(jax.device_get(go(args[0]).reshape(-1)[0]))
        return time.perf_counter() - t0

    run(2)
    t1, t2 = run(iters), run(2 * iters)
    return (t2 - t1) / iters


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    for B, L, K, D in ((64, 3136, 4, 16), (64, 784, 4, 32),
                       (64, 196, 4, 96)):
        x = jnp.asarray(rng.standard_normal((B, L, K * D)), jnp.bfloat16)
        y = jnp.asarray(rng.standard_normal((B, K, L, D)), jnp.bfloat16)
        lb = min(512, L)

        a = np.asarray(pack_pallas(x, K, lb))
        b = np.asarray(jnp.swapaxes(x.reshape(B, L, K, D), 1, 2))
        assert np.array_equal(a, b), "pack mismatch"
        a = np.asarray(unpack_pallas(y, lb))
        b = np.asarray(jnp.swapaxes(y, 1, 2).reshape(B, L, K * D))
        assert np.array_equal(a, b), "unpack mismatch"

        tx = timeit(lambda v: jnp.swapaxes(
            v.reshape(B, L, K, D), 1, 2), x)
        tp = timeit(lambda v: pack_pallas(v, K, lb), x)
        tux = timeit(lambda v: jnp.swapaxes(v, 1, 2).reshape(B, L, K * D), y)
        tup = timeit(lambda v: unpack_pallas(v, lb), y)
        mb = x.size * 2 * 2 / 2**20
        print(f"B{B} L{L} K{K} D{D} ({mb:.0f} MiB rt): "
              f"pack xla {tx * 1e6:7.1f} us vs pallas {tp * 1e6:7.1f} us | "
              f"unpack xla {tux * 1e6:7.1f} us vs pallas {tup * 1e6:7.1f} us")


if __name__ == "__main__":
    main()
