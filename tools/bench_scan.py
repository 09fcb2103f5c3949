"""Selective-scan speed harness.

Counterpart of the reference's manual benchmark
(gm-unet/kernels/selective_scan/test_selective_scan_speed.py:408-519):
forward and forward+backward wall-clock at B=128, D=96, N=1, L=4096,
comparing the Pallas backends against the XLA associative_scan baseline.

Timing uses device-side fori_loop chaining with a host fetch — the only
reliable method on a tunneled TPU (dispatch acks do not imply execution).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.selective_scan import selective_scan

B, D, N, L = 128, 96, 1, 4096
ITERS = 100


def loop_time(body, x0, n):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: body(x), x)
    o = run(x0, 2)
    np.asarray(jax.device_get(jax.tree.leaves(o)[0]).ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = run(x0, n)
        np.asarray(jax.device_get(jax.tree.leaves(o)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (B, D, L), jnp.bfloat16)
    dt = jax.random.normal(key, (B, D, L), jnp.bfloat16) * 0.1
    A = -jnp.ones((D, N), jnp.float32)
    Bm = jax.random.normal(key, (B, 1, N, L), jnp.bfloat16)
    Cm = jax.random.normal(key, (B, 1, N, L), jnp.bfloat16)
    Dv = jnp.ones((D,), jnp.float32)
    db = jnp.zeros((D,), jnp.float32)

    flops = 9 * B * L * D * N + B * D * L  # reference analytic model

    for backend in ("pallas", "assoc"):
        def fwd(x):
            y = selective_scan(x, dt, A, Bm, Cm, Dv, db,
                               delta_softplus=True, backend=backend,
                               out_dtype=jnp.float32)
            return (x * jnp.bfloat16(0.999)
                    + y.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))

        t = loop_time(fwd, u, ITERS)
        print(f"{backend:7s} fwd     : {t*1e3:8.3f} ms  "
              f"({flops/t/1e12:.2f} TFLOP/s analytic)")

        def fwdbwd(x):
            g = jax.grad(lambda x: jnp.sum(selective_scan(
                x, dt, A, Bm, Cm, Dv, db, delta_softplus=True,
                backend=backend, out_dtype=jnp.float32)))(x)
            return x * jnp.bfloat16(0.999) + g.astype(jnp.bfloat16)

        t = loop_time(fwdbwd, u, ITERS)
        print(f"{backend:7s} fwd+bwd : {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
