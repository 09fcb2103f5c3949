"""Micro-attribution of the fused quad path at stage-1 shape (TPU)."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.quad_scan import sscan_dir, _scan2d_kernel
from tools.bench_variants import loop_time

print = functools.partial(print, flush=True)

B, H, W, K, D = 64, 56, 56, 4, 16
L = H * W
DT = jnp.bfloat16


def main():
    u = jnp.ones((B, L, D), DT)
    dt = jnp.ones((B, L, D), DT) * 0.1
    Bb = jnp.ones((B, L, D), DT)
    Cb = jnp.ones((B, L, D), DT)
    A = -jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    Dv = jnp.ones((D,), jnp.float32)

    for d in (1, 2, 3, 4):
        t = loop_time(
            lambda x: sscan_dir(x, dt, Bb, Cb, A, bias, Dv, H, W, d)
            .astype(DT), u, n=8)
        print(f"sscan_dir d{d} (B,L,16): {t*1e3:7.3f} ms")

    a32 = jnp.full((B, L, D), 0.9, jnp.float32)
    b32 = jnp.ones((B, L, D), jnp.float32)
    t = loop_time(lambda x: _scan2d_kernel(x, b32, H, W, 1), a32, n=8)
    print(f"scan2d-only d1 fp32   : {t*1e3:7.3f} ms")

    # the 4-direction sequence as quad_ssm_nhwc builds it
    xc = jnp.ones((B, H, W, K, D), DT)
    dt5 = jnp.ones((B, H, W, K, D), DT) * 0.1
    Bs = jnp.ones((B, H, W, K, 1), DT)
    Cs = jnp.ones((B, H, W, K, 1), DT)
    A2 = -jnp.ones((K, D), jnp.float32)
    b2 = jnp.zeros((K, D), jnp.float32)
    D2 = jnp.ones((K, D), jnp.float32)

    def quad(xc):
        def bc(x, i):
            return jnp.broadcast_to(
                x[:, :, :, i], (B, H, W, D)).reshape(B, L, D)
        ys = [sscan_dir(xc[:, :, :, i].reshape(B, L, D),
                        dt5[:, :, :, i].reshape(B, L, D),
                        bc(Bs, i), bc(Cs, i), A2[i], b2[i], D2[i], H, W, k)
              for i, k in enumerate((1, 2, 3, 4))]
        return jnp.stack(ys, axis=2).reshape(B, H, W, K, D).astype(DT)

    t = loop_time(quad, xc, n=8)
    print(f"quad 4-dir sequence   : {t*1e3:7.3f} ms")

    # full module
    from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
    m = QuadGroupSS2D(dim=K * D, dtype=DT)
    x = jnp.ones((B, H, W, K * D), DT)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    t = loop_time(lambda x: m.apply(v, x), x, n=8)
    print(f"QuadGroupSS2D module  : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
