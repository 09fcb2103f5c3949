"""TPU smoke + bench for ops/quad_scan.py at in-model shapes.

Checks all 4 directions at every encoder/decoder stage shape vs an exact
associative_scan reference on-device, then times each at batch 64.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.quad_scan import scan2d
from tools.bench_variants import loop_time

SHAPES = [  # (H, W, C): encoder stages (dg) + SS2D full-channel cases
    (56, 56, 16), (28, 28, 32), (14, 14, 87), (7, 7, 112),
    (56, 56, 64),
]


def _orders(H, W):
    L = H * W
    rm = np.arange(L)
    cm = np.arange(L).reshape(H, W).T.ravel()
    return {1: rm, 2: cm, 3: rm[::-1], 4: cm[::-1]}


def _ref_assoc(a, b, order):
    idx = jnp.asarray(np.asarray(order).copy())
    inv = jnp.asarray(np.argsort(np.asarray(order)))

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a[:, idx], b[:, idx]), axis=1)
    return h[:, inv]


def main():
    rng = np.random.default_rng(0)
    for H, W, C in SHAPES:
        L = H * W
        a = jnp.asarray(
            np.exp(-rng.random((2, L, C))).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((2, L, C)).astype(np.float32))
        orders = _orders(H, W)
        for d in (1, 2, 3, 4):
            got = np.asarray(scan2d(a, b, H, W, d))
            want = np.asarray(jax.jit(
                lambda a, b: _ref_assoc(a, b, orders[d]))(a, b))
            err = np.abs(got - want).max()
            ok = "OK" if err < 1e-4 else "FAIL"
            print(f"({H:2d},{W:2d},{C:3d}) dir{d}: err {err:.1e} {ok}",
                  flush=True)

    if jax.default_backend() != "tpu" or "--bench" not in sys.argv:
        return
    B = 64
    for H, W, C in SHAPES:
        a = jnp.full((B, H * W, C), 0.9, jnp.float32)
        b = jnp.ones((B, H * W, C), jnp.float32)
        for d in (1, 2, 3, 4):
            t = loop_time(lambda x: scan2d(x, b, H, W, d), a, n=8)
            print(f"({H:2d},{W:2d},{C:3d}) dir{d}: {t*1e3:7.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
