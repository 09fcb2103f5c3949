"""Cumulative bisection of QuadGroupSS2D internals at stage-1 (TPU)."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.quad_scan import sscan_dir
from tools.bench_variants import loop_time

print = functools.partial(print, flush=True)

B, H, W, K, D = 64, 56, 56, 4, 16
L = H * W
R = 1  # ceil(16/16)
DT = jnp.bfloat16

rng = np.random.default_rng(0)


def mk(*shape):
    return jnp.asarray(rng.standard_normal(shape) * 0.02, DT)


w_in = mk(K, D, 2 * D)
w_x = mk(K, R + 2, D)
w_dt = mk(K, D, R)
w_out = mk(K, D, D)
dwk = mk(3, 3, 1, K * D)
A2 = -jnp.ones((K, D), jnp.float32)
b2 = jnp.zeros((K, D), jnp.float32)
D2 = jnp.ones((K, D), jnp.float32)
ln_s = jnp.ones((K, D), jnp.float32)
ln_b = jnp.zeros((K, D), jnp.float32)


def stage(x, upto):
    xg = x.reshape(B, H, W, K, D)
    xz = jnp.einsum("bhwkc,kcd->bhwkd", xg, w_in)
    xc, z = jnp.split(xz, 2, axis=-1)
    z = jax.nn.silu(z)
    if upto == 1:
        return xc + z
    xcf = xc.reshape(B, H, W, K * D)
    xcf = jax.lax.conv_general_dilated(
        xcf, dwk, (1, 1), "SAME", feature_group_count=K * D,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xc = jax.nn.silu(xcf).reshape(B, H, W, K, D)
    if upto == 2:
        return xc + z
    x_dbl = jnp.einsum("bhwkd,kcd->bhwkc", xc, w_x)
    dts, Bs, Cs = jnp.split(x_dbl, [R, R + 1], axis=-1)
    dt = jnp.einsum("bhwkr,kdr->bhwkd", dts, w_dt)
    if upto == 3:
        return dt + z

    def bc(v, i):
        return jnp.broadcast_to(v[:, :, :, i], (B, H, W, D)).reshape(B, L, D)

    ys = [sscan_dir(xc[:, :, :, i].reshape(B, L, D),
                    dt[:, :, :, i].reshape(B, L, D),
                    bc(Bs, i), bc(Cs, i), A2[i], b2[i], D2[i], H, W, k)
          for i, k in enumerate((1, 2, 3, 4))]
    yg = jnp.stack(ys, axis=2).reshape(B, H, W, K, D)
    if upto == 4:
        return yg.astype(DT) + z
    mu = jnp.mean(yg, axis=-1, keepdims=True)
    var = jnp.var(yg, axis=-1, keepdims=True)
    yg = (yg - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
    yg = yg.astype(DT) * z
    if upto == 5:
        return yg
    out = jnp.einsum("bhwkd,kdc->bhwkc", yg, w_out)
    return out


def main():
    x = mk(B, H, W, K * D)
    names = ["inproj+silu", "+dwconv", "+projs", "+scan4", "+ln/gate",
             "+outproj"]
    prev = 0.0
    for i, nm in enumerate(names, start=1):
        t = loop_time(
            lambda v: stage(v, i).reshape(B, H, W, -1)[..., :K * D]
            .astype(DT), x, n=8) * 1e3
        print(f"upto {i} {nm:12s}: {t:7.3f} ms  (+{t - prev:6.3f})")
        prev = t


if __name__ == "__main__":
    main()
