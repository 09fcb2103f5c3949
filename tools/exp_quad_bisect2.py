"""Bisect the planar QuadGroupSS2D path at stage-1 (TPU)."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.quad_scan import sscan_quad
from tools.bench_variants import loop_time

print = functools.partial(print, flush=True)

B, H, W, K, D = 64, 56, 56, 4, 16
L = H * W
R = 1
DT = jnp.bfloat16
Din = K * D
C = K * D

rng = np.random.default_rng(0)


def mk(*shape):
    return jnp.asarray(rng.standard_normal(shape) * 0.02, DT)


w_in = mk(K, D, 2 * D)
w_x = mk(K, R + 2, D)
w_dt = mk(K, D, R)
w_out = mk(K, D, D)
dwk = mk(3, 3, 1, Din)
A2 = -jnp.ones((K, D), jnp.float32)
b2 = jnp.zeros((K, D), jnp.float32)
D2 = jnp.ones((K, D), jnp.float32)
ln_s = jnp.ones((K, D), jnp.float32)
ln_b = jnp.zeros((K, D), jnp.float32)


def stage(x, upto):
    w_bd = jax.scipy.linalg.block_diag(*[w_in[k] for k in range(K)])
    cols = np.arange(K * 2 * D).reshape(K, 2 * D)
    perm = np.concatenate([cols[:, :D].ravel(), cols[:, D:].ravel()])
    xz = (x.reshape(B * L, C) @ w_bd[:, perm]).reshape(B, H, W, 2 * Din)
    xc, z = xz[..., :Din], xz[..., Din:]
    z = jax.nn.silu(z)
    if upto == 1:
        return xc + z
    xc = jax.lax.conv_general_dilated(
        xc, dwk, (1, 1), "SAME", feature_group_count=Din,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xc = jax.nn.silu(xc)
    if upto == 2:
        return xc + z
    xcf = xc.reshape(B * L, Din)
    wx_bd = jax.scipy.linalg.block_diag(
        *[jnp.swapaxes(w_x[k], 0, 1) for k in range(K)])
    x_dbl = (xcf @ wx_bd).reshape(B, L, K, R + 2)
    dts, Bs, Cs = x_dbl[..., :R], x_dbl[..., R], x_dbl[..., R + 1]
    wdt_bd = jax.scipy.linalg.block_diag(
        *[jnp.swapaxes(w_dt[k], 0, 1) for k in range(K)])
    dt = (dts.reshape(B * L, K * R) @ wdt_bd).reshape(B, L, K, D)
    if upto == 3:
        return dt.reshape(B, H, W, Din) + z
    ut = jnp.swapaxes(xc.reshape(B, L, K, D), 1, 2)
    dtt = jnp.swapaxes(dt, 1, 2)
    Bb = jnp.broadcast_to(jnp.swapaxes(Bs, 1, 2)[..., None],
                          (B, K, L, D)).astype(DT)
    Cb = jnp.broadcast_to(jnp.swapaxes(Cs, 1, 2)[..., None],
                          (B, K, L, D)).astype(DT)
    if upto == 4:  # layout only, no scan
        return ((ut + dtt + Bb + Cb).swapaxes(1, 2)
                .reshape(B, H, W, Din) + z)
    y = sscan_quad(ut, dtt, Bb, Cb, A2, b2, D2, H, W, (1, 2, 3, 4))
    if upto == 5:
        return (y.swapaxes(1, 2).reshape(B, H, W, Din).astype(DT) + z)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    yf = ((y - mu) * jax.lax.rsqrt(var + 1e-5)
          * ln_s[None, :, None, :] + ln_b[None, :, None, :])
    zt = jnp.swapaxes(z.reshape(B, L, K, D), 1, 2)
    yf = yf.astype(DT) * zt
    if upto == 6:
        return yf.swapaxes(1, 2).reshape(B, H, W, Din) + z
    out = jnp.einsum("bkld,kdc->blkc", yf, w_out)
    return out.reshape(B, H, W, C)


def main():
    x = mk(B, H, W, C)
    names = ["inproj+silu", "+dwconv", "+projs", "+layout", "+scan",
             "+ln/gate", "+outproj"]
    prev = 0.0
    for i, nm in enumerate(names, start=1):
        t = loop_time(
            lambda v: stage(v, i).reshape(B, H, W, -1)[..., :C]
            .astype(DT), x, n=8) * 1e3
        print(f"upto {i} {nm:12s}: {t:7.3f} ms  (+{t - prev:6.3f})")
        prev = t


if __name__ == "__main__":
    main()
