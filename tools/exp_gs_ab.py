"""A/B the fused grid-sample w2-tile build: broadcast-reshape vs
iota-selector matmuls, same process, finest DySample shape."""
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

from tools.bench_variants import loop_time

print = functools.partial(print, flush=True)


def build(variant, H, W, C, p_tile):
    def kernel(wy_ref, wx_ref, im_ref, out_ref):
        wyt = wy_ref[0]
        wxt = wx_ref[0]
        im = im_ref[0].astype(jnp.float32)
        if variant == "bcast":
            w2 = (wyt[:, None, :] * wxt[None, :, :]).reshape(H * W, -1)
        else:
            i_h = jax.lax.broadcasted_iota(jnp.int32, (H * W, H), 0)
            j_h = jax.lax.broadcasted_iota(jnp.int32, (H * W, H), 1)
            Ey = (i_h // W == j_h).astype(jnp.float32)
            i_w = jax.lax.broadcasted_iota(jnp.int32, (H * W, W), 0)
            j_w = jax.lax.broadcasted_iota(jnp.int32, (H * W, W), 1)
            Ex = (i_w % W == j_w).astype(jnp.float32)
            dot = lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            w2 = dot(Ey, wyt) * dot(Ex, wxt)
        o = jax.lax.dot_general(w2, im, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[0] = o.astype(out_ref.dtype)

    @jax.jit
    def run(wy, wx, xf):
        B = wy.shape[0]
        Pp = wy.shape[2]
        return pl.pallas_call(
            kernel,
            grid=(B, Pp // p_tile),
            in_specs=[
                pl.BlockSpec((1, H, p_tile), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W, p_tile), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H * W, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, p_tile, C), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Pp, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(wy, wx, xf)
    return run


def main():
    # finest DySample stage: B*g=256, in 28x28, out 56x56=3136 px, C=32
    B, H, W, C, P = 256, 28, 28, 32, 3136
    rng = np.random.default_rng(0)
    for p_tile in (256, 512, 1024):
        Pp = -(-P // p_tile) * p_tile
        wy = jnp.asarray(rng.random((B, H, Pp)), jnp.float32)
        wx = jnp.asarray(rng.random((B, W, Pp)), jnp.float32)
        xf = jnp.asarray(rng.random((B, H * W, C)), jnp.bfloat16)
        outs = {}
        for v in ("bcast", "iota"):
            run = build(v, H, W, C, p_tile)
            t = loop_time(lambda q: run(q, wx, xf).astype(jnp.float32)
                          .reshape(B, -1, 1)[:, :H, 0][:, :, None]
                          * jnp.ones((B, H, Pp), jnp.float32) * 1e-6 + q,
                          wy, n=6)
            outs[v] = run(wy, wx, xf)
            print(f"p_tile={p_tile} {v:6s}: {t*1e3:7.3f} ms")
        d = np.abs(np.asarray(outs["bcast"], np.float32)
                   - np.asarray(outs["iota"], np.float32)).max()
        print(f"  max|diff| = {d:.2e}")


if __name__ == "__main__":
    main()
