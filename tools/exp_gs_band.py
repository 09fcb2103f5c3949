"""A/B the banded vs dense fused grid-sample kernel on real TPU.

Finest DySample stage of the 224-squared model (56x56 -> 112x112,
B*groups images of C=16), the only stage where a valid band tiling
exists at 224 input; plus the 512-squared finest stage. Sweeps the
output-row tile T via CEIGM_GS_BANDT. Usage: python tools/exp_gs_band.py
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_variants import loop_time

print = functools.partial(print, flush=True)


def dysample_grid(rng, B, H, W):
    Ho, Wo = 2 * H, 2 * W
    oy = np.arange(Ho)[None, :, None] // 2
    ox = np.arange(Wo)[None, None, :] // 2
    py = oy + rng.uniform(-0.75, 0.75, (B, Ho, Wo))
    px = ox + rng.uniform(-0.75, 0.75, (B, Ho, Wo))
    gy = (2.0 * py + 1.0) / H - 1.0
    gx = (2.0 * px + 1.0) / W - 1.0
    return jnp.asarray(np.stack([gx, gy], -1), jnp.float32)


def chain_gs(fn, x):
    # carry a scalar through the grid so successive iterations are
    # data-dependent (tunnel timing rule); x fixed in closure
    def body(g):
        o = fn(x, g)
        return g + jnp.mean(o.astype(jnp.float32)) * 1e-7
    return body


def main():
    import ceigm_unet_tpu.ops.grid_sample as gs

    # REAL model shapes (from trace_attr): eucb1 at 224sq is 28->56 with
    # C=32 per group (B*4 images); at 512sq it's 64->128
    for (B, H, W, C, label) in ((512, 28, 28, 32, "224sq b128 eucb1"),
                                (256, 28, 28, 32, "224sq b64 eucb1"),
                                (32, 64, 64, 32, "512sq b8 eucb1")):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        grid = dysample_grid(rng, B, H, W)

        want = np.asarray(gs.grid_sample_bilinear_mm(x, grid), np.float32)

        t = loop_time(chain_gs(gs._gs_fused_impl, x), grid, n=8)
        d = np.abs(np.asarray(gs._gs_fused_impl(x, grid), np.float32)
                   - want).max()
        print(f"{label}: dense  {t*1e3:7.3f} ms  max|diff|={d:.2e}")

        for T in (0, 4, 8, 16):
            os.environ["CEIGM_GS_BANDT"] = str(T)
            if gs._band_tile(2 * H, 2 * W, H) is None:
                print(f"{label}: band T={T or 'auto'}: no valid tiling")
                continue
            t = loop_time(chain_gs(gs._gs_banded_impl, x), grid, n=8)
            d = np.abs(np.asarray(gs._gs_banded_impl(x, grid), np.float32)
                       - want).max()
            eff_T = gs._band_tile(2 * H, 2 * W, H)
            print(f"{label}: band T={eff_T:3d} {t*1e3:7.3f} ms  "
                  f"max|diff|={d:.2e}")
        os.environ.pop("CEIGM_GS_BANDT", None)


if __name__ == "__main__":
    main()
