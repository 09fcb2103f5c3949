"""Bilinear grid sampling (torch ``F.grid_sample`` semantics) in pure XLA.

Needed by the DySample dynamic upsampler (reference
gm-unet/model/best_decoder.py:389-403). Implements:

- ``align_corners=False``: unnormalize via  x_pix = ((x+1) * S - 1) / 2
- ``padding_mode="border"``: clamp sample coordinates to the valid range

Channel-last layout: input (B, H, W, C), grid (B, Ho, Wo, 2) with grid[..., 0]
the normalized x (width) coordinate and grid[..., 1] the y — matching torch.

The gather is expressed as one-hot-free integer takes along each axis, which
XLA lowers to dynamic-gathers; for the small offsets DySample uses this is
bandwidth-bound and fuses with the surrounding elementwise work.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    gx = (grid[..., 0].astype(jnp.float32) + 1.0) * W / 2.0 - 0.5
    gy = (grid[..., 1].astype(jnp.float32) + 1.0) * H / 2.0 - 0.5

    # border padding: clamp continuous coords into [0, S-1]
    gx = jnp.clip(gx, 0.0, W - 1.0)
    gy = jnp.clip(gy, 0.0, H - 1.0)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    def take(yi, xi):
        # flatten spatial, gather per batch
        flat = x.reshape(B, H * W, C)
        idx = yi * W + xi  # (B, Ho, Wo)
        return jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(idx.shape + (C,))

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)

    wx = wx[..., None].astype(x.dtype)
    wy = wy[..., None].astype(x.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
