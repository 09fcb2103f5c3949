"""Exact scipy-zoom as device matmuls.

The reference resizes with ``scipy.ndimage.zoom`` (order 3 spline for
images, order 0 for labels) in both the data pipeline and the per-slice
eval loop (gm-unet/dataset_synapse.py:93-95, eval.py:66-84). An order-k
spline zoom is a *linear* map of the input, so for fixed (in, out) sizes it
is a dense (out, in) matrix per axis. We extract that matrix EXACTLY by
pushing unit vectors through scipy once per shape (host, cached), then apply
it on device as two matmuls — bit-accurate parity with the reference's
resize (to float rounding) at MXU speed, fully batchable over slices.

Order-0 (nearest) resizes reduce to a gather with scipy's exact index map.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def zoom_matrix(in_size: int, out_size: int, order: int = 3) -> np.ndarray:
    """(out_size, in_size) matrix M with  zoom(v) == M @ v  for 1-D v,
    exactly reproducing scipy.ndimage.zoom(v, out/in, order=order)."""
    from scipy.ndimage import zoom as _zoom
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    factor = out_size / in_size
    for j in range(in_size):
        e = np.zeros(in_size, np.float64)
        e[j] = 1.0
        col = _zoom(e, factor, order=order)
        assert col.shape[0] == out_size, (col.shape, out_size)
        m[:, j] = col.astype(np.float32)
    return m


@functools.lru_cache(maxsize=128)
def nearest_index_map(in_size: int, out_size: int):
    """(index map, validity mask) exactly matching scipy zoom order=0.

    scipy evaluates output i at coordinate i * (in-1)/(out-1); float error
    can push the final coordinate past the boundary, where constant mode
    fills cval=0 — an all-zero row in the linear operator. We reproduce that
    with a validity mask (invalid positions -> 0).
    """
    if in_size == out_size:
        return np.arange(in_size, dtype=np.int32), np.ones(in_size, bool)
    # exact: the order-0 zoom matrix is a 0/1 selection matrix; argmax of
    # each row recovers the chosen source index (basis-vector probing).
    m = zoom_matrix(in_size, out_size, order=0)
    valid = m.sum(axis=1) > 0
    return np.argmax(m, axis=1).astype(np.int32), valid


def zoom_slices(x: jnp.ndarray, out_hw: Tuple[int, int],
                order: int = 3) -> jnp.ndarray:
    """Batched exact zoom of (..., H, W) slices to (..., H', W')."""
    H, W = x.shape[-2], x.shape[-1]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    mh = jnp.asarray(zoom_matrix(H, Ho, order))
    mw = jnp.asarray(zoom_matrix(W, Wo, order))
    y = jnp.einsum("oh,...hw->...ow", mh, x.astype(jnp.float32))
    return jnp.einsum("pw,...ow->...op", mw, y)


def zoom_slices_nearest(x: jnp.ndarray,
                        out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Order-0 zoom (labels / predictions) of (..., H, W)."""
    H, W = x.shape[-2], x.shape[-1]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    ih, vh = nearest_index_map(H, Ho)
    iw, vw = nearest_index_map(W, Wo)
    y = x[..., jnp.asarray(ih), :][..., :, jnp.asarray(iw)]
    mask = jnp.asarray(np.outer(vh, vw))
    return jnp.where(mask, y, jnp.zeros_like(y))
