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


@functools.lru_cache(maxsize=128)
def zoom_band(in_size: int, out_size: int, order: int = 3,
              taps: int = 0, thresh: float = 1e-7):
    """Banded form of :func:`zoom_matrix`: (starts int32 (out,),
    weights float32 (out, taps), taps). Rows of the cubic-zoom operator
    decay as |sqrt(3)-2|^d, so truncating below ``thresh`` keeps a
    ~24-tap band and reproduces the dense operator to ~1e-7. ``taps``
    overrides the natural band width (it must be >= it; used to equalize
    the two axes of one resize)."""
    m = zoom_matrix(in_size, out_size, order).astype(np.float32)
    m = np.where(np.abs(m) > thresh, m, 0.0)
    widths = []
    firsts = []
    for r in m:
        nzi = np.nonzero(r)[0]
        if nzi.size == 0:
            firsts.append(0)
            widths.append(1)
        else:
            firsts.append(int(nzi.min()))
            widths.append(int(nzi.max() - nzi.min() + 1))
    natural = min(max(widths), in_size)
    if taps:
        assert natural <= taps <= in_size, (natural, taps, in_size)
    else:
        taps = natural
    starts = np.minimum(np.asarray(firsts, np.int64),
                        in_size - taps).astype(np.int32)
    weights = np.zeros((out_size, taps), np.float32)
    for o in range(out_size):
        weights[o] = m[o, starts[o]:starts[o] + taps]
    return starts, weights, taps


def zoom_host(img: np.ndarray, out_hw: Tuple[int, int],
              order: int = 3) -> np.ndarray:
    """Host-side (numpy in / numpy out) scipy-parity zoom of one 2-D
    slice. order 0 -> exact nearest gather; order >= 1 -> the exact
    extracted operator, applied by the native banded kernel when
    available, else scipy itself. Used by the data loader's hot path."""
    from scipy.ndimage import zoom as _zoom
    H, W = img.shape
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return np.asarray(img, np.float32)
    if order == 0:
        ih, vh = nearest_index_map(H, Ho)
        iw, vw = nearest_index_map(W, Wo)
        out = np.asarray(img, np.float32)[ih][:, iw]
        if not (vh.all() and vw.all()):
            out = out * np.outer(vh, vw)
        return out
    from ceigm_unet_tpu import native
    if native.available():
        _, _, ty = zoom_band(H, Ho, order)
        _, _, tx = zoom_band(W, Wo, order)
        t = max(ty, tx)
        if t <= H and t <= W:
            ys, yw, _ = zoom_band(H, Ho, order, taps=t)
            xs, xw, _ = zoom_band(W, Wo, order, taps=t)
            return native.sep_resize(img, ys, yw, xs, xw, t)
    return _zoom(np.asarray(img, np.float32), (Ho / H, Wo / W),
                 order=order).astype(np.float32)


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
