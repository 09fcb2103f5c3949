"""On-device (jitted, batched) augmentation — the performance tier.

The reference augments on CPU worker processes with imgaug
(dataset_synapse.py:61-72), which bottlenecks TPU training. Here the same
policy runs on device, fused:

- the op-count sampling is EXACT SomeOf((0, 4)) semantics: per sample,
  n ~ Uniform{0..4} and a uniformly random size-n subset of the same 10-op
  universe as the CPU parity tier (data/augment.py AUG_OPS), via
  ``jax.random.permutation`` (:func:`someof_active`);
- all geometric ops (flips, scale, rotate, shear, translate, piecewise
  mesh warp) compose into ONE coordinate map per sample, applied together
  with the zoom-to-patch resize as a single bilinear (image) / nearest
  (label) gather — so a 512^2 slice is augmented AND resized to 224^2 in
  one pass (BASELINE north star, config 5). The piecewise warp's source
  triangulation is static (4x4 linspace grid), so the per-pixel triangle
  lookup is a trace-time constant; only 18 tiny 3x2 displacement systems
  depend on the per-sample jitter;
- photometric ops (additive Gaussian noise, Gaussian blur, linear
  contrast) are masked elementwise/conv ops;
- geometric/photometric ORDER is canonicalized into the fused composition
  (the only remaining deviation from the sequential CPU tier — see
  docs/PARITY.md).

Everything is batched over B and different per sample via per-sample keys.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Op universe — indices match data/augment.py AUG_OPS order:
# 0 Flipud, 1 Fliplr, 2 AdditiveGaussianNoise, 3 GaussianBlur,
# 4 LinearContrast, 5 AffineScale, 6 AffineRotate, 7 AffineShear,
# 8 PiecewiseAffine, 9 AffineTranslate
N_OPS = 10
_PW_GRID = 4  # imgaug PiecewiseAffine nb_rows/cols (augment.py:180)


def someof_active(key, n_ops: int = N_OPS, n_max: int = 4) -> jnp.ndarray:
    """Exact imgaug SomeOf((0, n_max), random order) activation mask:
    n ~ Uniform{0..n_max}, then a uniform size-n subset of the ops
    (matching ``rng.choice(n_ops, size=n, replace=False)`` in the CPU
    tier). Returns a bool (n_ops,) membership mask; op order differences
    are absorbed by the fused composition."""
    kn, kp = jax.random.split(key)
    n = jax.random.randint(kn, (), 0, n_max + 1)
    # position of each op in a random permutation < n  <=>  op in a
    # uniformly random size-n subset
    rank = jnp.argsort(jax.random.permutation(kp, n_ops))
    return rank < n


def _affine_params(key, active):
    """Per-sample random affine parameters (reference ranges), gated by
    the SomeOf membership mask."""
    ks = jax.random.split(key, 6)
    flipud = jnp.logical_and(active[0], jax.random.uniform(ks[0], ()) < 0.5)
    fliplr = jnp.logical_and(active[1], jax.random.uniform(ks[1], ()) < 0.5)
    scale = jnp.where(active[5],
                      jax.random.uniform(ks[2], (2,), minval=0.5, maxval=2.0),
                      jnp.ones(2))
    rot = jnp.where(active[6],
                    jax.random.uniform(ks[3], (), minval=-40.0, maxval=40.0),
                    0.0)
    shear = jnp.where(active[7],
                      jax.random.uniform(ks[4], (), minval=-16.0,
                                         maxval=16.0), 0.0)
    trans = jnp.where(active[9],
                      jax.random.uniform(ks[5], (2,), minval=-0.2,
                                         maxval=0.2), jnp.zeros(2))
    return flipud, fliplr, scale, rot, shear, trans


def _compose_matrix(flipud, fliplr, scale, rot_deg, shear_deg, trans_frac,
                    h, w):
    """Forward 3x3 affine in (x, y), center-origin: Shear∘Rot∘Trans∘Scale
    (same composition as the CPU parity tier, data/augment.py), flips folded
    into the scale signs. Returns (lin 2x2, offset 2)."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    r = jnp.deg2rad(rot_deg)
    sh = jnp.deg2rad(shear_deg)
    sx = scale[0] * jnp.where(fliplr, -1.0, 1.0)
    sy = scale[1] * jnp.where(flipud, -1.0, 1.0)
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    S = jnp.array([[sx, zero, zero], [zero, sy, zero], [zero, zero, one]])
    T = jnp.array([[one, zero, trans_frac[0] * w],
                   [zero, one, trans_frac[1] * h], [zero, zero, one]])
    R = jnp.array([[jnp.cos(r), -jnp.sin(r), zero],
                   [jnp.sin(r), jnp.cos(r), zero], [zero, zero, one]])
    Sh = jnp.array([[one, -jnp.sin(sh), zero],
                    [zero, jnp.cos(sh), zero], [zero, zero, one]])
    C = jnp.array([[one, zero, cx], [zero, one, cy], [zero, zero, one]])
    Ci = jnp.array([[one, zero, -cx], [zero, one, -cy], [zero, zero, one]])
    M = C @ Sh @ R @ T @ S @ Ci
    return M[:2, :2], M[:2, 2]


@functools.lru_cache(maxsize=None)
def _pw_statics(h: int, w: int, qshape_key):
    """Trace-time constants for the piecewise warp: the 4x4 control grid,
    its Delaunay triangulation (fixed topology — the grid is static), the
    inverse vertex matrices, and the per-query-pixel simplex id.

    ``qshape_key`` is a hashable encoding of the static query grid
    ((out_h, out_w) of the zoom grid in input-pixel units)."""
    from scipy.spatial import Delaunay
    out_h, out_w = qshape_key
    yyg = np.linspace(0, h, _PW_GRID)
    xxg = np.linspace(0, w, _PW_GRID)
    xg, yg = np.meshgrid(xxg, yyg)
    src = np.stack([yg.ravel(), xg.ravel()], axis=1)      # (16, 2) (y, x)
    tri = Delaunay(src)
    # static query grid = the zoom-to-patch sample points in input px
    qy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    qx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    gy, gx = np.meshgrid(qy, qx, indexing="ij")
    pix = np.stack([gy.ravel(), gx.ravel()], axis=1)
    sid = tri.find_simplex(pix, tol=1e-8)
    # queries live inside [0,h]x[0,w] by construction of the zoom grid
    assert (sid >= 0).all(), "zoom grid escaped the control hull"
    M = np.concatenate([src[tri.simplices],
                        np.ones((tri.nsimplex, 3, 1))], axis=2)  # (T,3,3)
    Minv = np.linalg.inv(M)
    # cache NUMPY only: jnp constants materialized inside a jit trace are
    # tracers and must not outlive it via the lru_cache
    return (np.asarray(tri.simplices), np.asarray(Minv, np.float32),
            sid.reshape(out_h, out_w))


def _piecewise_map(key, active, gy, gx, h, w):
    """imgaug PiecewiseAffine(scale=(0.008, 0.03)) as a coordinate map
    (augment.py:_op_piecewise semantics): jitter the 4x4 control grid by
    N(0, scale*(h, w)) and send each query pixel through its source
    triangle's affine. Computed in displacement form (coords = pix +
    pix_h @ Minv @ jitter[verts]) so the inactive case is EXACTLY the
    identity. Returns jittered (qy, qx)."""
    simplices, Minv, sid = _pw_statics(h, w, gy.shape)
    ks, kj = jax.random.split(key)
    pscale = jax.random.uniform(ks, (), minval=0.008, maxval=0.03)
    jit = jax.random.normal(kj, (_PW_GRID * _PW_GRID, 2)) \
        * pscale * jnp.array([h, w], jnp.float32)
    jit = jnp.where(active, jit, 0.0)
    D = Minv @ jit[simplices]                       # (T, 3, 2)
    Dp = D[sid]                                     # (oh, ow, 3, 2)
    pixh = jnp.stack([gy, gx, jnp.ones_like(gy)], axis=-1)
    disp = jnp.einsum("hwc,hwcd->hwd", pixh, Dp)

    def snap(c, hi):
        # fp round-off at hull edges: keep boundary pixels in-range like
        # the CPU tier's snap (augment.py:156-160)
        c = jnp.where((c < 0) & (c > -1e-4), 0.0, c)
        return jnp.where((c > hi) & (c < hi + 1e-4), hi, c)

    return (snap(gy + disp[..., 0], h - 1), snap(gx + disp[..., 1], w - 1))


@functools.partial(jax.jit, static_argnames=("out_size",))
def device_augment(key, images: jnp.ndarray, labels: jnp.ndarray,
                   out_size: int = 224) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images/labels: (B, H, W) -> augmented + resized (B, out, out)."""
    B, H, W = images.shape
    keys = jax.random.split(key, B)

    ys = (jnp.arange(out_size) + 0.5) * (H / out_size) - 0.5
    xs = (jnp.arange(out_size) + 0.5) * (W / out_size) - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # output grid in input px

    def one(key, img, lab):
        ka, kp, kw, kn, kb, kc, ke = jax.random.split(key, 7)
        active = someof_active(ka)
        flipud, fliplr, scale, rot, shear, trans = _affine_params(kp, active)
        lin, off = _compose_matrix(flipud, fliplr, scale, rot, shear,
                                   trans, H, W)
        inv = jnp.linalg.inv(lin)
        # piecewise mesh warp first in the coordinate chain (static query
        # grid), then the fused affine inverse map
        qy, qx = _piecewise_map(kw, active[8], gy, gx, H, W)
        src = jnp.einsum("ij,jhw->ihw", inv,
                         jnp.stack([qx - off[0], qy - off[1]]))
        sx_, sy_ = src[0], src[1]

        def bilinear(im):
            x0 = jnp.floor(sx_)
            y0 = jnp.floor(sy_)
            wx = sx_ - x0
            wy = sy_ - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            def take(yi, xi):
                v = im[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
                inside = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
                return jnp.where(inside, v, 0.0)  # imgaug cval=0

            return (take(y0i, x0i) * (1 - wx) * (1 - wy)
                    + take(y0i, x0i + 1) * wx * (1 - wy)
                    + take(y0i + 1, x0i) * (1 - wx) * wy
                    + take(y0i + 1, x0i + 1) * wx * wy)

        def nearest(im):
            xi = jnp.round(sx_).astype(jnp.int32)
            yi = jnp.round(sy_).astype(jnp.int32)
            v = im[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
            inside = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            return jnp.where(inside, v, 0)

        img_o = bilinear(img.astype(jnp.float32))
        lab_o = nearest(lab)

        # photometric ops on the resized image (canonical order)
        img_o = jnp.where(
            active[2],
            img_o + 0.005 * 255 * jax.random.normal(ke, img_o.shape),
            img_o)
        blur = _gaussian_blur(img_o, sigma=1.0)
        img_o = jnp.where(active[3], blur, img_o)
        alpha = jax.random.uniform(kc, (), minval=0.5, maxval=1.5)
        pivot = 0.5
        img_o = jnp.where(active[4], (img_o - pivot) * alpha + pivot, img_o)
        return img_o, lab_o

    return jax.vmap(one)(keys, images, labels)


def _gaussian_blur(img: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Separable Gaussian blur, truncated at 4 sigma; 'symmetric' padding
    == scipy.ndimage.gaussian_filter's default 'reflect' mode (the CPU
    tier's _op_blur)."""
    radius = int(4 * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = [(radius, radius), (0, 0)]
    img_p = jnp.pad(img, pad, mode="symmetric")
    v = jnp.stack([img_p[i:i + img.shape[0]] for i in range(2 * radius + 1)])
    img = jnp.einsum("k,khw->hw", k, v)
    img_p = jnp.pad(img, [(0, 0), (radius, radius)], mode="symmetric")
    v = jnp.stack([img_p[:, i:i + img.shape[1]]
                   for i in range(2 * radius + 1)])
    return jnp.einsum("k,khw->hw", k, v)
