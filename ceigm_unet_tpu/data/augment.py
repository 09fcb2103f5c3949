"""CPU augmentation pipeline (parity tier).

Reimplements the reference's imgaug policy (gm-unet/dataset_synapse.py:61-72)
in numpy/scipy — imgaug is not available here, so each op is written from
its documented semantics:

    SomeOf((0, 4), random order, each op applied to image and (one-hot)
    segmentation map:
      Flipud(0.5), Fliplr(0.5), AdditiveGaussianNoise(0.005*255),
      GaussianBlur(sigma=1.0), LinearContrast((0.5, 1.5), per_channel=0.5),
      Affine(scale x/y (0.5, 2)), Affine(rotate ±40°), Affine(shear ±16°),
      PiecewiseAffine(scale (0.008, 0.03)), Affine(translate ±20%)

Geometric ops use scipy.ndimage.affine_transform with imgaug's conventions
(center-origin, order-1 image / order-0 mask, constant fill 0).
PiecewiseAffine reimplements imgaug's Delaunay mesh warp exactly (regular
4x4 control grid incl. borders, N(0, scale*size) jitter, per-triangle
affine over the source triangulation — the skimage
PiecewiseAffineTransform algorithm imgaug delegates to). Label maps ride through geometry as one-hot stacks then
argmax back, mirroring augment_seg (dataset_synapse.py:32-41).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np
from scipy import ndimage


Sample = Tuple[np.ndarray, np.ndarray]   # image (H, W), label (H, W)


def _affine_matrix(scale=(1.0, 1.0), rotate_deg=0.0, shear_deg=0.0,
                   translate=(0.0, 0.0), center=(0.0, 0.0)) -> np.ndarray:
    """Forward 3x3 affine in (x, y) convention, centered at ``center``."""
    sx, sy = scale
    r = np.deg2rad(rotate_deg)
    sh = np.deg2rad(shear_deg)
    cx, cy = center
    # imgaug order: scale, translate, rotate, shear around the image center
    S = np.array([[sx, 0, 0], [0, sy, 0], [0, 0, 1.0]])
    T = np.array([[1, 0, translate[0]], [0, 1, translate[1]], [0, 0, 1.0]])
    R = np.array([[np.cos(r), -np.sin(r), 0], [np.sin(r), np.cos(r), 0],
                  [0, 0, 1.0]])
    Sh = np.array([[1, -np.sin(sh), 0], [0, np.cos(sh), 0], [0, 0, 1.0]])
    C = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
    Ci = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    return C @ Sh @ R @ T @ S @ Ci


def _apply_affine(img: np.ndarray, mat: np.ndarray, order: int) -> np.ndarray:
    """Warp with the forward matrix ``mat`` ((x, y) convention)."""
    inv = np.linalg.inv(mat)
    # scipy works in (row, col) = (y, x): swap
    m = np.array([[inv[1, 1], inv[1, 0]], [inv[0, 1], inv[0, 0]]])
    off = np.array([inv[1, 2], inv[0, 2]])
    from ceigm_unet_tpu import native
    if native.available():
        # single-pass C++ warp, scipy 'constant' semantics (tested
        # against the scipy path in tests/test_native_aug.py)
        return native.affine_warp(np.asarray(img, np.float32), m, off,
                                  order)
    return ndimage.affine_transform(img, m, offset=off, order=order,
                                    mode="constant", cval=0.0,
                                    output=np.float32)


@dataclasses.dataclass
class _Op:
    name: str
    fn: Callable  # (rng, img, lab) -> (img, lab)


def _geom(rng, img, lab, **kw):
    h, w = img.shape
    mat = _affine_matrix(center=((w - 1) / 2, (h - 1) / 2), **kw)
    return (_apply_affine(img, mat, order=1),
            _apply_affine(lab, mat, order=0))


def _op_flipud(rng, img, lab):
    if rng.random() < 0.5:
        return img[::-1].copy(), lab[::-1].copy()
    return img, lab


def _op_fliplr(rng, img, lab):
    if rng.random() < 0.5:
        return img[:, ::-1].copy(), lab[:, ::-1].copy()
    return img, lab


def _op_noise(rng, img, lab):
    # float32 ziggurat draw: same N(0, 1.275) distribution at half the
    # cost of drawing float64 and casting (4 -> 2 ms on a 512^2 slice)
    n = rng.standard_normal(img.shape, dtype=np.float32)
    return img + n * np.float32(0.005 * 255), lab


def _op_blur(rng, img, lab):
    return ndimage.gaussian_filter(img, 1.0, output=np.float32), lab


def _op_contrast(rng, img, lab):
    alpha = rng.uniform(0.5, 1.5)
    # imgaug LinearContrast pivots at 127 for uint-scaled data; medical
    # slices here are [0, 1] floats — pivot at 0.5 of the dynamic range.
    pivot = 0.5 if img.max() <= 2.0 else 127.0
    return ((img - pivot) * alpha + pivot).astype(np.float32), lab


def _op_scale(rng, img, lab):
    return _geom(rng, img, lab,
                 scale=(rng.uniform(0.5, 2.0), rng.uniform(0.5, 2.0)))


def _op_rotate(rng, img, lab):
    return _geom(rng, img, lab, rotate_deg=rng.uniform(-40, 40))


def _op_shear(rng, img, lab):
    return _geom(rng, img, lab, shear_deg=rng.uniform(-16, 16))


def _op_translate(rng, img, lab):
    h, w = img.shape
    return _geom(rng, img, lab,
                 translate=(rng.uniform(-0.2, 0.2) * w,
                            rng.uniform(-0.2, 0.2) * h))


def piecewise_affine_warp(img, lab, points_src, points_dst):
    """Warp via per-triangle affine maps over Delaunay(points_src) — the
    skimage PiecewiseAffineTransform algorithm (triangulate the source
    grid; each output pixel inside source-triangle T maps through T's
    affine src->dst into input coordinates; sample order-1 image /
    order-0 label, constant cval 0).
    """
    from scipy.spatial import Delaunay
    h, w = img.shape
    tri = Delaunay(points_src)

    from ceigm_unet_tpu import native
    if native.available() and tri.nsimplex <= 256:
        # fused C++ pass: per-pixel triangle location + affine + sampling
        # of image (order 1) and label (order 0) together. The per-
        # triangle affines are solved here exactly as the numpy branch
        # solves them (batched np.linalg.solve over the same vertex
        # systems), so both branches evaluate identical maps.
        v = tri.simplices                                   # (ns, 3)
        src = points_src[v]                                 # (ns, 3, 2)
        dst = points_dst[v]
        M = np.concatenate([src, np.ones((tri.nsimplex, 3, 1))], axis=2)
        AB = np.linalg.solve(M, dst)                        # (ns, 3, 2)
        aff = np.stack([AB[:, 0, 0], AB[:, 1, 0], AB[:, 2, 0],
                        AB[:, 0, 1], AB[:, 1, 1], AB[:, 2, 1]], axis=1)
        verts = src.reshape(tri.nsimplex, 6)
        wi, wl = native.piecewise_warp(np.asarray(img, np.float32),
                                       np.asarray(lab, np.float32),
                                       aff, verts)
        return wi, wl

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float64)
    # tol: hull-edge pixels (x=0 / y=0 rows lie exactly on boundary
    # triangles) must not fall to the cval region through fp round-off
    simplex = tri.find_simplex(pix, tol=1e-8)

    coords = np.zeros((h * w, 2))
    outside = simplex < 0
    for s in range(tri.nsimplex):
        m = simplex == s
        if not m.any():
            continue
        v = tri.simplices[s]
        src = points_src[v]                      # (3, 2) rows (y, x)
        dst = points_dst[v]
        # affine A, b with dst = A @ src + b (solved from 3 vertex pairs)
        M = np.concatenate([src, np.ones((3, 1))], axis=1)  # (3, 3)
        AB = np.linalg.solve(M, dst)             # (3, 2)
        coords[m] = pix[m] @ AB[:2] + AB[2]
    coords[outside] = -1.0                       # cval region

    def snap(c, hi):
        """fp round-off in the affine solve lands boundary pixels at
        -1e-16 / hi+1e-16; scipy's constant mode would zero them."""
        c = np.where((c < 0) & (c > -1e-6), 0.0, c)
        return np.where((c > hi) & (c < hi + 1e-6), hi, c)

    cy = snap(coords[:, 0], h - 1).reshape(h, w)
    cx = snap(coords[:, 1], w - 1).reshape(h, w)
    wi = ndimage.map_coordinates(img, [cy, cx], order=1, mode="constant")
    wl = ndimage.map_coordinates(lab, [cy, cx], order=0, mode="constant")
    return wi.astype(np.float32), wl


def _op_piecewise(rng, img, lab):
    """imgaug PiecewiseAffine(scale=(0.008, 0.03)) semantics (reference
    dataset_synapse.py:70): a 4x4 regular grid of control points spanning
    [0, h] x [0, w] (np.linspace, borders included), each jittered by
    N(0, scale * (h, w)); warp = piecewise affine over the Delaunay
    triangulation of the grid, order-1 image / order-0 mask, cval 0 —
    imgaug delegates to skimage.PiecewiseAffineTransform, reimplemented
    exactly in :func:`piecewise_affine_warp` (scipy.spatial.Delaunay is
    the same Qhull triangulation skimage uses)."""
    h, w = img.shape
    scale = rng.uniform(0.008, 0.03)
    grid = 4
    yyg = np.linspace(0, h, grid)
    xxg = np.linspace(0, w, grid)
    xg, yg = np.meshgrid(xxg, yyg)
    src = np.stack([yg.ravel(), xg.ravel()], axis=1)
    jitter = rng.normal(0, scale, (grid * grid, 2))
    dst = src + jitter * np.array([h, w])
    return piecewise_affine_warp(img, lab, src, dst)


AUG_OPS: List[_Op] = [
    _Op("Flipud", _op_flipud),
    _Op("Fliplr", _op_fliplr),
    _Op("AdditiveGaussianNoise", _op_noise),
    _Op("GaussianBlur", _op_blur),
    _Op("LinearContrast", _op_contrast),
    _Op("AffineScale", _op_scale),
    _Op("AffineRotate", _op_rotate),
    _Op("AffineShear", _op_shear),
    _Op("PiecewiseAffine", _op_piecewise),
    _Op("AffineTranslate", _op_translate),
]


def augment_seg(rng: np.random.Generator, img: np.ndarray,
                lab: np.ndarray) -> Sample:
    """SomeOf((0, 4)) in random order (reference dataset_synapse.py:61-72)."""
    img = np.asarray(img, np.float32)
    lab = np.asarray(lab, np.float32)
    n = rng.integers(0, 5)
    picks = rng.choice(len(AUG_OPS), size=n, replace=False)
    for i in picks:  # rng.choice order is already random
        img, lab = AUG_OPS[i].fn(rng, img, lab)
    return img, lab.astype(np.float32)
