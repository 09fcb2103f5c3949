"""Differentials for the native (C++) host warp kernels.

The native tier must reproduce the scipy-based parity tier: affine
warps vs scipy.ndimage.affine_transform (order 0 and 1, 'constant'
semantics), and the fused piecewise warp vs the pure-numpy branch of
piecewise_affine_warp. The toolchain (g++) is part of this image, so a
failed build is a FAILURE, not a skip.
"""
from __future__ import annotations

import numpy as np
import pytest
from scipy import ndimage

from ceigm_unet_tpu import native
from ceigm_unet_tpu.data import augment


def test_native_builds():
    assert native.available(), "g++ build of augwarp.cpp failed"


def _rand_affine(rng):
    return augment._affine_matrix(
        scale=(rng.uniform(0.5, 2.0), rng.uniform(0.5, 2.0)),
        rotate_deg=rng.uniform(-40, 40),
        shear_deg=rng.uniform(-16, 16),
        translate=(rng.uniform(-40, 40), rng.uniform(-40, 40)),
        center=(101.5, 77.0))


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_affine_warp_matches_scipy(order, seed):
    rng = np.random.default_rng(seed)
    img = rng.random((155, 204)).astype(np.float32)
    mat = _rand_affine(rng)
    inv = np.linalg.inv(mat)
    m = np.array([[inv[1, 1], inv[1, 0]], [inv[0, 1], inv[0, 0]]])
    off = np.array([inv[1, 2], inv[0, 2]])

    got = native.affine_warp(img, m, off, order)
    want = ndimage.affine_transform(img, m, offset=off, order=order,
                                    mode="constant", cval=0.0,
                                    output=np.float32)
    if order == 1:
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    else:
        mismatch = np.mean(got != want)
        assert mismatch <= 1e-4, f"order-0 mismatch fraction {mismatch}"


def test_affine_boundary_semantics():
    """Pure translation by a fractional offset: scipy 'constant' yields
    cval for ANY raw coordinate outside [0, size-1] (no partial
    interpolation at the border)."""
    img = np.arange(36, dtype=np.float32).reshape(6, 6) + 1.0
    m = np.eye(2)
    for off in ([-0.5, 0.0], [0.0, -0.5], [0.3, 0.7], [5.0, 0.0]):
        off = np.asarray(off, np.float64)
        for order in (0, 1):
            got = native.affine_warp(img, m, off, order)
            want = ndimage.affine_transform(img, m, offset=off,
                                            order=order, mode="constant",
                                            cval=0.0, output=np.float32)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def _numpy_piecewise(img, lab, src, dst, monkeypatch):
    with monkeypatch.context() as mp:
        mp.setattr(native, "_lib", None)
        mp.setattr(native, "_tried", True)
        assert not native.available()
        return augment.piecewise_affine_warp(img, lab, src, dst)


@pytest.mark.parametrize("seed", [0, 3])
def test_piecewise_warp_matches_numpy(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    h, w = 131, 117
    img = rng.random((h, w)).astype(np.float32)
    lab = rng.integers(0, 9, (h, w)).astype(np.float32)
    grid = 4
    xg, yg = np.meshgrid(np.linspace(0, w, grid), np.linspace(0, h, grid))
    src = np.stack([yg.ravel(), xg.ravel()], axis=1)
    dst = src + rng.normal(0, 0.02, (grid * grid, 2)) * np.array([h, w])

    wi_n, wl_n = augment.piecewise_affine_warp(img, lab, src, dst)
    assert native.available()  # the call above must have used the kernel
    wi_p, wl_p = _numpy_piecewise(img, lab, src, dst, monkeypatch)

    np.testing.assert_allclose(wi_n, wi_p, rtol=0, atol=1e-4)
    mismatch = np.mean(wl_n != wl_p)
    assert mismatch <= 1e-4, f"label mismatch fraction {mismatch}"
    assert wi_n.dtype == np.float32 and wl_n.dtype == np.float32


@pytest.mark.parametrize("shape", [(512, 512), (317, 428), (96, 96),
                                   (10, 17)])
def test_zoom_host_matches_scipy_order3(shape):
    from scipy.ndimage import zoom as scipy_zoom
    from ceigm_unet_tpu.ops.resize import zoom_host
    rng = np.random.default_rng(shape[0])
    img = rng.random(shape).astype(np.float32)
    h, w = shape
    got = zoom_host(img, (224, 224), order=3)
    want = scipy_zoom(img, (224 / h, 224 / w), order=3)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


@pytest.mark.parametrize("out", [(224, 224), (112, 112), (56, 56)])
def test_zoom_host_matches_scipy_order0(out):
    from scipy.ndimage import zoom as scipy_zoom
    from ceigm_unet_tpu.ops.resize import zoom_host
    rng = np.random.default_rng(1)
    lab = rng.integers(0, 9, (512, 512)).astype(np.float32)
    got = zoom_host(lab, out, order=0)
    want = scipy_zoom(lab, (out[0] / 512, out[1] / 512), order=0)
    np.testing.assert_array_equal(got, want)


def test_augment_seg_native_smoke():
    """Full policy runs through the native tier and stays well-formed;
    the rng stream (and thus bit-reproducibility of draws) is unchanged
    by which tier executes."""
    rng = np.random.default_rng(42)
    img = rng.random((96, 96)).astype(np.float32)
    lab = rng.integers(0, 5, (96, 96)).astype(np.float32)
    out_i, out_l = augment.augment_seg(np.random.default_rng(7), img, lab)
    assert out_i.shape == img.shape and out_l.shape == lab.shape
    assert out_i.dtype == np.float32
    assert set(np.unique(out_l)).issubset(set(np.unique(lab)) | {0.0})
