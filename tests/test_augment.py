"""CPU (parity-tier) augmentation tests."""
import numpy as np
import pytest

from ceigm_unet_tpu.data.augment import augment_seg, AUG_OPS
from ceigm_unet_tpu.data.datasets import make_label_pyramid


def test_policy_shapes_and_label_integrity():
    rng = np.random.default_rng(0)
    img = rng.random((96, 96)).astype(np.float32)
    lab = rng.integers(0, 9, (96, 96)).astype(np.float32)
    for seed in range(8):
        io, lo = augment_seg(np.random.default_rng(seed), img, lab)
        assert io.shape == img.shape and lo.shape == lab.shape
        # labels must stay categorical (geometric ops are order-0)
        assert set(np.unique(lo)).issubset(set(range(9)))


def test_flips_are_exact():
    rng_img = np.random.default_rng(1)
    img = rng_img.random((10, 12)).astype(np.float32)
    lab = rng_img.integers(0, 4, (10, 12)).astype(np.float32)

    class R:  # rng stub that always flips
        def random(self):
            return 0.0
    io, lo = AUG_OPS[0].fn(R(), img, lab)  # Flipud
    np.testing.assert_array_equal(io, img[::-1])
    np.testing.assert_array_equal(lo, lab[::-1])
    io, lo = AUG_OPS[1].fn(R(), img, lab)  # Fliplr
    np.testing.assert_array_equal(io, img[:, ::-1])


def test_rotation_preserves_center():
    """Center-origin rotation keeps the central pixel fixed (odd size)."""
    img = np.zeros((41, 41), np.float32)
    img[20, 20] = 1.0
    lab = np.zeros((41, 41), np.float32)

    class R:
        def uniform(self, a, b):
            return 30.0
    io, _ = AUG_OPS[6].fn(R(), img, lab)  # AffineRotate
    assert io[20, 20] > 0.5  # peak stays at the center


def test_identity_ops_count():
    """SomeOf((0,4)): with n=0 nothing changes."""
    rng = np.random.default_rng(3)
    img = rng.random((32, 32)).astype(np.float32)
    lab = rng.integers(0, 4, (32, 32)).astype(np.float32)

    class R:
        def __init__(self):
            self.r = np.random.default_rng(0)

        def integers(self, a, b):
            return 0  # pick zero ops

        def choice(self, n, size, replace):
            return np.array([], int)
    io, lo = augment_seg(R(), img, lab)
    np.testing.assert_array_equal(io, img)
    np.testing.assert_array_equal(lo, lab)


def test_label_pyramid():
    lab = np.arange(64, dtype=np.float32).reshape(8, 8) % 4
    pyr = make_label_pyramid(lab, [(1, 1), (0.5, 0.5)])
    assert pyr[0].shape == (8, 8)
    assert pyr[1].shape == (4, 4)
    assert set(np.unique(pyr[1])).issubset({0, 1, 2, 3})


# ---------------- PiecewiseAffine (Delaunay mesh warp) ----------------

def test_piecewise_identity():
    from ceigm_unet_tpu.data.augment import piecewise_affine_warp
    rng = np.random.default_rng(0)
    img = rng.random((24, 20)).astype(np.float32)
    lab = (rng.random((24, 20)) * 4).astype(np.float32) // 1
    h, w = img.shape
    yg, xg = np.meshgrid(np.linspace(0, h, 4), np.linspace(0, w, 4),
                         indexing="ij")
    src = np.stack([yg.ravel(), xg.ravel()], axis=1)
    wi, wl = piecewise_affine_warp(img, lab, src, src.copy())
    np.testing.assert_allclose(wi, img, atol=1e-5)
    np.testing.assert_array_equal(wl, lab)


def test_piecewise_pure_translation():
    from ceigm_unet_tpu.data.augment import piecewise_affine_warp
    rng = np.random.default_rng(1)
    img = rng.random((16, 16)).astype(np.float32)
    lab = np.zeros_like(img)
    h, w = img.shape
    yg, xg = np.meshgrid(np.linspace(0, h, 4), np.linspace(0, w, 4),
                         indexing="ij")
    src = np.stack([yg.ravel(), xg.ravel()], axis=1)
    t = np.array([3.0, 2.0])
    # estimate(src -> src + t), applied as the output->input map:
    # out[p] = in[p + t]
    wi, _ = piecewise_affine_warp(img, lab, src, src + t)
    want = np.zeros_like(img)
    want[:h - 3, :w - 2] = img[3:, 2:]
    np.testing.assert_allclose(wi[:h - 4, :w - 3], want[:h - 4, :w - 3],
                               atol=1e-5)


def test_piecewise_op_label_discrete():
    from ceigm_unet_tpu.data.augment import _op_piecewise
    rng = np.random.default_rng(2)
    img = rng.random((32, 32)).astype(np.float32)
    lab = (rng.integers(0, 5, (32, 32))).astype(np.float32)
    wi, wl = _op_piecewise(rng, img, lab)
    assert wi.shape == img.shape
    assert set(np.unique(wl)).issubset(set(np.unique(lab)) | {0.0})
