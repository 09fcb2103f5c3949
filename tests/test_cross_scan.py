"""Cross-scan layout tests: scan∘merge identity and direction semantics.

Mirrors the reference's eager definitions (gm-unet/model/gm/csms6s.py:56-206)
and its CHECK.check_csm_triton odd-size coverage
(model/vmamba/csm_triton.py:649+), including odd width 57.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.ops.cross_scan import (
    cross_scan_1d, cross_merge_1d, cross_scan_4d, cross_merge_4d)


@pytest.mark.parametrize("H,W", [(8, 8), (7, 13), (3, 57)])
@pytest.mark.parametrize("direction", [1, 2, 3, 4])
def test_roundtrip_identity(H, W, direction):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H, W, 5)), jnp.float32)
    y = cross_scan_1d(x, direction)
    assert y.shape == (2, 5, H * W)
    x2 = cross_merge_1d(y, direction, H, W)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_direction_semantics():
    """Direction layouts match the reference definitions exactly."""
    H, W = 3, 4
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    flat = np.arange(H * W, dtype=np.float32)
    # 1: row-major
    np.testing.assert_array_equal(
        np.asarray(cross_scan_1d(x, 1))[0, 0], flat)
    # 2: column-major (transpose H,W then flatten)
    col = np.arange(H * W).reshape(H, W).T.reshape(-1).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(cross_scan_1d(x, 2))[0, 0], col)
    # 3: flipped row-major
    np.testing.assert_array_equal(
        np.asarray(cross_scan_1d(x, 3))[0, 0], flat[::-1])
    # 4: flipped column-major
    np.testing.assert_array_equal(
        np.asarray(cross_scan_1d(x, 4))[0, 0], col[::-1])


def test_4d_stack_and_merge():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 9, 4)), jnp.float32)
    ys = cross_scan_4d(x)
    assert ys.shape == (2, 4, 4, 54)
    # merging the scan of x returns 4*x (each direction contributes x)
    merged = cross_merge_4d(ys, 6, 9)
    np.testing.assert_allclose(np.asarray(merged), 4 * np.asarray(x),
                               rtol=1e-6)
