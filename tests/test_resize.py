"""Exactness of the matmul-based zoom vs scipy.ndimage.zoom."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import zoom as scipy_zoom

from ceigm_unet_tpu.ops.resize import zoom_slices, zoom_slices_nearest


@pytest.mark.parametrize("shape,out", [((512, 512), (224, 224)),
                                       ((224, 224), (512, 512)),
                                       ((256, 190), (224, 224)),
                                       ((224, 224), (224, 224))])
def test_cubic_zoom_matches_scipy(shape, out):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    want = scipy_zoom(x, (out[0] / shape[0], out[1] / shape[1]), order=3)
    got = np.asarray(zoom_slices(jnp.asarray(x), out, order=3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,out", [((224, 224), (512, 512)),
                                       ((512, 512), (224, 224)),
                                       ((190, 411), (224, 224))])
def test_nearest_zoom_matches_scipy(shape, out):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 9, shape).astype(np.int32)
    want = scipy_zoom(x, (out[0] / shape[0], out[1] / shape[1]), order=0)
    got = np.asarray(zoom_slices_nearest(jnp.asarray(x), out))
    np.testing.assert_array_equal(got, want)


def test_batched_zoom():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 100, 120)).astype(np.float32)
    got = np.asarray(zoom_slices(jnp.asarray(x), (224, 224)))
    for i in range(5):
        want = scipy_zoom(x[i], (2.24, 224 / 120), order=3)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)
