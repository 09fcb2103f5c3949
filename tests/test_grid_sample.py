"""grid_sample implementations: gather vs matmul formulations must agree,
and both must match torch.nn.functional.grid_sample semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.ops.grid_sample import (
    grid_sample_bilinear, grid_sample_bilinear_mm)


@pytest.mark.parametrize("shape,oshape", [((2, 8, 8, 4), (10, 12)),
                                          ((1, 7, 5, 3), (14, 10))])
def test_mm_matches_gather(shape, oshape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.3, 1.3, (shape[0],) + oshape + (2,)),
                       jnp.float32)
    a = grid_sample_bilinear(x, grid)
    b = grid_sample_bilinear_mm(x, grid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_matches_torch():
    import torch
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 9, 3)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (2, 5, 7, 2)).astype(np.float32)
    want = torch.nn.functional.grid_sample(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(grid),
        mode="bilinear", align_corners=False, padding_mode="border")
    want = np.asarray(want).transpose(0, 2, 3, 1)
    for fn in (grid_sample_bilinear, grid_sample_bilinear_mm):
        got = np.asarray(fn(jnp.asarray(x), jnp.asarray(grid)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=fn.__name__)
