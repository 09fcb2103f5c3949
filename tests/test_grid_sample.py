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


def test_fused_kernel_matches_mm_interpret(monkeypatch):
    """The Pallas fused path (in-kernel hat-weight build) vs the mm
    formulation, in interpret mode; multi-tile grid forced via _gs_tile."""
    import ceigm_unet_tpu.ops.grid_sample as gs
    rng = np.random.default_rng(2)
    B, H, W, C = 8, 8, 8, 6
    Ho = Wo = 16
    x32 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (B, Ho, Wo, 2)), jnp.float32)

    for dtype, rtol, atol in ((jnp.float32, 1e-5, 1e-5),
                              (jnp.bfloat16, 3e-2, 3e-2)):
        x = jnp.asarray(x32, dtype)
        want = np.asarray(gs.grid_sample_bilinear_mm(x, grid), np.float32)
        got = np.asarray(gs._gs_fused_impl(x, grid, interpret=True),
                         np.float32)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=f"whole-P {dtype}")
        # force the tiled path (2 output-pixel tiles per image)
        monkeypatch.setattr(gs, "_gs_tile", lambda *a: Ho * Wo // 2)
        got = np.asarray(gs._gs_fused_impl(x, grid, interpret=True),
                         np.float32)
        monkeypatch.undo()
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=f"tiled {dtype}")


def test_gs_tile_divisor():
    from ceigm_unet_tpu.ops.grid_sample import _gs_tile
    # finest DySample stage: 56x56 -> 112x112, whole-P scratch too big;
    # the largest lane-aligned divisor of P=12544 under budget is 896
    assert _gs_tile(56, 56, 112 * 112) == 896
    # coarser stages fit whole-P
    assert _gs_tile(28, 28, 56 * 56) == 56 * 56
    assert _gs_tile(14, 14, 28 * 28) == 28 * 28


def test_band_tile():
    from ceigm_unet_tpu.ops.grid_sample import _band_tile
    # the real finest 224-squared DySample stage (eucb1, 28 -> 56): no
    # lane-aligned divisor tile exists; T=16 with row padding (3.5 -> 4
    # tiles) is the only candidate
    assert _band_tile(56, 56, 28) == 16
    # mid stage (14 -> 28): band >= half the input height, not worth it
    assert _band_tile(28, 28, 14) is None
    # 512-squared stages
    assert _band_tile(128, 128, 64) == 8     # d1 (64 -> 128), measured
    assert _band_tile(64, 64, 32) == 4       # d2 (32 -> 64)


def _dysample_like_grid(rng, B, H, W, wobble=0.75):
    """Normalized 2x grid whose pixel coords are oy//2 (ox//2) plus a
    bounded wobble — the DySample coordinate structure the banded kernel
    is specialized for."""
    Ho, Wo = 2 * H, 2 * W
    oy = np.arange(Ho)[None, :, None] // 2
    ox = np.arange(Wo)[None, None, :] // 2
    py = oy + rng.uniform(-wobble, wobble, (B, Ho, Wo))
    px = ox + rng.uniform(-wobble, wobble, (B, Ho, Wo))
    gy = (2.0 * py + 1.0) / H - 1.0
    gx = (2.0 * px + 1.0) / W - 1.0
    return jnp.asarray(np.stack([gx, gy], -1), jnp.float32)


@pytest.mark.parametrize("B,H,W,C,T", [(8, 32, 32, 5, 4),
                                       (4, 28, 28, 32, 16)])
def test_banded_kernel_matches_mm_interpret(B, H, W, C, T):
    """The banded Pallas path vs the exact mm formulation on an in-band
    DySample-style grid (interpret mode, CPU). The second case is the
    real eucb1 geometry (28 -> 56), which exercises the row-padded
    tiling (T=16, 3.5 -> 4 tiles + output slice)."""
    import ceigm_unet_tpu.ops.grid_sample as gs
    rng = np.random.default_rng(3)
    assert gs._band_tile(2 * H, 2 * W, H) == T
    x32 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    grid = _dysample_like_grid(rng, B, H, W)
    for dtype, rtol, atol in ((jnp.float32, 1e-5, 1e-5),
                              (jnp.bfloat16, 3e-2, 3e-2)):
        x = jnp.asarray(x32, dtype)
        want = np.asarray(gs.grid_sample_bilinear_mm(x, grid), np.float32)
        got = np.asarray(gs._gs_banded_impl(x, grid, interpret=True),
                         np.float32)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=f"banded {dtype}")


def test_grouped_banded_kernel_matches_ref_interpret():
    """The group-fused banded kernel vs the regroup + mm composition at
    the real eucb1 geometry (28 -> 56, C=128, g=4; T=16 row-padded)."""
    import ceigm_unet_tpu.ops.grid_sample as gs
    rng = np.random.default_rng(5)
    B, H, W, C, g = 4, 28, 28, 128, 4
    x32 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    grids = np.stack([np.asarray(_dysample_like_grid(rng, B, H, W))
                      for _ in range(g)], axis=3)     # (B, Ho, Wo, g, 2)
    grid = jnp.asarray(grids, jnp.float32)

    def ref(x):
        cg = C // g
        xg = x.reshape(B, H, W, g, cg).transpose(0, 3, 1, 2, 4)
        xg = xg.reshape(B * g, H, W, cg)
        gg = grid.transpose(0, 3, 1, 2, 4).reshape(B * g, 2 * H, 2 * W, 2)
        out = gs.grid_sample_bilinear_mm(xg, gg)
        return out.reshape(B, g, 2 * H, 2 * W, cg).transpose(
            0, 2, 3, 1, 4).reshape(B, 2 * H, 2 * W, C)

    for dtype, rtol, atol in ((jnp.float32, 1e-5, 1e-5),
                              (jnp.bfloat16, 3e-2, 3e-2)):
        x = jnp.asarray(x32, dtype)
        want = np.asarray(ref(x), np.float32)
        got = np.asarray(gs._gs_banded_groups_impl(x, grid, interpret=True),
                         np.float32)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=f"grouped banded {dtype}")


def test_grouped_dense_mode_matches_ref():
    """No valid band tiling (eucb2/d3 geometries) -> degenerate
    whole-image mode: one lane-padded tile, bandH == H."""
    import ceigm_unet_tpu.ops.grid_sample as gs
    rng = np.random.default_rng(7)
    B, H, W, g, cg = 2, 14, 14, 4, 8
    C = g * cg
    assert gs._band_tile(2 * H, 2 * W, H) is None
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    grids = np.stack([np.asarray(_dysample_like_grid(rng, B, H, W))
                      for _ in range(g)], axis=3)
    grid = jnp.asarray(grids, jnp.float32)
    want = np.asarray(gs._dysample_ref(x, grid), np.float32)
    got = np.asarray(gs._gs_banded_groups_impl(x, grid, interpret=True),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grouped_banded_odd_group_width():
    """Cg that is not lane-aligned (eucb2's 87) must still mask exactly."""
    import ceigm_unet_tpu.ops.grid_sample as gs
    rng = np.random.default_rng(6)
    B, H, W, g, cg = 2, 32, 32, 4, 5
    C = g * cg
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    grids = np.stack([np.asarray(_dysample_like_grid(rng, B, H, W))
                      for _ in range(g)], axis=3)
    grid = jnp.asarray(grids, jnp.float32)
    want = np.asarray(gs._dysample_ref(x, grid), np.float32)
    got = np.asarray(gs._gs_banded_groups_impl(x, grid, interpret=True),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_banded_kernel_out_of_band_clamps():
    """Coordinates beyond the band must clamp to its edge (never read
    garbage): with a huge wobble the result still lies within the global
    min/max of the input image."""
    import ceigm_unet_tpu.ops.grid_sample as gs
    rng = np.random.default_rng(4)
    B, H, W, C = 8, 32, 32, 4
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    grid = _dysample_like_grid(rng, B, H, W, wobble=20.0)
    out = np.asarray(gs._gs_banded_impl(x, grid, interpret=True))
    assert np.all(np.isfinite(out))
    assert out.max() <= float(x.max()) + 1e-5
    assert out.min() >= float(x.min()) - 1e-5


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
