"""Shape/smoke tests for the VMamba stack and legacy decoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.models.vmamba import (
    VSSBlock, MSVSS, LKPE, FLKPE, LegacyDecoder, VSSM, MSVMUNetLegacy,
    PatchMerging2D)


def test_vssblock_shapes():
    m = VSSBlock(dim=32, scan_backend="assoc")
    x = jnp.zeros((2, 8, 8, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape


def test_msvss_stack():
    m = MSVSS(dim=16, depth=2, drop_paths=[0.1, 0.0], scan_backend="assoc")
    x = jnp.zeros((1, 6, 6, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape


def test_lkpe_doubles_resolution():
    m = LKPE(dim=32)
    x = jnp.zeros((1, 4, 4, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 16)


def test_flkpe_final_expand():
    m = FLKPE(dim=24, num_classes=9)
    x = jnp.zeros((1, 4, 4, 24))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 16, 16, 9)


def test_patch_merging():
    m = PatchMerging2D(out_dim=64)
    x = jnp.zeros((1, 7, 9, 32))  # odd dims exercise padding
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 5, 64)


def test_vssm_pyramid():
    m = VSSM(dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
             scan_backend="assoc")
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


def test_legacy_unet_forward():
    m = MSVMUNetLegacy(num_classes=4, enc_name="vssm_test", scan_backend="assoc")
    x = jnp.zeros((1, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 64, 64, 4)
