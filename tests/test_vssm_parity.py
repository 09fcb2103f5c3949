"""VSSM (VMamba backbone) parity vs the torch reference (CPU, tiny run).

Verifies the k_group=4 / v05_noz SS2D flavor numerically: reference
VSSM built through the vmamba encoder factory (Triton kernels patched with
the eager layout functions, CUDA scan patched sequential), weights
converted with convert_vssm_state_dict, stage features compared.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def test_vssm_stage_features_match():
    ref = load_reference()
    import torch
    from model.vmamba import build_tiny_0230s

    torch.manual_seed(0)
    net = build_tiny_0230s(ckpt=None)
    net.eval()

    from ceigm_unet_tpu.convert.vssm_import import convert_vssm_state_dict
    from ceigm_unet_tpu.models.vmamba import VSSM, VSSM_CONFIGS

    params = convert_vssm_state_dict(net.state_dict(),
                                     depths=(2, 2, 8, 2))
    m = VSSM(scan_backend="assoc", **VSSM_CONFIGS["tiny_0230s"])

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        feats_t = net(torch.from_numpy(x))  # [input, stage1..4] channel-first

    feats_j = m.apply({"params": params},
                      jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))

    assert len(feats_t) == 5  # reference prepends the raw input
    for i, fj in enumerate(feats_j):
        ft = np.asarray(feats_t[i + 1])
        fj = np.transpose(np.asarray(fj), (0, 3, 1, 2))
        np.testing.assert_allclose(
            fj, ft, rtol=2e-3, atol=2e-3, err_msg=f"stage {i}")
