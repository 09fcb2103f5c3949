"""Differential parity vs the torch reference model (CPU).

Builds the reference MSVMUNet (with its CUDA scan patched to a sequential
torch implementation), converts its random-init state_dict through
``ceigm_unet_tpu.convert``, and checks that the JAX model reproduces the
torch forward outputs. This is the strongest form of the reference's
cross-implementation differential-testing pattern (SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


@pytest.fixture(scope="module")
def torch_model():
    ref = load_reference()
    import torch
    torch.manual_seed(0)
    net = ref.build_model(in_channels=3, num_classes=9)
    net.eval()
    return net


@pytest.fixture(scope="module")
def jax_variables(torch_model):
    from ceigm_unet_tpu.convert import convert_msvm_unet_state_dict
    sd = {k: v for k, v in torch_model.state_dict().items()}
    return convert_msvm_unet_state_dict(sd)


def test_variable_tree_matches_model(jax_variables):
    """Converted tree must line up leaf-for-leaf with the flax model init."""
    from ceigm_unet_tpu.models import build_model
    m = build_model(num_classes=9)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    init_vars = m.init(jax.random.PRNGKey(0), x)

    def paths(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(k): v.shape for k, v in flat}

    want = paths(init_vars)
    got = paths(jax_variables)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"missing leaves: {missing[:10]}"
    assert not extra, f"extra leaves: {extra[:10]}"
    bad = [k for k in want if want[k] != got[k]]
    assert not bad, f"shape mismatches: {[(k, want[k], got[k]) for k in bad[:10]]}"


def test_encoder_forward_parity(torch_model, jax_variables):
    import torch
    from ceigm_unet_tpu.models import build_groupmamba
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        feats_t = torch_model.encoder(torch.from_numpy(x))

    enc = build_groupmamba("gm_tiny", scan_backend="assoc")
    variables = {"params": jax_variables["params"]["encoder"],
                 "batch_stats": jax_variables["batch_stats"]["encoder"]}
    feats_j = enc.apply(variables, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))

    assert len(feats_t) == len(feats_j) == 4
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        ft = np.asarray(ft)                       # NCHW
        fj = np.transpose(np.asarray(fj), (0, 3, 1, 2))
        np.testing.assert_allclose(
            fj, ft, rtol=1e-3, atol=2e-4,
            err_msg=f"encoder stage {i} mismatch")


def test_full_model_forward_parity(torch_model, jax_variables):
    import torch
    from ceigm_unet_tpu.models import build_model
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)

    with torch.no_grad():
        y_t = np.asarray(torch_model(torch.from_numpy(x)))  # (1, 9, 64, 64)

    m = build_model(num_classes=9, scan_backend="assoc")
    y_j = m.apply(jax_variables, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))

    np.testing.assert_allclose(y_j, y_t, rtol=1e-3, atol=1e-3)
