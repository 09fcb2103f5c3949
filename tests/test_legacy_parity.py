"""Legacy MSVM-UNet decoder numeric parity vs the torch reference (CPU).

Extends the converted-weights differential pattern of test_torch_parity.py
to the published MSVM-UNet decoder (reference decoder.py:2371-2683:
MSVSS / LKPE / FLKPE / UpBlock / Decoder) and the full MSVMUNetLegacy
assembly (VSSM tiny encoder + legacy decoder, the Encoder wiring of
model/encoder.py:9-46 — pre-downsample stage features)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

DIMS = (96, 192, 384, 768)   # tiny_0230s


@pytest.fixture(scope="module")
def torch_decoder():
    load_reference()
    import torch
    from model.decoder import Decoder
    torch.manual_seed(0)
    dec = Decoder(dims=list(DIMS)[::-1], num_classes=9)
    dec.eval()
    return dec


def _rand_feats(rng, batch=1, base=16):
    """Reversed pyramid [768@hw, 384@2hw, 192@4hw, 96@8hw], NCHW numpy."""
    shapes = [(batch, DIMS[3 - i], base * 2 ** i, base * 2 ** i)
              for i in range(4)]
    return [rng.standard_normal(s).astype(np.float32) * 0.5 for s in shapes]


def test_legacy_decoder_forward_parity(torch_decoder):
    import torch
    from ceigm_unet_tpu.convert.vssm_import import (
        convert_legacy_decoder_state_dict)
    from ceigm_unet_tpu.models.vmamba import LegacyDecoder

    rng = np.random.default_rng(0)
    feats = _rand_feats(rng, base=2)

    with torch.no_grad():
        y_t = np.asarray(torch_decoder([torch.from_numpy(f) for f in feats]))

    params, stats = convert_legacy_decoder_state_dict(
        torch_decoder.state_dict())
    dec = LegacyDecoder(dims=list(DIMS)[::-1], num_classes=9,
                        scan_backend="assoc")
    feats_j = [jnp.transpose(jnp.asarray(f), (0, 2, 3, 1)) for f in feats]
    y_j = dec.apply({"params": params, "batch_stats": stats}, feats_j)
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))

    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, rtol=1e-3, atol=1e-3)


def test_legacy_decoder_param_tree_matches(torch_decoder):
    from ceigm_unet_tpu.convert.vssm_import import (
        convert_legacy_decoder_state_dict)
    from ceigm_unet_tpu.models.vmamba import LegacyDecoder

    params, stats = convert_legacy_decoder_state_dict(
        torch_decoder.state_dict())
    dec = LegacyDecoder(dims=list(DIMS)[::-1], num_classes=9,
                        scan_backend="assoc")
    feats = [jnp.zeros((1, 2 * 2 ** i, 2 * 2 ** i, DIMS[3 - i]))
             for i in range(4)]
    init = dec.init(jax.random.PRNGKey(0), feats)

    def paths(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(k): v.shape for k, v in flat}

    for col, got_tree in (("params", params), ("batch_stats", stats)):
        want = paths(init[col])
        got = paths(got_tree)
        assert sorted(want) == sorted(got), (
            col, sorted(set(want) ^ set(got))[:8])
        bad = [k for k in want if want[k] != got[k]]
        assert not bad, [(k, want[k], got[k]) for k in bad[:8]]


def test_msvm_legacy_full_model_parity():
    load_reference()
    import torch
    from model.vmamba import build_tiny_0230s
    from model.decoder import Decoder

    torch.manual_seed(1)
    enc = build_tiny_0230s(ckpt=None)
    enc.eval()
    dec = Decoder(dims=list(DIMS)[::-1], num_classes=9)
    dec.eval()

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)

    # reference Encoder wiring (model/encoder.py:30-46): repeat to 3ch,
    # patch_embed, then per stage [layer -> collect feat -> downsample]
    with torch.no_grad():
        xt = torch.from_numpy(x).repeat(1, 3, 1, 1)
        h = enc.patch_embed(xt)
        feats_t = []
        for i, layer in enumerate(enc.layers):
            h = layer(h)
            feats_t.append(h)
            h = enc.downsamples[i](h)
        y_t = np.asarray(dec(feats_t[::-1]))

    from ceigm_unet_tpu.convert.vssm_import import (
        convert_msvm_legacy_state_dict)
    from ceigm_unet_tpu.models.vmamba import MSVMUNetLegacy

    variables = convert_msvm_legacy_state_dict(enc.state_dict(),
                                               dec.state_dict())
    m = MSVMUNetLegacy(num_classes=9, enc_name="tiny_0230s",
                       scan_backend="assoc")
    y_j = m.apply(variables, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))

    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, rtol=1e-3, atol=1e-3)
