"""Full-model spatial/sequence parallelism: H-sharded forward and
gradients over the virtual 8-device mesh are EXACT vs single-device.

This is the 512²-class scale-out mechanism (SURVEY §5.7/§2.14) run at
test-friendly sizes: the sharding pattern — H-sharded activations, halo
exchanges at every spatial conv, collective pooling reductions, psum'ed
parameter gradients — is identical at 64²/128² and 512²; only the local
shard sizes change. The scan-bound inner path at production sizes is
covered block-exactly by tests/test_sp_ss2d.py + the ring-scan VJP tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ceigm_unet_tpu.models import build_model
from ceigm_unet_tpu.parallel.sp_model import sp_forward, sp_value_and_grad


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


@pytest.fixture(scope="module")
def setup():
    model = build_model(num_classes=4, enc_name="gm_test",
                        scan_backend="assoc")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    return model, variables, x


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_sp_forward_exact(setup):
    model, variables, x = setup
    want = np.asarray(jax.jit(model.apply)(variables, x))
    got = np.asarray(sp_forward(model, variables, x, _mesh()))
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-5 * np.abs(want).max() + 1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_sp_grads_exact(setup):
    from ceigm_unet_tpu.losses import dice_ce_loss
    model, variables, x = setup
    rng = np.random.default_rng(1)
    labels = jnp.asarray(rng.integers(0, 4, x.shape[:3]), jnp.int32)

    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x)
        return dice_ce_loss(logits, labels, ce_weight=0.4, dc_weight=0.6)

    want_l, want_g = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    got_l, got_g = sp_value_and_grad(model, variables, x, labels, _mesh())

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(got_g)[0],
            jax.tree_util.tree_flatten_with_path(want_g)[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-5 * max(1e-3, np.abs(b).max()),
            err_msg=jax.tree_util.keystr(pa))
