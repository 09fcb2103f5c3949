"""Fused tap-conv LGAG kernel vs the XLA grouped-conv path (eval mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.models.emcad import LGAG
from ceigm_unet_tpu.ops.tapconv import lgag_gate_eval


def test_lgag_fused_matches_xla():
    rng = np.random.default_rng(0)
    C = 16
    m = LGAG(f_int=C // 2, groups=C // 2)
    g = jnp.asarray(rng.standard_normal((2, 6, 9, C)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 6, 9, C)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), g, x)
    # randomize BN stats so folding is actually exercised
    bs = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(
            rng.random(v.shape).astype(np.float32)) * 0.3,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    want = np.asarray(m.apply(variables, g, x))      # XLA path on CPU

    p = variables["params"]
    st = variables["batch_stats"]
    got = np.asarray(lgag_gate_eval(
        g, x,
        [(p[n]["kernel"], p[n]["bias"])
         for n in ("W_g_1", "W_g_3", "W_g_5", "W_x_1", "W_x_3", "W_x_5")],
        dict(scale=p["bn"]["scale"], bias=p["bn"]["bias"],
             mean=st["bn"]["mean"], var=st["bn"]["var"]),
        p["psi_conv"]["kernel"], p["psi_conv"]["bias"],
        dict(scale=p["psi_bn"]["scale"], bias=p["psi_bn"]["bias"],
             mean=st["psi_bn"]["mean"], var=st["psi_bn"]["var"])))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
