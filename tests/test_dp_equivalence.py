"""Data-parallel training is numerically EQUIVALENT to single-device.

The reference's latent scale-out is Lightning DDP (gm-unet/
train_synapse.py:211-221, devices="auto"); its correctness contract is
that gradient all-reduce makes the distributed trajectory identical to
the single-process one. This test pins the same contract for the mesh
rebuild: the same batch stepped N times through a mesh(1) and a mesh(8)
train step must produce the same parameters AND the same BatchNorm
running statistics (proving the sync-BN-by-construction claim in
docs/PARITY.md — the batch-axis mean is a global mean regardless of how
the batch is sharded).

Everything is fp32 on CPU; the only tolerance allowed is reassociation
noise from the sharded reductions (~1e-6 relative). The optimizer here is
SGD+momentum, NOT Adam: the first Adam step is ~lr*g/(|g|+eps), which
blows reassociation-level grad noise on near-zero-gradient elements up to
a full step and would make the comparison meaningless (Adam's elementwise
math is covered by test_torch_grad_parity.py; this test proves the
gradient psum and sync-BN are exact).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ceigm_unet_tpu.models import build_model
from ceigm_unet_tpu.parallel import make_mesh, shard_batch
from ceigm_unet_tpu.train.trainstep import (
    create_train_state, make_train_step)

N_STEPS = 3


def _run(n_devices: int):
    import optax
    model = build_model(num_classes=4, enc_name="gm_test",
                        scan_backend="assoc")
    tx = optax.sgd(1e-2, momentum=0.9)
    x0 = jnp.zeros((1, 32, 32, 1), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0, tx)

    rng = np.random.default_rng(42)
    batch = {
        "image": jnp.asarray(rng.standard_normal((8, 32, 32, 1)),
                             jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, (8, 32, 32)), jnp.int32),
    }

    mesh = make_mesh(n_devices)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    batch = shard_batch(mesh, batch)

    step = jax.jit(make_train_step(model, 0.4, 0.6),
                   out_shardings=(repl, repl))
    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(N_STEPS):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k, jnp.asarray(False))
        losses.append(float(m["loss"]))
    return state, losses


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_dp_matches_single_device():
    s1, loss1 = _run(1)
    s8, loss8 = _run(8)

    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)

    for name, t1, t8 in (("params", s1.params, s8.params),
                         ("batch_stats", s1.batch_stats, s8.batch_stats)):
        flat1 = jax.tree_util.tree_flatten_with_path(t1)[0]
        flat8 = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_flatten_with_path(t8)[0]}
        assert flat1 and len(flat1) == len(flat8)
        bad = []
        for k, v1 in flat1:
            key = jax.tree_util.keystr(k)
            a, b = np.asarray(v1), np.asarray(flat8[key])
            atol = 1e-8 + 1e-5 * max(np.abs(a).max(), np.abs(b).max())
            if not np.allclose(a, b, rtol=1e-5, atol=atol):
                bad.append((key, float(np.abs(a - b).max())))
        assert not bad, f"{name}: {len(bad)} diverging leaves: {bad[:6]}"
