"""DP inference: the multi-chip 5k claim's two load-bearing facts,
asserted on the virtual 8-device CPU mesh (r4 verdict #3):

1. the compiled batch-sharded inference module contains ZERO cross-device
   collectives (inference is embarrassingly data-parallel: params
   replicated, eval-mode BatchNorm uses running stats, nothing reduces
   over the batch axis) — so per-chip throughput multiplies and
   "4 chips ≈ 4 x 1,474 ≈ 5,900 slices/s ≥ 5,000" is arithmetic on a
   measured number, not a model of collective overheads;
2. the sharded forward is numerically identical to single-device.

Uses the gm_test encoder (same module types/structure as the gm_tiny
flagship, smaller dims) so the compile stays test-sized; the sharding
pattern is dimension-independent. tools/bench_dp.py is the runnable
demonstration on real chips.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ceigm_unet_tpu.models import build_model
from ceigm_unet_tpu.parallel import make_mesh

# cross-device data-movement HLO ops (any spelling XLA emits)
_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all_reduce|all-gather|all_gather|all-to-all|"
    r"all_to_all|collective-permute|collective_permute|reduce-scatter|"
    r"reduce_scatter|collective-broadcast)\b")


@pytest.fixture(scope="module")
def setup():
    model = build_model(num_classes=4, enc_name="gm_test",
                        scan_backend="assoc")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    return model, variables, x


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_dp_inference_has_zero_collectives(setup):
    model, variables, x = setup
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    xs = jax.device_put(x, shard)
    vs = jax.device_put(variables, repl)
    compiled = jax.jit(model.apply, out_shardings=shard).lower(
        vs, xs).compile()
    txt = compiled.as_text()
    hits = sorted({m.group(1) for ln in txt.splitlines()
                   if "= " in ln and (m := _COLLECTIVE_RE.search(ln))
                   and not ln.strip().startswith("//")})
    assert not hits, (
        f"DP inference compiled with cross-device collectives {hits} — "
        "the linear-scaling claim is broken")


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_dp_inference_matches_single_device(setup):
    model, variables, x = setup
    want = np.asarray(jax.jit(model.apply)(variables, x))
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    xs = jax.device_put(x, shard)
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    got = np.asarray(jax.jit(model.apply, out_shardings=shard)(vs, xs))
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-5 * np.abs(want).max() + 1e-6)
