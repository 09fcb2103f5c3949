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


def _max_all_gather_elems(model, variables, x, mesh, scan_island):
    """Largest all-gather output (element count) in the compiled HLO of
    the H-sharded forward."""
    import re
    import functools
    from jax.sharding import NamedSharding
    from ceigm_unet_tpu.parallel.sp_context import sp_scan_island
    from contextlib import nullcontext

    xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    f = jax.jit(model.apply,
                out_shardings=NamedSharding(mesh, P(None, "sp")))
    ctx = sp_scan_island(mesh, "sp") if scan_island else nullcontext()
    with ctx:
        txt = f.lower(vs, xs).compile().as_text()
    worst = 0
    for ln in txt.splitlines():
        s = ln.strip()
        # all-gather INSTRUCTION DEFINITIONS inside the scan modules only
        # (weight-construction gathers of the inception composite and the
        # ring scan's tiny per-shard summary gathers are not L gathers)
        m = re.match(r"%?[\w.\-]+ = \w+\[([\d,]*)\][^ ]* "
                     r"(?:all-gather|all_gather)\(", s)
        if m and "/mamba/" in s:
            n = 1
            for d in m.group(1).split(","):
                if d:
                    n *= int(d)
            worst = max(worst, n)
    return worst


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_sp_scan_island_kills_L_gather(setup):
    """The r3 GSPMD path all-gathered the full L axis at every scan op;
    with the shard_map scan island the compiled module's largest
    all-gather shrinks to the small deep-stage tail (stages whose H no
    longer divides the mesh) — nothing at the island stages' L size."""
    model, variables, x = setup
    mesh = _mesh()
    with_island = _max_all_gather_elems(model, variables, x, mesh, True)
    without = _max_all_gather_elems(model, variables, x, mesh, False)
    # plain GSPMD gathers the full stage-1/2 images at the scan ops:
    # (2, 16, 16, 16) = 8192 and (2, 8, 8, 32) = 4096 elems. With the
    # island those are gone — the mamba-side gathers that remain are the
    # ring scan's per-shard summaries ((8, 2, 4, 1) = 64 elems) and the
    # non-divisible deep-tail stages' (H = 4 < mesh) GSPMD gathers
    # ((2, 4, 4, 48) = 1536), which the island deliberately skips.
    assert without >= 8192, f"baseline lost its L gather? ({without})"
    assert with_island < 4096, (
        f"scan island did not remove the island-stage L all-gather: "
        f"{with_island} vs {without}")


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_sp_scan_island_production_stage_ratios(setup):
    """r4 verdict #7: at 64² over 8 devices the two deepest stages
    (H = 8, 4) don't all divide the mesh, so the island deliberately
    skips them and small GSPMD gathers remain — leaving the claim
    untested at the 512²-production ratio where EVERY stage divides.
    128² over a 4-device mesh reproduces that ratio exactly (stages
    H = 32, 16, 8, 4 — all divisible), including the H == mesh-size
    boundary at the deepest stage. Assert NO mamba-side L all-gather at
    ANY stage: the only gathers left are the ring scan's per-shard
    summary exchanges (tens of elements)."""
    import re
    import functools
    from jax.sharding import NamedSharding
    from ceigm_unet_tpu.parallel.sp_context import sp_scan_island

    model, variables, _ = setup
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 1)), jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    f = jax.jit(model.apply,
                out_shardings=NamedSharding(mesh, P(None, "sp")))
    with sp_scan_island(mesh, "sp"):
        txt = f.lower(vs, xs).compile().as_text()

    # (probed r5: at THIS geometry the plain-GSPMD baseline happens to
    # partition the associative scan without a full-L gather, so a
    # with/without differential is not the signal here; the island's
    # win over plain GSPMD is pinned by the 64² test above. What this
    # production-ratio compile must prove:)
    worst = 0
    stages_in_island = set()
    for ln in txt.splitlines():
        s = ln.strip()
        m = re.match(r"%?[\w.\-]+ = \w+\[([\d,]*)\][^ ]* "
                     r"(?:all-gather|all_gather)\(", s)
        if m and "/mamba/" in s:
            n = functools.reduce(
                lambda a, d: a * int(d),
                [d for d in m.group(1).split(",") if d], 1)
            worst = max(worst, n)
        sm = re.search(r"encoder/block(\d)_\d+/attn/mamba/shard_map", s)
        if sm:
            stages_in_island.add(int(sm.group(1)))
    # 1. EVERY encoder stage (H = 32, 16, 8 and the H == mesh-size
    #    boundary stage H = 4) entered the shard_map island — no
    #    divisibility fallback anywhere
    assert stages_in_island == {1, 2, 3, 4}, stages_in_island
    # 2. nothing mamba-side gathers beyond the ring scan's per-shard
    #    summaries ((4, 1, W, 1)-class, tens of elements) — an island
    #    fallback at the deepest stage would show as a
    #    (1, 4, 4, 64) = 1024-elem GSPMD gather
    assert 0 < worst <= 256, (
        f"an island stage still all-gathers L: {worst}")
