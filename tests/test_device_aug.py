"""On-device augmentation tests."""
import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.data.device_aug import (N_OPS, _piecewise_map,
                                            device_augment, someof_active)


def test_shapes_and_dtypes():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 512, 512)), jnp.float32)
    labs = jnp.asarray(rng.integers(0, 9, (4, 512, 512)), jnp.int32)
    io, lo = device_augment(jax.random.PRNGKey(0), imgs, labs, out_size=224)
    assert io.shape == (4, 224, 224)
    assert lo.shape == (4, 224, 224)
    assert lo.dtype == jnp.int32


def test_labels_stay_categorical():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((8, 96, 96)), jnp.float32)
    labs = jnp.asarray(rng.integers(0, 4, (8, 96, 96)), jnp.int32)
    _, lo = device_augment(jax.random.PRNGKey(1), imgs, labs, out_size=64)
    vals = np.unique(np.asarray(lo))
    assert set(vals).issubset({0, 1, 2, 3})


def test_deterministic_per_key():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((2, 64, 64)), jnp.float32)
    labs = jnp.asarray(rng.integers(0, 4, (2, 64, 64)), jnp.int32)
    a1 = device_augment(jax.random.PRNGKey(7), imgs, labs, out_size=64)
    a2 = device_augment(jax.random.PRNGKey(7), imgs, labs, out_size=64)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    b = device_augment(jax.random.PRNGKey(8), imgs, labs, out_size=64)
    assert np.abs(np.asarray(a1[0]) - np.asarray(b[0])).max() > 0


def test_identity_when_no_ops_fire():
    """With an all-identity affine the resize path must reduce to plain
    bilinear resize; check pure-resize consistency at same size."""
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((16, 64, 64)), jnp.float32)
    labs = jnp.asarray(rng.integers(0, 4, (16, 64, 64)), jnp.int32)
    io, lo = device_augment(jax.random.PRNGKey(0), imgs, labs, out_size=64)
    # some samples draw no geometric op (P >= 0.275 under SomeOf((0,4)) over
    # the 10-op universe); for those the label passes through exactly
    # (photometric ops leave labels alone)
    same = [i for i in range(16)
            if np.array_equal(np.asarray(lo[i]), np.asarray(labs[i]))]
    assert len(same) >= 1


def test_someof_count_distribution():
    """Exact SomeOf((0,4)) semantics: op count ~ Uniform{0..4} and each
    op is marginally active with P = E[n]/10 = 0.2."""
    trials = 4000
    masks = jax.vmap(someof_active)(
        jax.random.split(jax.random.PRNGKey(0), trials))
    counts = np.asarray(jnp.sum(masks, axis=1))
    hist = np.bincount(counts, minlength=6)
    assert hist[5:].sum() == 0
    # each count in {0..4} occurs w.p. 0.2 -> ~800 +- 5 sigma (~63)
    np.testing.assert_allclose(hist[:5], trials / 5, atol=5 * np.sqrt(
        trials * 0.2 * 0.8))
    # per-op marginal activation: 0.2 each
    marg = np.asarray(jnp.mean(masks.astype(jnp.float32), axis=0))
    np.testing.assert_allclose(marg, 0.2, atol=0.04)
    # subsets are uniform: P(op i & op j) = sum_n (1/5) C(8,n-2)/C(10,n)
    pair = np.asarray(jnp.mean(
        (masks[:, 0] & masks[:, 1]).astype(jnp.float32)))
    expect = sum((1 / 5) * (n * (n - 1)) / (10 * 9) for n in range(5))
    np.testing.assert_allclose(pair, expect, atol=0.02)


def test_piecewise_map_matches_cpu_warp():
    """Device piecewise map (displacement form over the static Delaunay
    grid) == the CPU tier's per-triangle affine warp for the same control
    points."""
    from ceigm_unet_tpu.data.augment import piecewise_affine_warp
    h = w = 48
    rng = np.random.default_rng(5)
    img = rng.random((h, w)).astype(np.float32)
    lab = rng.integers(0, 4, (h, w)).astype(np.float32)

    # identical control points to augment.py:_op_piecewise
    yyg = np.linspace(0, h, 4)
    xxg = np.linspace(0, w, 4)
    xg, yg = np.meshgrid(xxg, yyg)
    src = np.stack([yg.ravel(), xg.ravel()], axis=1)
    jitter = rng.normal(0, 0.02, (16, 2)) * np.array([h, w])
    wi, _ = piecewise_affine_warp(img, lab, src, src + jitter)

    # device: same-size query grid (zoom grid at out=h is the pixel grid)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # drive the displacement path with the known jitter by linearity:
    # _piecewise_map draws jitter internally, so recompute coords directly
    from ceigm_unet_tpu.data.device_aug import _pw_statics
    simplices, Minv, sid = _pw_statics(h, w, (h, w))
    D = Minv @ jnp.asarray(jitter, jnp.float32)[simplices]
    Dp = D[sid]
    pixh = jnp.stack([gy, gx, jnp.ones_like(gy)], axis=-1)
    disp = jnp.einsum("hwc,hwcd->hwd", pixh, Dp)
    cy = np.asarray(gy + disp[..., 0], np.float64)
    cx = np.asarray(gx + disp[..., 1], np.float64)
    from scipy import ndimage
    wi_dev = ndimage.map_coordinates(img, [cy, cx], order=1,
                                     mode="constant")
    np.testing.assert_allclose(wi_dev, wi, atol=2e-3)


def test_piecewise_inactive_is_exact_identity():
    gy, gx = jnp.meshgrid(jnp.arange(32, dtype=jnp.float32) * 1.5,
                          jnp.arange(32, dtype=jnp.float32) * 1.5,
                          indexing="ij")
    qy, qx = _piecewise_map(jax.random.PRNGKey(0), jnp.asarray(False),
                            gy, gx, 48, 48)
    np.testing.assert_array_equal(np.asarray(qy), np.asarray(gy))
    np.testing.assert_array_equal(np.asarray(qx), np.asarray(gx))


# ----------------------- device-aug INSIDE the sharded train step
# (tracked config 5: the TPU-first replacement for the reference's CPU
# imgaug workers, dataset_synapse.py:61-72 -> train_synapse.py:51-64)

def _tiny_state_and_batch(n_items=8):
    import optax
    from ceigm_unet_tpu.models import build_model
    from ceigm_unet_tpu.train.trainstep import create_train_state
    model = build_model(num_classes=4, enc_name="gm_test",
                        scan_backend="assoc")
    tx = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 1), jnp.float32), tx)
    rng = np.random.default_rng(9)
    batch = {"image": jnp.asarray(rng.uniform(0, 1, (n_items, 64, 64, 1)),
                                  jnp.float32),
             "label": jnp.asarray(rng.integers(0, 4, (n_items, 64, 64)),
                                  jnp.int32)}
    return model, state, batch


def test_train_step_device_aug_matches_external_aug():
    """The step with ``device_aug_size`` set == manually augmenting with
    the same derived key, normalizing, and running the plain step: the
    fused-in-step tier changes WHERE the aug runs, not its semantics."""
    from ceigm_unet_tpu.train.trainstep import make_train_step
    model, state, batch = _tiny_state_and_batch()
    key = jax.random.PRNGKey(3)

    fused = jax.jit(make_train_step(model, 0.4, 0.6, device_aug_size=32))
    s_fused, m_fused = fused(state, batch, key, jnp.asarray(False))

    aug_key, model_key = jax.random.split(key)
    img, lab = device_augment(aug_key, batch["image"][..., 0],
                              batch["label"], out_size=32)
    ext_batch = {"image": (((img - 0.5) / 0.5)[..., None]),
                 "label": lab}
    plain = jax.jit(make_train_step(model, 0.4, 0.6))
    s_plain, m_plain = plain(state, ext_batch, model_key,
                             jnp.asarray(False))

    np.testing.assert_allclose(float(m_fused["loss"]),
                               float(m_plain["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_fused.params),
                    jax.tree.leaves(s_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_train_step_device_aug_dp_equivalence():
    """Aug-on DP step over the 8-device mesh == single device, full
    param tree (per-sample aug keys are a pure function of (rng, B), so
    the mesh size cannot change the augmentation draw)."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ceigm_unet_tpu.parallel import make_mesh, shard_batch
    from ceigm_unet_tpu.train.trainstep import make_train_step
    model, state, batch = _tiny_state_and_batch()

    def run(n):
        mesh = make_mesh(n)
        repl = NamedSharding(mesh, P())
        st = jax.device_put(state, repl)
        b = shard_batch(mesh, batch)
        step = jax.jit(make_train_step(model, 0.4, 0.6,
                                       device_aug_size=32),
                       out_shardings=(repl, repl))
        st2, mt = step(st, b, jax.random.PRNGKey(3), jnp.asarray(False))
        return st2, float(mt["loss"])

    s1, l1 = run(1)
    s8, l8 = run(8)
    assert abs(l1 - l8) <= 1e-5 * max(1.0, abs(l1))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-5,
                                   atol=1e-8 + 1e-5 * np.abs(a).max())
