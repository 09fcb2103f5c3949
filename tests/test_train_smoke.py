"""End-to-end training smoke tests on synthetic data (CPU, tiny shapes):
loss decreases, encoder freeze works, checkpoint round-trips, and the
full CLI loop runs (ACDC-format synthetic npz files).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.models import build_model
from ceigm_unet_tpu.train.trainstep import (
    create_train_state, make_train_step, make_optimizer, cosine_lr)


@pytest.fixture(scope="module")
def tiny_setup():
    model = build_model(num_classes=4, enc_name="gm_test", scan_backend="assoc")
    tx = make_optimizer(cosine_lr(1e-3, 1e-6, 10, 2), weight_decay=1e-4)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x, tx)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 32, 32, 1)),
                             jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, (2, 32, 32)), jnp.int32),
    }
    step = jax.jit(make_train_step(model, 0.4, 0.6))
    return model, state, batch, step


def test_loss_decreases(tiny_setup):
    model, state, batch, step = tiny_setup
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(5):
        rng, k = jax.random.split(rng)
        state, m = step(state, batch, k, jnp.asarray(False))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_encoder_freeze(tiny_setup):
    model, state, batch, step = tiny_setup
    rng = jax.random.PRNGKey(2)
    enc_before = jax.tree.leaves(state.params["encoder"])[0].copy()
    dec_before = jax.tree.leaves(state.params["decoder"])[0].copy()
    state2, _ = step(state, batch, rng, jnp.asarray(True))
    enc_after = jax.tree.leaves(state2.params["encoder"])[0]
    dec_after = jax.tree.leaves(state2.params["decoder"])[0]
    np.testing.assert_array_equal(np.asarray(enc_before),
                                  np.asarray(enc_after))
    assert np.abs(np.asarray(dec_after) - np.asarray(dec_before)).max() > 0


def test_batch_stats_update(tiny_setup):
    model, state, batch, step = tiny_setup
    before = np.asarray(
        state.batch_stats["encoder"]["patch_embed1"]["bn1"]["mean"])
    state2, _ = step(state, batch, jax.random.PRNGKey(3), jnp.asarray(False))
    after = np.asarray(
        state2.batch_stats["encoder"]["patch_embed1"]["bn1"]["mean"])
    assert np.abs(after - before).max() > 0


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    from ceigm_unet_tpu.train.loop import save_checkpoint, load_checkpoint
    model, state, batch, step = tiny_setup
    save_checkpoint(str(tmp_path), "t-best", state, {"epoch": 3})
    payload = load_checkpoint(str(tmp_path / "t-best"))
    assert payload["epoch"] == 3
    p0 = jax.tree.leaves(state.params)[0]
    r0 = jax.tree.leaves(payload["params"])[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(r0))


def test_acdc_training_cli(tmp_path):
    """Full loop through the ACDC CLI on synthetic npz data (bs 2, 1 step,
    tiny images): exercises dataset, loader, augmentation, train loop,
    validation cadence off, checkpointing."""
    data_dir = tmp_path / "ACDC"
    list_dir = tmp_path / "lists"
    os.makedirs(data_dir / "train")
    os.makedirs(data_dir / "test")
    os.makedirs(list_dir)
    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        name = f"case_{i:03d}_sliceED_0.npz"
        np.savez(data_dir / "train" / name,
                 img=rng.random((48, 48)).astype(np.float32),
                 label=rng.integers(0, 4, (48, 48)).astype(np.float32))
        names.append(name)
    (list_dir / "train.txt").write_text("\n".join(names))
    np.savez(data_dir / "test" / "case_t.npz",
             img=rng.random((3, 48, 48)).astype(np.float32),
             label=rng.integers(0, 4, (3, 48, 48)).astype(np.float32))
    (list_dir / "test.txt").write_text("case_t.npz")

    import dataclasses
    from ceigm_unet_tpu.train.config import ACDC_CONFIG
    from ceigm_unet_tpu.train.loop import run_training
    from ceigm_unet_tpu.data.datasets import ACDCDataset

    cfg = dataclasses.replace(
        ACDC_CONFIG, data_dir=str(data_dir), list_dir=str(list_dir),
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
        batch_size=2, img_size=32, max_epochs=1, num_workers=0,
        enc_name="gm_test", scan_backend="assoc")
    train_ds = ACDCDataset(cfg.data_dir, "train", cfg.list_dir,
                           cfg.img_size, seed=1)
    state = run_training(cfg, train_ds, val_volumes=None, max_steps=2)
    assert int(state.step) == 2
    assert os.path.isdir(tmp_path / "ckpt" / "acdc-last")

    # machine-readable metric history (JSONL, one row per epoch)
    import json
    hist_path = tmp_path / "logs" / "acdc.metrics.jsonl"
    rows = [json.loads(l) for l in hist_path.read_text().splitlines()]
    assert len(rows) == 1
    for k in ("epoch", "step", "mean_train_loss", "lr", "slices_per_s"):
        assert k in rows[0], rows[0]
    assert rows[0]["step"] == 2 and rows[0]["lr"] > 0
