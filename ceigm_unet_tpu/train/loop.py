"""Host-side training loop.

Replaces the reference's LightningModule + Trainer machinery
(gm-unet/train_synapse.py:31-223) with an explicit loop:

- epoch scheduling incl. the hard stop (epoch 250 of 300,
  train_synapse.py:133-135) and the 10-epoch encoder freeze;
- validation cadence: every ``val_every_early`` epochs until
  ``val_switch_epoch``, then every ``val_every_late`` (train_synapse.py:
  137-138 / train_acdc.py:155-160);
- per-volume Dice validation via the batched device path (eval.py parity);
- ModelCheckpoint on max val_mean_dice + save_last (train_synapse.py:
  196-202) via orbax;
- EarlyStopping on mean_train_loss with patience 1500 (effectively
  disabled, preserved for parity, train_synapse.py:204-209);
- loguru-style file+stderr logging, plus machine-readable per-epoch
  metric history (JSONL) — the counterpart of the CSV/TB scalar history
  Lightning's default logger gives the reference for free
  (train_synapse.py:211-221).
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.data.loader import DataLoader
from ceigm_unet_tpu.eval.volume import eval_single_volume
from ceigm_unet_tpu.models import build_model
from ceigm_unet_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from ceigm_unet_tpu.train.config import TrainConfig
from ceigm_unet_tpu.train.trainstep import (
    create_train_state, make_train_step, make_optimizer, cosine_lr,
    TrainState)


def setup_logger(log_dir: str, name: str) -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"ceigm.{name}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s")
    fh = logging.FileHandler(os.path.join(log_dir, f"{name}.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class MetricHistory:
    """Append-only JSONL scalar history: one object per epoch with
    whatever scalars the loop reports (loss, lr, val dice, throughput).
    Readable with one ``pd.read_json(path, lines=True)``."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def append(self, **scalars):
        with open(self.path, "a") as f:
            f.write(json.dumps(scalars) + "\n")
            f.flush()


def save_checkpoint(ckpt_dir: str, name: str, state: TrainState,
                    extra: Optional[dict] = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": jax.device_get(state.params),
               "batch_stats": jax.device_get(state.batch_stats),
               "step": int(state.step)}
    if extra:
        payload.update(extra)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def should_validate(epoch: int, cfg: TrainConfig) -> bool:
    if epoch < cfg.val_switch_epoch:
        return (epoch + 1) % cfg.val_every_early == 0
    return (epoch + 1) % cfg.val_every_late == 0


def run_training(cfg: TrainConfig, train_ds, val_volumes=None,
                 max_steps: Optional[int] = None,
                 logger: Optional[logging.Logger] = None,
                 resume_from: Optional[str] = None):
    """train_ds: indexable dataset of slice samples. val_volumes: iterable
    of {"image": (D, H, W), "label": (D, H, W), "case_name": str}.
    ``resume_from``: path to a saved checkpoint dir — restores params /
    batch_stats and continues from the saved epoch (the capability
    Lightning's ``fit(ckpt_path=...)`` provides but the reference leaves
    unused, train_synapse.py:223)."""
    # persistent compile cache (same policy as bench.py): a repeated run
    # of an unchanged model skips the multi-minute train-step compile
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    logger = logger or setup_logger(cfg.log_dir, cfg.name)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = build_model(num_classes=cfg.num_classes, enc_name=cfg.enc_name,
                        dtype=dtype, scan_backend=cfg.scan_backend)

    # on-device aug (tracked config 5): raw slices travel to the device
    # un-normalized; the compiled step augments + resizes + normalizes.
    # The loader's normalize stays OFF so the step sees raw intensities.
    loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                        num_workers=cfg.num_workers, seed=cfg.seed,
                        normalize=not cfg.device_aug)
    steps_per_epoch = max(1, len(loader))

    lr_sched = cosine_lr(cfg.lr, cfg.eta_min, cfg.max_epochs,
                         steps_per_epoch)
    tx = make_optimizer(lr_sched, weight_decay=cfg.weight_decay)
    history = MetricHistory(
        os.path.join(cfg.log_dir, f"{cfg.name}.metrics.jsonl"))
    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((1, cfg.img_size, cfg.img_size, 1), jnp.float32)
    state = create_train_state(model, rng, sample, tx)

    if cfg.pretrained_encoder:
        state = load_pretrained_encoder(state, cfg.pretrained_encoder,
                                        logger)

    start_epoch = 0
    if resume_from:
        payload = load_checkpoint(resume_from)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, payload["params"]),
            batch_stats=jax.tree.map(jnp.asarray, payload["batch_stats"]),
            step=jnp.asarray(payload.get("step", 0), jnp.int32))
        start_epoch = int(payload.get("epoch", -1)) + 1
        logger.info(f"resumed from {resume_from} at epoch {start_epoch}")

    # data-parallel mesh: largest device count that divides the batch
    n_dev = len(jax.devices())
    while cfg.batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(n_dev)
    repl = replicated_sharding(mesh)
    state = jax.device_put(state, repl)
    step_fn = jax.jit(
        make_train_step(model, cfg.ce_weight, cfg.dc_weight,
                        device_aug_size=(cfg.img_size if cfg.device_aug
                                         else None)),
        out_shardings=(repl, repl))
    infer_fn = lambda variables, x: model.apply(variables, x)

    best_dice = -1.0
    best_loss = float("inf")
    patience_count = 0
    global_step = 0
    stop = False

    for epoch in range(start_epoch, cfg.max_epochs):
        if epoch >= cfg.stop_epoch:     # reference hard stop
            logger.info(f"hard stop at epoch {epoch}")
            break
        loader.set_epoch(epoch)
        freeze = jnp.asarray(epoch < cfg.freeze_encoder_epochs)
        losses = []
        t0 = time.time()
        for batch in loader:
            b = {"image": batch["image"], "label": batch["label"]}
            b = shard_batch(mesh, b)
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, b, step_rng, freeze)
            losses.append(metrics["loss"])
            global_step += 1
            if max_steps is not None and global_step >= max_steps:
                stop = True
                break
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        epoch_time = time.time() - t0
        logger.info(f"epoch {epoch} mean_train_loss {mean_loss:.4f} "
                    f"({epoch_time:.1f}s, {len(losses)} steps)")
        row = {"epoch": epoch, "step": global_step,
               "mean_train_loss": mean_loss,
               "lr": float(lr_sched(global_step)),
               "epoch_time_s": round(epoch_time, 3),
               "slices_per_s": round(
                   len(losses) * cfg.batch_size / max(epoch_time, 1e-9), 2)}

        # EarlyStopping parity (patience 1500 on mean_train_loss)
        if mean_loss < best_loss:
            best_loss = mean_loss
            patience_count = 0
        else:
            patience_count += 1
            if patience_count >= 1500:
                logger.info("early stop (train loss plateau)")
                stop = True

        if val_volumes is not None and should_validate(epoch, cfg):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            dices = []
            for vol in val_volumes:
                metric = eval_single_volume(
                    infer_fn, variables, vol["image"], vol["label"],
                    cfg.num_classes, (cfg.img_size, cfg.img_size))
                per_class = [float(np.mean(v))
                             for v in metric["dice"].values()]
                dices.append(float(np.mean(per_class)))
            val_dice = float(np.mean(dices)) if dices else 0.0
            logger.info(f"epoch {epoch} val_mean_dice {val_dice:.4f}")
            row["val_mean_dice"] = val_dice
            if val_dice > best_dice:
                best_dice = val_dice
                save_checkpoint(
                    cfg.ckpt_dir, f"{cfg.name}-best", state,
                    {"epoch": epoch, "val_mean_dice": val_dice})
        history.append(**row)
        save_checkpoint(cfg.ckpt_dir, f"{cfg.name}-last", state,
                        {"epoch": epoch})
        if stop:
            break
    return state


def load_pretrained_encoder(state: TrainState, ckpt_path: str,
                            logger) -> TrainState:
    """Initialize the encoder from a torch GroupMamba classification
    checkpoint (reference model/gm/__init__.py:60-86 capability)."""
    import torch
    from ceigm_unet_tpu.convert import (
        remap_pretrained_groupmamba_keys, convert_groupmamba_state_dict)
    logger.info(f"loading pretrained encoder: {ckpt_path}")
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = remap_pretrained_groupmamba_keys(sd)
    enc_p, enc_s = convert_groupmamba_state_dict(sd)
    params = dict(state.params)
    params["encoder"] = jax.tree.map(jnp.asarray, enc_p)
    stats = dict(state.batch_stats)
    stats["encoder"] = jax.tree.map(jnp.asarray, enc_s)
    return state.replace(params=params, batch_stats=stats)
