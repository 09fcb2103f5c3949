"""Jitted training step with data-parallel sharding.

Replaces the reference's Lightning training_step + implicit DDP capability
(gm-unet/train_synapse.py:140-151, SURVEY.md §2.14). One compiled function
covers: forward (mutable BatchNorm stats), DiceCE loss, backward, AdamW +
cosine LR, and the 10-epoch encoder freeze — the freeze flag is traced, so
no recompilation happens at the freeze/unfreeze epoch boundary.

Freeze semantics vs torch: the reference sets requires_grad=False, so frozen
params get no grads, no moments, and no weight decay. Here encoder grads
AND final updates are zeroed while frozen — moments stay exactly 0 (they
start at 0 and decay of 0 is 0) and no decay is applied, matching torch up
to Adam's global step counter used for bias correction (documented in
docs/PARITY.md).

Data parallelism: jit the returned step with batch sharded over the mesh's
"data" axis and state replicated; XLA inserts the psum grad all-reduce.
BatchNorm batch means become global (sync-BN) automatically.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ceigm_unet_tpu.losses import dice_ce_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def cosine_lr(base_lr: float, eta_min: float, t_max: int,
              steps_per_epoch: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """torch CosineAnnealingLR stepped per-epoch (reference
    train_synapse.py:111-114)."""
    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / t_max))
    return schedule


def make_optimizer(lr_schedule, weight_decay: float
                   ) -> optax.GradientTransformation:
    """AdamW matching torch defaults (betas 0.9/0.999, eps 1e-8). The
    reference passes all params in one group (train_synapse.py:102-108), so
    weight decay applies uniformly; the _no_weight_decay markers in
    mamba_init are unused there, and likewise here."""
    return optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=weight_decay)


def make_adam(lr_schedule, weight_decay: float = 0.0,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch Adam: L2 weight decay folded into the gradient BEFORE the
    moment updates (unlike AdamW's decoupled decay)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(lr_schedule))


def make_sgd(lr_schedule, weight_decay: float = 0.0,
             momentum: float = 0.0, nesterov: bool = False):
    """torch SGD: grad += wd * p, then (optional) momentum buffer."""
    parts = [optax.add_decayed_weights(weight_decay)]
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def make_rmsprop(lr_schedule, weight_decay: float = 0.0,
                 alpha: float = 0.99, eps: float = 1e-8):
    """torch RMSprop: grad += wd * p; divide by sqrt(sq_avg) + eps (eps
    OUTSIDE the sqrt, torch semantics)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False),
        optax.scale_by_learning_rate(lr_schedule))


# Reference knob set (gm-unet/train_synapse.py:24-29); live entry: AdamW.
OPTIMIZERS = {
    "Adam": make_adam,
    "SGD": make_sgd,
    "RMSprop": make_rmsprop,
    "AdamW": make_optimizer,
}


def create_train_state(model, rng, sample_input, tx) -> TrainState:
    # init and optimizer-state construction are jitted: eager per-op
    # dispatch is pathologically slow on remote/tunneled TPU runtimes.
    variables = jax.jit(functools.partial(model.init, train=False))(
        rng, sample_input)
    opt_state = jax.jit(tx.init)(variables["params"])
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=opt_state, tx=tx)


def _encoder_mask(params) -> Any:
    """Params-shaped pytree: True on leaves under the top-level 'encoder'."""
    if "encoder" not in params:
        raise ValueError(
            "freeze-encoder mask expects a top-level 'encoder' param group; "
            f"got {sorted(params)} — update _encoder_mask if the model "
            "assembly renamed its submodules")
    return {k: jax.tree.map(lambda _: k == "encoder", v)
            for k, v in params.items()}


def make_train_step(model, ce_weight: float = 0.4, dc_weight: float = 0.6,
                    loss_fn: Optional[Callable] = None,
                    device_aug_size: Optional[int] = None):
    """Returns ``train_step(state, batch, rng, freeze_encoder) ->
    (state, metrics)``; batch = {"image": (B,H,W,1|3), "label": (B,H,W)}.

    With ``device_aug_size`` set, the batch instead carries RAW
    (un-augmented, un-normalized, source-resolution) slices — image
    (B, H, W, 1) float32, label (B, H, W) int — and the step applies the
    fused on-device augmentation tier (data/device_aug.py: exact
    SomeOf((0,4)) policy + zoom-to-patch as one gather) followed by the
    Normalize(0.5, 0.5) INSIDE the compiled step, before the forward.
    Augmentation keys derive from the step rng by a split, per-sample
    via ``jax.random.split(key, B)`` — a pure function of (rng, B), so
    results are bit-identical for any device-mesh size (the DP
    bit-reproducibility contract; asserted by tests/test_device_aug.py
    and parallel/dryrun.py)."""
    if loss_fn is None:
        loss_fn = functools.partial(dice_ce_loss, ce_weight=ce_weight,
                                    dc_weight=dc_weight)

    def compute_loss(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        image, label = batch["image"], batch["label"]
        if device_aug_size is not None:
            # split only on this path: the plain path's dropout stream
            # stays byte-identical to prior rounds' runs
            aug_rng, rng = jax.random.split(rng)
            from ceigm_unet_tpu.data.device_aug import device_augment
            img, label = device_augment(aug_rng, image[..., 0],
                                        label, out_size=device_aug_size)
            image = ((img - 0.5) / 0.5)[..., None]
        logits, mutated = model.apply(
            variables, image, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        loss = loss_fn(logits, label)
        return loss, mutated["batch_stats"]

    def train_step(state: TrainState, batch, rng, freeze_encoder):
        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(
                state.params, state.batch_stats, batch, rng)

        mask = _encoder_mask(state.params)
        grads = jax.tree.map(
            lambda g, m: jnp.where(jnp.logical_and(freeze_encoder, m),
                                   jnp.zeros_like(g), g), grads, mask)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        updates = jax.tree.map(
            lambda u, m: jnp.where(jnp.logical_and(freeze_encoder, m),
                                   jnp.zeros_like(u), u), updates, mask)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"loss": loss}

    return train_step
