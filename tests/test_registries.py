"""Optimizer / LR-scheduler registries vs torch semantics, and the opt-in
debug guards (reference knob set: train_synapse.py:24-29, lr_scheduler.py:4-8,
csms6s.py:231-235)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from ceigm_unet_tpu.train.trainstep import OPTIMIZERS
from ceigm_unet_tpu.train.lr_scheduler import LR_SCHEDULERS


def _run_optax(tx, params0, grads, n):
    state = tx.init(params0)
    p = params0
    import optax
    for _ in range(n):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
    return p


def _run_torch(opt_cls, p0, g, n, **kw):
    p = torch.nn.Parameter(torch.tensor(p0, dtype=torch.float64).float())
    opt = opt_cls([p], **kw)
    for _ in range(n):
        opt.zero_grad()
        p.grad = torch.tensor(g).float()
        opt.step()
    return p.detach().numpy()


@pytest.mark.parametrize("name,tkw,okw", [
    ("AdamW", dict(lr=5e-4, weight_decay=1e-3), dict(weight_decay=1e-3)),
    ("Adam", dict(lr=5e-4, weight_decay=1e-2), dict(weight_decay=1e-2)),
    ("SGD", dict(lr=1e-2, momentum=0.9, weight_decay=1e-3),
     dict(momentum=0.9, weight_decay=1e-3)),
    ("RMSprop", dict(lr=1e-3, weight_decay=1e-3), dict(weight_decay=1e-3)),
])
def test_optimizer_matches_torch(name, tkw, okw):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(16).astype(np.float32)
    g = rng.standard_normal(16).astype(np.float32) * 0.1
    lr = tkw["lr"]

    torch_cls = {"AdamW": torch.optim.AdamW, "Adam": torch.optim.Adam,
                 "SGD": torch.optim.SGD,
                 "RMSprop": torch.optim.RMSprop}[name]
    want = _run_torch(torch_cls, p0, g, 5, **tkw)

    tx = OPTIMIZERS[name](lambda step: jnp.asarray(lr), **okw)
    got = _run_optax(tx, jnp.asarray(p0), jnp.asarray(g), 5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("name,kw,tname,tkw", [
    ("CosineAnnealingLR", dict(t_max=10, eta_min=1e-6),
     "CosineAnnealingLR", dict(T_max=10, eta_min=1e-6)),
    ("PolynomialLR", dict(total_iters=5, power=1.0),
     "PolynomialLR", dict(total_iters=5, power=1.0)),
    ("CosineAnnealingWarmRestarts", dict(t_0=4, t_mult=1),
     "CosineAnnealingWarmRestarts", dict(T_0=4, T_mult=1)),
    ("CosineAnnealingWarmRestarts", dict(t_0=2, t_mult=2),
     "CosineAnnealingWarmRestarts", dict(T_0=2, T_mult=2)),
])
def test_schedule_matches_torch(name, kw, tname, tkw):
    base_lr = 0.1
    spe = 3  # steps per epoch
    sched = LR_SCHEDULERS[name](base_lr, steps_per_epoch=spe, **kw)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    tsched = getattr(torch.optim.lr_scheduler, tname)(opt, **tkw)

    for epoch in range(14):
        want = opt.param_groups[0]["lr"]
        for s in range(spe):
            got = float(sched(jnp.asarray(epoch * spe + s)))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9), \
                (name, epoch, s)
        tsched.step()


def test_nancheck_guard(monkeypatch):
    from ceigm_unet_tpu.utils import debug

    monkeypatch.setenv("CEIGM_DEBUG_NANCHECK", "1")
    x = jnp.asarray([1.0, jnp.nan])
    # the host callback's FloatingPointError surfaces wrapped in the
    # runtime's callback-failure exception
    with pytest.raises(Exception, match="check_nan_inf"):
        jax.block_until_ready(
            jax.jit(lambda v: debug.check_nan_inf("t", v) * 2)(x))
    # clean input passes
    y = jax.jit(lambda v: debug.check_nan_inf("t", v) * 2)(
        jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(y), [2.0, 4.0])

    monkeypatch.delenv("CEIGM_DEBUG_NANCHECK")
    # disabled: nan flows through silently (zero added ops)
    y = jax.jit(lambda v: debug.check_nan_inf("t", v) * 2)(x)
    assert np.isnan(np.asarray(y)[1])


def test_capture(monkeypatch):
    from ceigm_unet_tpu.utils import debug

    monkeypatch.setenv("CEIGM_DEBUG_CAPTURE", "1")
    debug.CAPTURED.clear()
    jax.block_until_ready(
        jax.jit(lambda v: (debug.capture("tag", val=v), v * 2)[1])(
            jnp.ones(4)))
    assert "tag.val" in debug.CAPTURED
    np.testing.assert_allclose(np.asarray(debug.CAPTURED["tag.val"]),
                               np.ones(4))
