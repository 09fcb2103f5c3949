"""Gradient + optimizer-step differential vs the torch reference (CPU).

Extends the forward-only parity (test_torch_parity.py) to the full
training trajectory proxy the reference's kernel tests model
(gm-unet/kernels/selective_scan/test_selective_scan.py:484-502 checks all
7 gradients against a reference implementation):

1. fp32 forward + backward of the DiceCE loss on a fixed batch; compare
   the INPUT gradient and EVERY parameter gradient. Because every
   weight conversion in ``ceigm_unet_tpu.convert`` is linear (transpose /
   stack / concat), torch gradients convert through the exact same maps —
   so the comparison is leaf-for-leaf over the whole tree, covering every
   module class, not a sample.
2. one AdamW step (reference hyperparameters) on both sides; re-convert
   the updated torch state_dict and compare parameters.

With no dataset in this environment this differential is the standing
proxy for the Dice-parity target (BASELINE.md quality parity).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

IMG = 32  # smallest size the 4-stage encoder + decoder accept cleanly


@pytest.fixture(scope="module")
def setup():
    ref = load_reference()
    import torch
    torch.manual_seed(0)
    net = ref.build_model(in_channels=3, num_classes=9)
    net.eval()  # BN running stats on both sides; drop-path off

    from ceigm_unet_tpu.convert import convert_msvm_unet_state_dict
    variables = convert_msvm_unet_state_dict(dict(net.state_dict()))

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, IMG, IMG)).astype(np.float32)
    labels = rng.integers(0, 9, (2, IMG, IMG)).astype(np.int64)
    return net, variables, x, labels


def _torch_dice_ce(logits, labels, ce_weight=0.4, dc_weight=0.6):
    """Reference DiceCELoss (gm-unet/loss.py:20-97), inlined to avoid the
    monai import chain: CE + global-sum multiclass dice over ALL classes."""
    import torch
    ce = torch.nn.functional.cross_entropy(logits, labels)
    probs = torch.softmax(logits, dim=1)
    smooth = 1e-5
    dc = 0.0
    for i in range(logits.shape[1]):
        p = probs[:, i]
        t = (labels == i).float()
        inter = torch.sum(p * t)
        dice = 1 - (2 * inter + smooth) / (
            torch.sum(p * p) + torch.sum(t * t) + smooth)
        dc = dc + dice
    return ce * ce_weight + (dc / logits.shape[1]) * dc_weight


def _jax_loss(m, variables, x_nhwc, labels):
    from ceigm_unet_tpu.losses import dice_ce_loss
    logits = m.apply(variables, x_nhwc, train=False)
    return dice_ce_loss(logits, labels, ce_weight=0.4, dc_weight=0.6)


def _grad_state_dict(net):
    """state_dict-shaped tree of gradients: param grads where they exist,
    zeros for buffers / unused params (so unused-parameter quirks must be
    matched by zero JAX gradients)."""
    import torch
    params = dict(net.named_parameters())
    out = {}
    for k, v in net.state_dict().items():
        if k in params and params[k].grad is not None:
            out[k] = params[k].grad.detach().clone()
        else:
            out[k] = torch.zeros_like(v) if v.is_floating_point() \
                else v.clone()
    return out


def _compare_trees(got, want, rtol, floor_frac, what, atol_abs=0.0):
    flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_w = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(want)[0]}
    assert flat_g and len(flat_g) == len(flat_w)
    bad = []
    for k, g in flat_g:
        key = jax.tree_util.keystr(k)
        w = np.asarray(flat_w[key], np.float32)
        g = np.asarray(g, np.float32)
        # per-leaf absolute floor scaled to the leaf's gradient magnitude:
        # tiny components inside a large-scale leaf are numerically noise
        atol = atol_abs + 1e-8 + floor_frac * max(np.abs(w).max(),
                                                  np.abs(g).max())
        if not np.allclose(g, w, rtol=rtol, atol=atol):
            err = np.abs(g - w).max()
            bad.append((key, float(err), float(np.abs(w).max())))
    assert not bad, f"{what}: {len(bad)} mismatching leaves: {bad[:8]}"


def test_grad_and_adamw_step_parity(setup):
    import torch
    net, variables, x, labels = setup

    # ---- torch forward/backward
    xt = torch.from_numpy(x).requires_grad_(True)
    loss_t = _torch_dice_ce(net(xt), torch.from_numpy(labels))
    net.zero_grad(set_to_none=True)
    loss_t.backward()
    dx_t = xt.grad.detach().numpy()

    # ---- jax forward/backward
    from ceigm_unet_tpu.models import build_model
    m = build_model(num_classes=9, scan_backend="assoc")
    x_nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    lab_j = jnp.asarray(labels.astype(np.int32))

    def loss_fn(params, xin):
        return _jax_loss(m, {"params": params,
                             "batch_stats": variables["batch_stats"]},
                         xin, lab_j)

    loss_j, (gp, gx) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        variables["params"], x_nhwc)

    np.testing.assert_allclose(float(loss_j), float(loss_t),
                               rtol=2e-4, atol=2e-5)

    # input gradient
    dx_j = np.transpose(np.asarray(gx), (0, 3, 1, 2))
    np.testing.assert_allclose(
        dx_j, dx_t, rtol=2e-3,
        atol=1e-8 + 2e-3 * np.abs(dx_t).max(),
        err_msg="input gradient mismatch")

    # every parameter gradient, through the (linear) weight converters
    from ceigm_unet_tpu.convert import convert_msvm_unet_state_dict
    grads_t = convert_msvm_unet_state_dict(_grad_state_dict(net))["params"]
    _compare_trees(gp, grads_t, rtol=2e-3, floor_frac=2e-3,
                   what="parameter gradients")

    # ---- one AdamW step (reference hyperparameters, all-param decay)
    opt = torch.optim.AdamW(net.parameters(), lr=5e-4, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=1e-4)
    opt.step()
    want_params = convert_msvm_unet_state_dict(
        dict(net.state_dict()))["params"]

    import optax
    from ceigm_unet_tpu.train.trainstep import make_optimizer
    tx = make_optimizer(lambda step: 5e-4, weight_decay=1e-4)
    opt_state = tx.init(variables["params"])
    updates, _ = tx.update(gp, opt_state, variables["params"])
    new_params = optax.apply_updates(variables["params"], updates)

    # updates are O(lr) and the FIRST Adam step is ~lr*g/(|g|+eps), which
    # amplifies fp32 grad noise on near-zero-gradient elements up to a
    # full step; the absolute floor is 1% of a step (measured residual:
    # one conv leaf at 0.4% of a step, everything else < 3e-7)
    _compare_trees(new_params, want_params, rtol=1e-5, floor_frac=2e-6,
                   atol_abs=1e-2 * 5e-4, what="post-AdamW parameters")


@pytest.mark.parametrize("optname", ["sgd", "adamw"])
def test_training_trajectory_parity(setup, optname):
    """N identical optimizer steps on fixed synthetic batches: per-step
    loss and final logits vs torch (the strongest dataset-free proxy for
    the Dice-parity target — compounding error is what threatens Dice
    parity, not any single step; reference telemetry contract:
    gm-unet/train_synapse.py loss logging per iteration).

    Both sides run eval-mode normalization (frozen BN stats, drop-path
    off) so the differential isolates the grad + optimizer trajectory;
    BN-stat updates are covered by test_dp_equivalence. Tolerances grow
    linearly with the step index (PARITY.md §trajectory-tolerance).
    """
    import torch
    net, variables, x, labels = setup
    from ceigm_unet_tpu.models import build_model
    from ceigm_unet_tpu.convert import convert_msvm_unet_state_dict
    import optax
    from ref_loader import load_reference

    N = 20
    LR = 1e-4
    rng = np.random.default_rng(13)
    xs = rng.standard_normal((2, 2, 1, IMG, IMG)).astype(np.float32)
    ys = rng.integers(0, 9, (2, 2, IMG, IMG)).astype(np.int64)

    # ---- torch trajectory. The fixture net is shared and an earlier
    # test both steps its weights (opt.step mutates in place) and leaves
    # non-leaf cached tensors in it (deepcopy refuses): rebuild a fresh
    # net from a detached state_dict snapshot, and re-convert THAT
    # snapshot for the JAX side so both trajectories start from
    # identical weights regardless of test order.
    sd = {k: v.detach().clone() for k, v in net.state_dict().items()}
    net_t = load_reference().build_model(in_channels=3, num_classes=9)
    net_t.load_state_dict(sd)
    net_t.eval()
    variables = convert_msvm_unet_state_dict(sd)
    if optname == "sgd":
        opt = torch.optim.SGD(net_t.parameters(), lr=LR)
    else:
        opt = torch.optim.AdamW(net_t.parameters(), lr=LR,
                                betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=1e-4)
    losses_t = []
    for i in range(N):
        xb = torch.from_numpy(xs[i % 2])
        yb = torch.from_numpy(ys[i % 2])
        loss = _torch_dice_ce(net_t(xb), yb)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        losses_t.append(float(loss.detach()))
    with torch.no_grad():
        final_t = net_t(torch.from_numpy(xs[0])).numpy()

    # ---- jax trajectory (same init via the converter)
    m = build_model(num_classes=9, scan_backend="assoc")
    bstats = variables["batch_stats"]
    xs_j = jnp.transpose(jnp.asarray(xs), (0, 1, 3, 4, 2))
    ys_j = jnp.asarray(ys.astype(np.int32))

    if optname == "sgd":
        tx = optax.sgd(LR)
    else:
        from ceigm_unet_tpu.train.trainstep import make_optimizer
        tx = make_optimizer(lambda step: LR, weight_decay=1e-4)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            return _jax_loss(m, {"params": p, "batch_stats": bstats},
                             xb, yb)
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    opt_state = tx.init(params)
    losses_j = []
    for i in range(N):
        params, opt_state, loss = step(params, opt_state,
                                       xs_j[i % 2], ys_j[i % 2])
        losses_j.append(float(loss))
    final_j = np.transpose(np.asarray(m.apply(
        {"params": params, "batch_stats": bstats}, xs_j[0], train=False)),
        (0, 3, 1, 2))

    # per-step losses: fp32 error compounds roughly linearly here
    # (measured: see PARITY.md §trajectory-tolerance)
    for i, (lj, lt) in enumerate(zip(losses_j, losses_t)):
        tol = 2e-4 * (1 + i)
        assert abs(lj - lt) <= tol * max(1.0, abs(lt)), (
            f"step {i}: jax {lj} vs torch {lt} (tol {tol})")

    np.testing.assert_allclose(
        final_j, final_t, rtol=5e-3,
        atol=1e-6 + 5e-3 * np.abs(final_t).max(),
        err_msg=f"final logits after {N} {optname} steps")
