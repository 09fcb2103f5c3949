"""Loss parity: jax losses vs an independent numpy port of the reference
formulas (gm-unet/loss.py)."""
import numpy as np
import jax.numpy as jnp

from ceigm_unet_tpu.losses import (
    dice_ce_loss, multiclass_dice_loss, cross_entropy_loss)


def np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_reference_dice(logits_bchw, labels_bhw):
    """Direct transcription of loss.py:20-54 semantics in numpy."""
    probs = np_softmax(logits_bchw, 1)
    C = probs.shape[1]
    smooth = 1e-5
    total = 0.0
    for c in range(C):
        p = probs[:, c]
        t = (labels_bhw == c).astype(np.float64)
        inter = (p * t).sum()
        loss = 1 - (2 * inter + smooth) / ((p * p).sum() + (t * t).sum()
                                           + smooth)
        total += loss
    return total / C


def np_reference_ce(logits_bchw, labels_bhw):
    logp = np.log(np_softmax(logits_bchw.astype(np.float64), 1))
    B, C, H, W = logits_bchw.shape
    ll = np.take_along_axis(logp, labels_bhw[:, None].astype(int), 1)[:, 0]
    return -ll.mean()


def test_dice_matches_reference_formula():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 9, 16, 16)).astype(np.float32)
    labels = rng.integers(0, 9, (2, 16, 16))
    want = np_reference_dice(logits, labels)
    got = multiclass_dice_loss(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_ce_matches_reference_formula():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 8, 8))
    want = np_reference_ce(logits, labels)
    got = cross_entropy_loss(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_dice_ce_weighting():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(
        rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (1, 8, 8)))
    full = dice_ce_loss(logits, labels, ce_weight=0.4, dc_weight=0.6)
    parts = (0.4 * cross_entropy_loss(logits, labels)
             + 0.6 * multiclass_dice_loss(logits, labels))
    np.testing.assert_allclose(float(full), float(parts), rtol=1e-6)


def test_torch_ce_dice_parity():
    """Cross-check vs torch CrossEntropyLoss + the reference dice loop."""
    import torch
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 9, 12, 12)).astype(np.float32)
    labels = rng.integers(0, 9, (2, 12, 12))
    ce_t = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels).long()).item()
    ce_j = float(cross_entropy_loss(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(labels)))
    np.testing.assert_allclose(ce_j, ce_t, rtol=1e-5)
