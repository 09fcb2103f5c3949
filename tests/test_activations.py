"""fast GELU: fp32 path matches exact erf GELU to ~7e-7; the bf16 path
(polynomial evaluated in bf16 — keeps fusion-cut tensors bf16, see
ops/activations.py) stays within a few bf16 ulps of the exact value."""
import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.activations import gelu


def _exact(x64):
    from scipy.special import erf
    return 0.5 * x64 * (1.0 + erf(x64 / np.sqrt(2.0)))


def test_fp32_accuracy():
    x = np.linspace(-6.0, 6.0, 20001).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)), np.float64)
    want = _exact(x.astype(np.float64))
    assert np.abs(got - want).max() < 1e-6


def test_bf16_accuracy():
    x64 = np.linspace(-6.0, 6.0, 20001).astype(np.float64)
    xb = jnp.asarray(x64, jnp.bfloat16)
    got = np.asarray(gelu(xb), np.float64)
    want = _exact(np.asarray(xb, np.float64))
    err = np.abs(got - want)
    # bf16 polynomial rounding: ~4e-3 absolute floor in the
    # alternating-coefficient cancellation zone near |x|~1.1, plus a
    # few-ulp (<1%) relative component where the output is large
    assert (err < 6e-3 + 1e-2 * np.abs(want)).all(), err.max()


def test_bf16_stays_bf16():
    y = gelu(jnp.ones((4, 4), jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
