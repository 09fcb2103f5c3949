"""Fast exact-GELU for TPU.

The reference uses torch ``nn.GELU()`` (exact erf form). XLA's erf lowering
costs ~20 VPU ops/element — profiled at 2.4 ms for one stage-1 FFN
activation pass at batch 64 (tools/bench_variants.py), making GELU alone
~15 ms of the 87 ms forward. This drop-in uses the Abramowitz-Stegun
7.1.26 rational-exponential erf approximation (max |gelu err| 6.7e-7,
far below both bf16 resolution and every parity tolerance in tests/),
measured 4x faster (0.59 ms at the same shape).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_P = 0.3275911
_INV_SQRT2 = 0.7071067811865476


def _erf_as(t: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 erf, max abs error ~1.5e-7 in fp32."""
    s = jnp.sign(t)
    t = jnp.abs(t)
    u = 1.0 / (1.0 + _P * t)
    p = u * (_A[0] + u * (_A[1] + u * (_A[2] + u * (_A[3] + u * _A[4]))))
    return s * (1.0 - p * jnp.exp(-t * t))


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-form GELU (torch nn.GELU parity to ~7e-7 in fp32), VPU-friendly.

    The polynomial runs in the INPUT dtype. In the bf16 perf regime an
    explicit fp32 upcast here made every fusion-cut tensor of the FFN
    hidden fp32 — the stage-1/2 FFN mega-fusions each spilled three
    f32[B,H,W,8C] planes to HBM (r3 HLO trace: 3x1.7 ms at stage 1
    alone, 2x the bf16 traffic). bf16 evaluation keeps the cuts bf16;
    the extra rounding is O(1 bf16 ulp) on the already-bf16 output
    (worst relative error ~7e-4 vs the fp32 evaluation at |x|~1.4,
    under the 3e-2 bf16 parity tolerances everywhere).
    """
    half = jnp.asarray(0.5, x.dtype)
    return x * (half + half * _erf_as(x * jnp.asarray(_INV_SQRT2, x.dtype)))
