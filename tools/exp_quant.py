"""Sub-bf16 activation-storage experiment (r3 verdict #2): int8 u/dt at
the quad-scan boundary (CEIGM_QUANT=1).

Measures BOTH sides of the question on the real TPU:
  1. end-to-end logit drift vs the bf16 path (max / mean abs delta over
     a random batch, relative to the bf16 logits' dynamic range);
  2. model forward time via the same-process trace A/B (b128 default).

Run: python tools/exp_quant.py [batch]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def drift(B=8):
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=jnp.bfloat16,
                        scan_backend="auto")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 224, 224, 1)), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    outs = {}
    for q in ("0", "1"):
        os.environ["CEIGM_QUANT"] = q
        f = jax.jit(lambda q_: model.apply(v, q_))
        outs[q] = np.asarray(jax.device_get(f(x))).astype(np.float32)
    a, b = outs["0"], outs["1"]
    rng_ = np.abs(a).max()
    d = np.abs(b - a)
    print(f"logit drift b{B}: max {d.max():.4f}  mean {d.mean():.5f}  "
          f"bf16 range {rng_:.2f}  rel-max {d.max() / rng_:.4%}")
    # does the argmax (the segmentation) change?
    am_a = a.argmax(-1)
    am_b = b.argmax(-1)
    flip = (am_a != am_b).mean()
    print(f"argmax flips: {flip:.5%} of pixels")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    drift(B)


if __name__ == "__main__":
    main()
