"""Speed-of-light analysis of the headline forward.

Sums XLA's compiled cost analysis (FLOPs + bytes accessed) and converts
to v5e roof numbers (197 bf16 TFLOP/s, 819 GB/s HBM) to bound how fast
the compiled graph could possibly run, and therefore what fraction of
the remaining step time is roofline vs inefficiency.

Run on TPU: python tools/sol.py [batch]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

PEAK_FLOPS = 197e12          # v5e bf16
PEAK_BW = 819e9              # v5e HBM bytes/s


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=jnp.bfloat16,
                        scan_backend="auto")
    x = jnp.zeros((batch, 224, 224, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    fn = jax.jit(lambda v, q: model.apply(v, q))
    compiled = fn.lower(variables, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    byt = ca.get("bytes accessed", 0.0)
    t_f = flops / PEAK_FLOPS
    t_b = byt / PEAK_BW
    print(f"batch={batch}")
    print(f"flops          {flops / 1e9:10.1f} GFLOP  -> {t_f * 1e3:7.2f} ms at peak MXU")
    print(f"bytes accessed {byt / 2**30:10.2f} GiB    -> {t_b * 1e3:7.2f} ms at peak HBM BW")
    print(f"roofline step floor: {max(t_f, t_b) * 1e3:.2f} ms "
          f"({batch / max(t_f, t_b):.0f} slices/s)")
    # breakdown of the biggest bytes-accessed entries if available
    ops = [(k, v) for k, v in ca.items()
           if k.startswith("bytes accessed") and k != "bytes accessed"]
    ops.sort(key=lambda kv: -kv[1])
    for k, v in ops[:10]:
        print(f"  {k}: {v / 2**20:.1f} MiB")


if __name__ == "__main__":
    main()
