"""Parameter count + FLOPs accounting (reference gm-unet/calc_params.py +
utils.print_flops_params): analyzed at a 1x1x224x224 input via XLA's own
cost analysis instead of fvcore/thop/calflops."""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def count_params_flops(num_classes: int = 9, img_size: int = 224,
                       enc_name: str = "gm_tiny"):
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=num_classes, enc_name=enc_name,
                        scan_backend="assoc")
    x = jnp.zeros((1, img_size, img_size, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))

    lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(variables, x)
    try:
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", float("nan")) if cost else float("nan")
    except Exception:
        flops = float("nan")
    return n_params, flops


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num-classes", type=int, default=9)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--enc", default="gm_tiny")
    a = p.parse_args(argv)
    n, f = count_params_flops(a.num_classes, a.img_size, a.enc)
    print(f"Params: {n/1e6:.3f} M")
    print(f"FLOPs:  {f/1e9:.3f} G (XLA cost analysis, batch 1)")


if __name__ == "__main__":
    main()
