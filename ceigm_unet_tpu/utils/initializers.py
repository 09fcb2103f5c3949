"""Initializers reproducing the reference's PyTorch init schemes.

The reference applies, via ``Block_mamba._init_weights`` and the decoder's
``named_apply(_init_weights, scheme='normal')`` (gm-unet/model/gm/
groupmamba.py:208-221, model/best_decoder.py:20-50):

- nn.Linear:   trunc_normal(std=0.02), bias 0
- nn.Conv2d:   normal(0, sqrt(2 / fan_out)), fan_out = kh*kw*out_ch/groups
               (efficientnet-like), bias 0; decoder scheme 'normal' uses
               normal(std=0.02)
- nn.LayerNorm / BatchNorm: weight 1, bias 0 (flax defaults already)

Flax kernel layouts: Dense (in, out); Conv (kh, kw, in/groups, out).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer


def trunc_normal(std: float = 0.02) -> Initializer:
    """Truncated normal on (-2σ, 2σ), matching timm's trunc_normal_."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


def normal(std: float = 0.02) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def conv_fan_out_normal() -> Initializer:
    """EfficientNet-like: normal(0, sqrt(2/fan_out)) with the torch fan_out
    convention fan_out = kh * kw * out_channels / groups.

    In flax Conv layout (kh, kw, in_per_group, out) with
    ``feature_group_count=g``: out_channels/groups = shape[-1] / g, and
    in_per_group = shape[-2] = C_in / g — but torch's formula only involves
    out_channels and groups, so we recover g from in_per_group at call sites
    via ``conv_fan_out_normal_grouped``. For g=1 this is exact.
    """
    def init(key, shape, dtype=jnp.float32):
        kh, kw = shape[0], shape[1]
        fan_out = kh * kw * shape[-1]
        return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)
    return init


def conv_fan_out_normal_grouped(groups: int) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        kh, kw = shape[0], shape[1]
        fan_out = kh * kw * shape[-1] // groups
        return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)
    return init


def torch_linear_default() -> Initializer:
    """PyTorch nn.Linear default: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def uniform_sym(bound: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def dt_bias_init(dt_min: float = 1e-3, dt_max: float = 0.1,
                 dt_init_floor: float = 1e-4) -> Initializer:
    """Softplus-inverse of a log-uniform dt in [dt_min, dt_max].

    Reference: mamba_init.dt_init (gm-unet/model/gm/ss2d.py:156-180).
    """
    def init(key, shape, dtype=jnp.float32):
        r = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(r * (math.log(dt_max) - math.log(dt_min))
                     + math.log(dt_min))
        dt = jnp.maximum(dt, dt_init_floor)
        # inverse of softplus: x = dt + log(-expm1(-dt))
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)
    return init


def s4d_a_log_init() -> Initializer:
    """A_log = log(1..N) per dim (S4D-real).

    Reference: mamba_init.A_log_init (gm-unet/model/gm/ss2d.py:183-197).
    Shape convention here: (..., d_inner, d_state).
    """
    def init(key, shape, dtype=jnp.float32):
        n = shape[-1]
        a = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))
        return jnp.broadcast_to(a, shape).astype(dtype)
    return init
