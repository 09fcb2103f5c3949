"""Per-section forward-time attribution on the real TPU.

Times each model section independently (jitted fori_loop chaining + scalar
fetch, the only reliable method on the tunneled TPU — see docs/STATUS.md)
and prints a table whose sum should approximate the full forward. Use to
locate layout churn / fusion failures, not for absolute MFU claims.

Usage:  python tools/profile_model.py [section-filter]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

BATCH = 64
DTYPE = jnp.bfloat16
ITERS = 6


def loop_time(fn, x0, n=ITERS):
    """Time fn via a scalar-carried fori_loop: iteration i computes
    fn(x0 + eps*carry) — the tiny broadcast-add fuses into fn's first read,
    so the chain adds no standalone full-tensor pass (the old x-carried
    chain cost ~0.5 ms/iter of pure HBM traffic at stage-1 shapes)."""
    @jax.jit
    def run(x0, n):
        def body(i, carry):
            y = fn(jax.tree.map(
                lambda v: v + (carry * 1e-12).astype(v.dtype), x0))
            # FULL reduction: a sliced consumer lets XLA dead-code-eliminate
            # the op body entirely (observed: matmuls timed at 0.000)
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(y)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def once(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run(x0, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(jax.device_get(run(x0, 2)))   # compile + warm
    t1 = once(n)
    t2 = once(2 * n)
    return max(t2 - t1, 1e-9) / n


def chainify(fn, shape_like):
    return fn


def module_section(mod, shape, extra=None, method=None):
    x = jnp.ones(shape, DTYPE)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    def fn(x):
        return mod.apply(variables, x)
    return fn, x


SECTIONS = {}


def section(name, count=1):
    def deco(builder):
        SECTIONS[name] = (builder, count)
        return builder
    return deco


# ---------------- encoder ----------------

@section("stem")
def _stem():
    from ceigm_unet_tpu.models.groupmamba import Stem
    return module_section(Stem(hidden_dim=32, out_dim=64, dtype=DTYPE),
                          (BATCH, 224, 224, 3))


def _block(dim, ratio, hw, custom=False):
    from ceigm_unet_tpu.models.groupmamba import BlockMamba
    return module_section(
        BlockMamba(dim=dim, mlp_ratio=ratio, use_custom_ffn=custom,
                   dtype=DTYPE), (BATCH, hw, hw, dim))


@section("enc_s1_block", count=3)
def _b1():
    return _block(64, 8, 56)


@section("enc_s2_block", count=4)
def _b2():
    return _block(128, 8, 28)


@section("enc_s3_block", count=9)
def _b3():
    return _block(348, 4, 14)


@section("enc_s4_block", count=3)
def _b4():
    return _block(448, 4, 7)


@section("downsamples", count=1)
def _down():
    from ceigm_unet_tpu.models.groupmamba import DownSample

    f1, x1 = module_section(DownSample(out_dim=128, dtype=DTYPE),
                            (BATCH, 56, 56, 64))
    f2, x2 = module_section(DownSample(out_dim=348, dtype=DTYPE),
                            (BATCH, 28, 28, 128))
    f3, x3 = module_section(DownSample(out_dim=448, dtype=DTYPE),
                            (BATCH, 14, 14, 348))

    def fn(x):
        return f3(jnp.ones((BATCH, 14, 14, 348), DTYPE) *
                  jnp.mean(f2(jnp.ones((BATCH, 28, 28, 128), DTYPE) *
                              jnp.mean(f1(x).astype(DTYPE)))
                           .astype(DTYPE)))
    return fn, x1


# -------------- quad-group internals (stage shapes) --------------

def _quad(dim, hw):
    from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
    return module_section(QuadGroupSS2D(dim=dim, dtype=DTYPE),
                          (BATCH, hw, hw, dim))


@section("quad_s1", count=3)
def _q1():
    return _quad(64, 56)


@section("quad_s2", count=4)
def _q2():
    return _quad(128, 28)


@section("quad_s3", count=9)
def _q3():
    return _quad(348, 14)


@section("quad_s4", count=3)
def _q4():
    return _quad(448, 7)


def _ffn(dim, ratio, hw, custom=False):
    from ceigm_unet_tpu.models.layers import Pvt2Ffn, CustomFfn
    mod = (CustomFfn(hidden=int(dim * ratio), dtype=DTYPE) if custom
           else Pvt2Ffn(hidden=int(dim * ratio), dtype=DTYPE))
    return module_section(mod, (BATCH, hw, hw, dim))


@section("ffn_s1", count=3)
def _f1():
    return _ffn(64, 8, 56)


@section("ffn_s2", count=4)
def _f2():
    return _ffn(128, 8, 28)


@section("ffn_s3", count=9)
def _f3():
    return _ffn(348, 4, 14)


@section("ffn_s4", count=3)
def _f4():
    return _ffn(448, 4, 7)


# -------------- scan op at in-model shapes --------------

def _scan_shape(dim, hw, name):
    from ceigm_unet_tpu.ops.selective_scan import selective_scan
    K = 4
    D = dim // 4
    L = hw * hw
    M = K * D
    u = jnp.ones((BATCH, M, L), DTYPE)
    dt = jnp.ones((BATCH, M, L), DTYPE) * 0.1
    A = -jnp.ones((M, 1), jnp.float32)
    Bm = jnp.ones((BATCH, K, 1, L), DTYPE)
    Cm = jnp.ones((BATCH, K, 1, L), DTYPE)
    Dv = jnp.ones((M,), jnp.float32)
    db = jnp.zeros((M,), jnp.float32)

    def fn(u):
        return selective_scan(u, dt, A, Bm, Cm, Dv, db, delta_softplus=True,
                              backend="pallas", out_dtype=jnp.float32)
    return fn, u


@section("scanop_s1", count=3)
def _s1():
    return _scan_shape(64, 56, "s1")


@section("scanop_s3", count=9)
def _s3():
    return _scan_shape(348, 14, "s3")


# -------------- cross-scan layout cost --------------

@section("cross_layout_s1", count=3)
def _cl1():
    from ceigm_unet_tpu.ops.cross_scan import cross_scan_1d, cross_merge_1d
    dim, hw = 64, 56
    x = jnp.ones((BATCH, hw, hw, 4, dim // 4), DTYPE)

    def fn(x):
        xs = jnp.stack([cross_scan_1d(x[:, :, :, i], k)
                        for i, k in enumerate((1, 2, 3, 4))], axis=1)
        ys = xs.astype(jnp.float32)
        yg = jnp.stack([cross_merge_1d(ys[:, i], k, hw, hw)
                        for i, k in enumerate((1, 2, 3, 4))], axis=3)
        return yg.astype(DTYPE).reshape(BATCH, hw, hw, 4, dim // 4)
    return fn, x


# ---------------- decoder ----------------

@section("dec_mscam", count=1)
def _mscam():
    from ceigm_unet_tpu.models.emcad import (SplitChannelsOddEven,
                                             ParallelAttentionFusion)
    import flax.linen as nn

    class MSCAM(nn.Module):
        c: int

        @nn.compact
        def __call__(self, d):
            c1, s1 = SplitChannelsOddEven(channels=self.c, dtype=DTYPE,
                                          name="cc")(d)
            return ParallelAttentionFusion(channels=self.c, dtype=DTYPE,
                                           name="para")(c1, s1)

    fns = []
    x0 = None
    for c, hw in ((448, 7), (348, 14), (128, 28), (64, 56)):
        f, x = module_section(MSCAM(c=c), (BATCH, hw, hw, c))
        fns.append((f, x.shape))
        if x0 is None:
            x0 = x

    def fn(x):
        acc = jnp.mean(fns[0][0](x).astype(jnp.float32))
        for f, shape in fns[1:]:
            acc = acc + jnp.mean(
                f(jnp.ones(shape, DTYPE) * acc.astype(DTYPE))
                .astype(jnp.float32))
        return acc[None, None, None, None] * jnp.ones_like(x)
    return fn, x0


@section("dec_dysample", count=1)
def _dys():
    from ceigm_unet_tpu.models.emcad import DySample
    f3, x3 = module_section(
        DySample(in_channels=448, out_channels=348, dtype=DTYPE),
        (BATCH, 7, 7, 448))
    f2, _ = module_section(
        DySample(in_channels=348, out_channels=128, dtype=DTYPE),
        (BATCH, 14, 14, 348))
    f1, _ = module_section(
        DySample(in_channels=128, out_channels=64, dtype=DTYPE),
        (BATCH, 28, 28, 128))

    def fn(x):
        a = jnp.mean(f3(x).astype(jnp.float32))
        b = jnp.mean(f2(jnp.ones((BATCH, 14, 14, 348), DTYPE)
                        * a.astype(DTYPE)).astype(jnp.float32))
        c = jnp.mean(f1(jnp.ones((BATCH, 28, 28, 128), DTYPE)
                        * b.astype(DTYPE)).astype(jnp.float32))
        return jnp.ones_like(x) * c.astype(DTYPE)
    return fn, x3


@section("dec_lgag", count=1)
def _lgag():
    from ceigm_unet_tpu.models.emcad import LGAG
    import flax.linen as nn

    class L3(nn.Module):
        @nn.compact
        def __call__(self, g):
            o = 0.0
            for c, hw, i in ((348, 14, 3), (128, 28, 2), (64, 56, 1)):
                gi = jnp.ones((BATCH, hw, hw, c), DTYPE) * (
                    jnp.mean(g.astype(jnp.float32)).astype(DTYPE)
                    if i != 3 else 1.0)
                x = LGAG(f_int=c // 2, groups=c // 2, dtype=DTYPE,
                         name=f"lgag{i}")(gi, gi)
                o = o + jnp.mean(x.astype(jnp.float32))
            return jnp.ones_like(g) * o.astype(DTYPE)

    return module_section(L3(), (BATCH, 14, 14, 348))


@section("dec_front_f1", count=3)
def _fr1():
    return _block(348, 4, 14, custom=True)


@section("dec_front_f2", count=2)
def _fr2():
    return _block(128, 4, 28, custom=True)


@section("dec_front_f3", count=2)
def _fr3():
    return _block(64, 4, 56, custom=True)


@section("head_up4", count=1)
def _head():
    from ceigm_unet_tpu.models.layers import bilinear_upsample
    import flax.linen as nn
    f, x = module_section(nn.Conv(9, (1, 1), dtype=DTYPE), (BATCH, 56, 56, 64))

    def fn(x):
        return bilinear_upsample(f(x).astype(jnp.float32), 4).astype(DTYPE)
    return fn, x


# -------------- micro: ffn_s1 internals (dim 64, hidden 512, 56²) --------

@section("micro_fc1_s1")
def _m_fc1():
    import flax.linen as nn
    return module_section(nn.Dense(512, dtype=DTYPE), (BATCH, 56, 56, 64))


@section("micro_fc2_s1")
def _m_fc2():
    import flax.linen as nn
    return module_section(nn.Dense(64, dtype=DTYPE), (BATCH, 56, 56, 512))


@section("micro_dw3_h512_s1")
def _m_dw():
    from ceigm_unet_tpu.models.layers import DwConv
    return module_section(DwConv(features=512, kernel=3),
                          (BATCH, 56, 56, 512))


@section("micro_gelu_s1")
def _m_gelu():
    import flax.linen as nn
    x = jnp.ones((BATCH, 56, 56, 512), DTYPE)
    return (lambda v: nn.gelu(v, approximate=False)), x


@section("micro_ln_s1")
def _m_ln():
    import flax.linen as nn
    return module_section(
        nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32), (BATCH, 56, 56, 64))


# -------------- micro: quad_s1 internals (dim 64, dg 16, 56²) ------------

@section("micro_inproj_s1")
def _m_inproj():
    w = jnp.ones((4, 16, 32), DTYPE)
    x = jnp.ones((BATCH, 56, 56, 4, 16), DTYPE)
    return (lambda v: jnp.einsum("bhwkc,kcd->bhwkd", v, w)), x


@section("micro_xproj_s1")
def _m_xproj():
    w = jnp.ones((4, 3, 16), DTYPE)
    x = jnp.ones((BATCH, 56, 56, 4, 16), DTYPE)
    return (lambda v: jnp.einsum("bhwkd,kcd->bhwkc", v, w)), x


@section("micro_dwconv_s1")
def _m_qdw():
    from ceigm_unet_tpu.models.layers import DwConv
    return module_section(DwConv(features=64, kernel=3),
                          (BATCH, 56, 56, 64))


@section("micro_scan_full_s1")
def _m_scanfull():
    """cross_scan + fused scan + merge at stage-1 shape (the real path)."""
    from ceigm_unet_tpu.ops.cross_scan import cross_scan_1d, cross_merge_1d
    from ceigm_unet_tpu.ops.selective_scan import selective_scan
    D, hw = 16, 56
    L = hw * hw
    A = -jnp.ones((64, 1), jnp.float32)
    Dv = jnp.ones((64,), jnp.float32)
    db = jnp.zeros((64,), jnp.float32)
    x = jnp.ones((BATCH, hw, hw, 4, D), DTYPE)

    def fn(xc):
        dirs = (1, 2, 3, 4)
        xs = jnp.stack([cross_scan_1d(xc[:, :, :, i], k)
                        for i, k in enumerate(dirs)], axis=1)
        u = xs.reshape(BATCH, 64, L)
        Bm = jnp.ones((BATCH, 4, 1, L), DTYPE)
        ys = selective_scan(u, 0.1 * u, A, Bm, Bm, Dv, db,
                            delta_softplus=True, backend="pallas",
                            out_dtype=jnp.float32).reshape(BATCH, 4, 16, L)
        return jnp.stack([cross_merge_1d(ys[:, i], k, hw, hw)
                          for i, k in enumerate(dirs)], axis=3).astype(DTYPE)
    return fn, x


@section("micro_groupln_gate_s1")
def _m_gln():
    s = jnp.ones((4, 16), jnp.float32)
    b = jnp.zeros((4, 16), jnp.float32)
    x = jnp.ones((BATCH, 56, 56, 4, 16), jnp.float32)

    def fn(yg):
        mu = jnp.mean(yg, axis=-1, keepdims=True)
        var = jnp.var(yg, axis=-1, keepdims=True)
        yg = (yg - mu) * jax.lax.rsqrt(var + 1e-5) * s + b
        return yg.astype(DTYPE) * yg.astype(DTYPE)
    return fn, x


# -------------- micro: front-f3 internals (dim 64, hidden 256, 56²) ------

@section("micro_inception_f3")
def _m_incep():
    from ceigm_unet_tpu.models.layers import InceptionDWConvMultiScale
    return module_section(InceptionDWConvMultiScale(), (BATCH, 56, 56, 256))


@section("micro_dysample_fine")
def _m_dys_fine():
    from ceigm_unet_tpu.models.emcad import DySample
    return module_section(
        DySample(in_channels=128, out_channels=64, dtype=DTYPE),
        (BATCH, 28, 28, 128))


# -------------- micro: dysample fine stage internals ---------------------

@section("micro_dys_offsets")
def _m_dys_off():
    import flax.linen as nn
    from ceigm_unet_tpu.models.emcad import _conv
    from ceigm_unet_tpu.utils.initializers import normal

    class Off(nn.Module):
        @nn.compact
        def __call__(self, x):
            off = _conv(32, 1, "offset0", std=1e-3, dtype=DTYPE)(x)
            return nn.Conv(32, (3, 3), padding="SAME",
                           kernel_dilation=(2, 2), use_bias=False,
                           kernel_init=normal(1e-3), dtype=DTYPE,
                           name="offset1")(off)
    return module_section(Off(), (BATCH, 28, 28, 128))


@section("micro_dys_sample")
def _m_dys_samp():
    from ceigm_unet_tpu.ops.grid_sample import grid_sample_bilinear_fused
    rngs = np.random.default_rng(0)
    x = jnp.asarray(rngs.standard_normal((BATCH * 4, 28, 28, 32)),
                    jnp.bfloat16)
    g = jnp.asarray(rngs.uniform(-1, 1, (BATCH * 4, 56, 56, 2)), jnp.float32)

    def fn(x):
        return grid_sample_bilinear_fused(x, g)
    return fn, x


@section("micro_dys_regroup")
def _m_dys_regroup():
    x = jnp.ones((BATCH, 28, 28, 128), DTYPE)

    def fn(x):
        B, H, W, C = x.shape
        g = 4
        xg = x.reshape(B, H, W, g, C // g)
        xg = xg.transpose(0, 3, 1, 2, 4).reshape(B * g, H, W, C // g)
        out = xg  # stand-in for the sampled result at 2x
        out = jnp.broadcast_to(out[:, :, None, :, None, :],
                               (B * g, H, 2, W, 2, C // g)
                               ).reshape(B, g, 2 * H, 2 * W, C // g)
        return out.transpose(0, 2, 3, 1, 4).reshape(B, 2 * H, 2 * W, C)
    return fn, x


@section("micro_dys_eucb")
def _m_dys_eucb():
    from ceigm_unet_tpu.models.emcad import EUCB2
    return module_section(EUCB2(in_channels=128, out_channels=64,
                                dtype=DTYPE), (BATCH, 56, 56, 128))


@section("FULL_MODEL", count=1)
def _full():
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=DTYPE, scan_backend="auto")
    x = jnp.ones((BATCH, 224, 224, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def fn(x):
        return model.apply(variables, x)
    return fn, x


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    total = 0.0
    print(f"{'section':20s} {'ms(one)':>9s} {'x':>3s} {'ms(total)':>10s}")
    for name, (builder, count) in SECTIONS.items():
        if filt and filt not in name:
            continue
        fn, x = builder()
        t = loop_time(chainify(fn, x.shape), x) * 1e3
        if name != "FULL_MODEL" and not name.startswith(("quad", "ffn",
                                                         "scanop",
                                                         "cross_layout")):
            total += t * count
        print(f"{name:20s} {t:9.3f} {count:3d} {t * count:10.3f}")
    print(f"{'SUM(parts)':20s} {'':9s} {'':3s} {total:10.3f}")


if __name__ == "__main__":
    main()
