"""On-device (jitted, batched) augmentation — the performance tier.

The reference augments on CPU worker processes with imgaug
(dataset_synapse.py:61-72), which bottlenecks TPU training. Here the same
policy runs on device, fused:

- all geometric ops (flips, scale, rotate, shear, translate) compose into
  ONE affine matrix per sample, applied together with the zoom-to-patch
  resize as a single bilinear (image) / nearest (label) gather — so a
  512^2 slice is augmented AND resized to 224^2 in one pass (BASELINE
  north star, config 5);
- photometric ops (additive Gaussian noise, Gaussian blur, linear
  contrast) are masked elementwise/conv ops;
- the SomeOf((0, 4), random order) policy is approximated by independent
  per-op Bernoulli gates calibrated to the same expected activation rate
  (each of 10 ops active w.p. 0.2 = E[n]/10); geometric order differences
  are absorbed into the affine composition.

Everything is batched over B and different per sample via per-sample keys.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

OP_PROB = 0.2  # E[#ops]=2 of 10, matching SomeOf((0,4)) in expectation


def _affine_params(key, h: int, w: int):
    """Per-sample random affine parameters with reference ranges."""
    ks = jax.random.split(key, 8)
    gate = jax.random.uniform(ks[0], (6,)) < OP_PROB  # per-op activation
    flipud = jnp.logical_and(gate[0], jax.random.uniform(ks[1], ()) < 0.5)
    fliplr = jnp.logical_and(gate[1], jax.random.uniform(ks[2], ()) < 0.5)
    scale = jnp.where(gate[2],
                      jax.random.uniform(ks[3], (2,), minval=0.5, maxval=2.0),
                      jnp.ones(2))
    rot = jnp.where(gate[3],
                    jax.random.uniform(ks[4], (), minval=-40.0, maxval=40.0),
                    0.0)
    shear = jnp.where(gate[4],
                      jax.random.uniform(ks[5], (), minval=-16.0,
                                         maxval=16.0), 0.0)
    trans = jnp.where(gate[5],
                      jax.random.uniform(ks[6], (2,), minval=-0.2,
                                         maxval=0.2), jnp.zeros(2))
    return flipud, fliplr, scale, rot, shear, trans


def _compose_matrix(flipud, fliplr, scale, rot_deg, shear_deg, trans_frac,
                    h, w):
    """Forward 3x3 affine in (x, y), center-origin: Shear∘Rot∘Trans∘Scale
    (same composition as the CPU parity tier, data/augment.py), flips folded
    into the scale signs. Returns (lin 2x2, offset 2)."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    r = jnp.deg2rad(rot_deg)
    sh = jnp.deg2rad(shear_deg)
    sx = scale[0] * jnp.where(fliplr, -1.0, 1.0)
    sy = scale[1] * jnp.where(flipud, -1.0, 1.0)
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    S = jnp.array([[sx, zero, zero], [zero, sy, zero], [zero, zero, one]])
    T = jnp.array([[one, zero, trans_frac[0] * w],
                   [zero, one, trans_frac[1] * h], [zero, zero, one]])
    R = jnp.array([[jnp.cos(r), -jnp.sin(r), zero],
                   [jnp.sin(r), jnp.cos(r), zero], [zero, zero, one]])
    Sh = jnp.array([[one, -jnp.sin(sh), zero],
                    [zero, jnp.cos(sh), zero], [zero, zero, one]])
    C = jnp.array([[one, zero, cx], [zero, one, cy], [zero, zero, one]])
    Ci = jnp.array([[one, zero, -cx], [zero, one, -cy], [zero, zero, one]])
    M = C @ Sh @ R @ T @ S @ Ci
    return M[:2, :2], M[:2, 2]


@functools.partial(jax.jit, static_argnames=("out_size",))
def device_augment(key, images: jnp.ndarray, labels: jnp.ndarray,
                   out_size: int = 224) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images/labels: (B, H, W) -> augmented + resized (B, out, out)."""
    B, H, W = images.shape
    keys = jax.random.split(key, B)

    ys = (jnp.arange(out_size) + 0.5) * (H / out_size) - 0.5
    xs = (jnp.arange(out_size) + 0.5) * (W / out_size) - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # output grid in input px

    def one(key, img, lab):
        kp, kn, kb, kc, ke = jax.random.split(key, 5)
        flipud, fliplr, scale, rot, shear, trans = _affine_params(kp, H, W)
        lin, off = _compose_matrix(flipud, fliplr, scale, rot, shear,
                                   trans, H, W)
        inv = jnp.linalg.inv(lin)
        # sample input coords for each output pixel (inverse map)
        src = jnp.einsum("ij,jhw->ihw", inv,
                         jnp.stack([gx - off[0], gy - off[1]]))
        sx_, sy_ = src[0], src[1]

        def bilinear(im):
            x0 = jnp.floor(sx_)
            y0 = jnp.floor(sy_)
            wx = sx_ - x0
            wy = sy_ - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            def take(yi, xi):
                v = im[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
                inside = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
                return jnp.where(inside, v, 0.0)  # imgaug cval=0

            return (take(y0i, x0i) * (1 - wx) * (1 - wy)
                    + take(y0i, x0i + 1) * wx * (1 - wy)
                    + take(y0i + 1, x0i) * (1 - wx) * wy
                    + take(y0i + 1, x0i + 1) * wx * wy)

        def nearest(im):
            xi = jnp.round(sx_).astype(jnp.int32)
            yi = jnp.round(sy_).astype(jnp.int32)
            v = im[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
            inside = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            return jnp.where(inside, v, 0)

        img_o = bilinear(img.astype(jnp.float32))
        lab_o = nearest(lab)

        # photometric ops on the resized image
        g = jax.random.uniform(kn, (3,)) < OP_PROB
        img_o = jnp.where(
            g[0], img_o + 0.005 * 255 * jax.random.normal(ke, img_o.shape),
            img_o)
        blur = _gaussian_blur(img_o, sigma=1.0)
        img_o = jnp.where(g[1], blur, img_o)
        alpha = jax.random.uniform(kc, (), minval=0.5, maxval=1.5)
        pivot = 0.5
        img_o = jnp.where(g[2], (img_o - pivot) * alpha + pivot, img_o)
        return img_o, lab_o

    return jax.vmap(one)(keys, images, labels)


def _gaussian_blur(img: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Separable Gaussian blur, truncated at 4 sigma (scipy convention)."""
    radius = int(4 * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = [(radius, radius), (0, 0)]
    img_p = jnp.pad(img, pad, mode="edge")
    v = jnp.stack([img_p[i:i + img.shape[0]] for i in range(2 * radius + 1)])
    img = jnp.einsum("k,khw->hw", k, v)
    img_p = jnp.pad(img, [(0, 0), (radius, radius)], mode="edge")
    v = jnp.stack([img_p[:, i:i + img.shape[1]]
                   for i in range(2 * radius + 1)])
    return jnp.einsum("k,khw->hw", k, v)
