"""Sequence-parallel QuadGroupSS2D forward — 2-D images sharded over H.

Turns the standalone ring scan (ring_scan.py) into the SURVEY §5.7
capability: a full GroupMamba quad-scan block whose 512²-class feature map
is sharded across the mesh along H, exact to the single-device module.

Layout strategy per scan direction (the reference CrossScan_1..4):
- directions 1/3 (row-major): H-sharding IS contiguous row-major L
  sharding — the distributed scan runs directly (reverse=True for 3), no
  data movement.
- directions 2/4 (column-major): one ``all_to_all`` re-shards the tensor
  to W-sharding, where column-major order is contiguous again; the scan
  runs there and one ``all_to_all`` brings the result back.
- the depthwise conv exchanges a (k//2)-row halo with ring ``ppermute``
  (edge devices receive zeros == 'SAME' zero padding).

All collectives (ppermute / all_to_all / all_gather of tiny scan
summaries) ride ICI on real meshes; everything else is local.

Call :func:`quad_group_ss2d_sp` inside ``shard_map`` with x sharded
``P(None, axis, None, None)`` and params replicated. Parameters are the
QuadGroupSS2D tree (models/ss2d.py) verbatim.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.parallel.ring_scan import selective_scan_sp


def _halo_dwconv(x, kernel, bias, axis_name):
    """Depthwise (k, k) conv with 'SAME' zero padding on the GLOBAL image,
    x sharded (B, H_local, W, C): ring-ppermute a k//2-row halo."""
    B, Hl, W, C = x.shape
    k = kernel.shape[0]
    r = k // 2
    n = jax.lax.axis_size(axis_name)
    if r > 0 and n > 1:
        # rows flowing DOWN into the next shard's top halo
        top = jax.lax.ppermute(x[:, -r:], axis_name,
                               [(i, i + 1) for i in range(n - 1)])
        bot = jax.lax.ppermute(x[:, :r], axis_name,
                               [(i, i - 1) for i in range(1, n)])
        xp = jnp.concatenate([top, x, bot], axis=1)
    else:
        xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)))
    # vertical padding already provided by halos (or the explicit pad)
    out = jax.lax.conv_general_dilated(
        xp, kernel.astype(x.dtype), (1, 1), [(0, 0), (r, r)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def _to_cm(q, axis_name):
    """(B, H_local, W, *) H-sharded -> (B, W_local, H, *) W-sharded (the
    transposed image, where column-major order is contiguous)."""
    t = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)          # (B, H, W_local, *)
    return jnp.swapaxes(t, 1, 2)                # (B, W_local, H, *)


def _from_cm(q, axis_name):
    t = jnp.swapaxes(q, 1, 2)                   # (B, H, W_local, *)
    return jax.lax.all_to_all(t, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)       # (B, H_local, W, *)


def quad_group_ss2d_sp(params, x, axis_name: str = "sp",
                       directions=(1, 2, 3, 4)):
    """Functional QuadGroupSS2D forward for H-sharded inputs (run inside
    shard_map). Exact vs the single-device module (assoc backend)."""
    K = len(directions)
    B, Hl, W, C = x.shape
    dg = C // K
    di = dg                                   # ssm_ratio 1 (live config)
    Din = K * di
    R = math.ceil(dg / 16)
    Ll = Hl * W

    w_in = params["in_proj_weight"]           # (K, dg, 2*di)
    w_bd = jax.scipy.linalg.block_diag(*[w_in[k] for k in range(K)])
    cols = np.arange(K * 2 * di).reshape(K, 2 * di)
    perm = np.concatenate([cols[:, :di].ravel(), cols[:, di:].ravel()])
    xz = x.reshape(B * Ll, C) @ w_bd[:, perm]
    xc = xz[:, :Din].reshape(B, Hl, W, Din)
    z = jax.nn.silu(xz[:, Din:]).reshape(B, Hl, W, K, di)

    conv = params["conv2d"]
    xc = _halo_dwconv(xc, conv["kernel"], conv.get("bias"), axis_name)
    xc = jax.nn.silu(xc).reshape(B, Hl, W, K, di)

    p = params["ssm"]
    x_dbl = jnp.einsum("bhwkd,kcd->bhwkc", xc, p["x_proj_weight"])
    dts = x_dbl[..., :R]
    Bs, Cs = x_dbl[..., R], x_dbl[..., R + 1]
    dt = jnp.einsum("bhwkr,kdr->bhwkd", dts, p["dt_projs_weight"])
    A = -jnp.exp(p["A_logs"].astype(jnp.float32)).reshape(K, di)
    bias = p["dt_projs_bias"]
    Ds = p["Ds"].reshape(K, di)

    ys = []
    for i, dirn in enumerate(directions):
        u_i = xc[:, :, :, i]                  # (B, Hl, W, di)
        dt_i = dt[:, :, :, i]
        B_i = Bs[:, :, :, i:i + 1]
        C_i = Cs[:, :, :, i:i + 1]
        cm = dirn in (2, 4)
        if cm:
            u_i, dt_i, B_i, C_i = (
                _to_cm(q, axis_name) for q in (u_i, dt_i, B_i, C_i))
        sh = u_i.shape                        # (B, S1, S2, di)
        flat = lambda q: q.reshape(B, sh[1] * sh[2], -1).swapaxes(1, 2)
        y = selective_scan_sp(
            flat(u_i), flat(dt_i), A[i][:, None],
            flat(B_i)[:, None], flat(C_i)[:, None], Ds[i], bias[i],
            delta_softplus=True, axis_name=axis_name,
            reverse=(dirn in (3, 4)))
        y = y.swapaxes(1, 2).reshape(sh)
        if cm:
            y = _from_cm(y, axis_name)
        ys.append(y)

    yg = jnp.stack(ys, axis=3).astype(jnp.float32)  # (B, Hl, W, K, di)
    mu = jnp.mean(yg, axis=-1, keepdims=True)
    var = jnp.var(yg, axis=-1, keepdims=True)
    yg = (yg - mu) * jax.lax.rsqrt(var + 1e-5) * params["out_norm_scale"] \
        + params["out_norm_bias"]
    yg = yg.astype(x.dtype) * z
    out = jnp.einsum("bhwkd,kdc->bhwkc", yg, params["out_proj_weight"])
    return out.reshape(B, Hl, W, C)
