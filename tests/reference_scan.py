"""Pure-NumPy sequential selective scan — ground truth for differential tests.

Independent implementation of the S6 recurrence from its mathematical
definition (reference semantics documented in
gm-unet/kernels/selective_scan/README.md and test_selective_scan.py's
``selective_scan_ref``):

    dt_t   = softplus(delta_t + delta_bias)        (optional)
    h_t    = exp(dt_t * A) h_{t-1} + dt_t * u_t * B_t
    y_t    = sum_n C_{n,t} h_{n,t} + D * u_t
"""
from __future__ import annotations

import numpy as np


def selective_scan_numpy(u, delta, A, B, C, D=None, delta_bias=None,
                         delta_softplus=False, return_last_state=False):
    u = np.asarray(u, np.float64)
    delta = np.asarray(delta, np.float64)
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    C = np.asarray(C, np.float64)
    if B.ndim == 3:
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]

    batch, dim, L = u.shape
    _, G, N, _ = B.shape
    dg = dim // G

    dt = delta.copy()
    if delta_bias is not None:
        dt = dt + np.asarray(delta_bias, np.float64)[None, :, None]
    if delta_softplus:
        dt = np.where(dt <= 20.0, np.log1p(np.exp(np.minimum(dt, 20.0))), dt)

    h = np.zeros((batch, dim, N), np.float64)
    ys = np.zeros((batch, dim, L), np.float64)
    # expand per-group B/C to per-dim (batch, dim, N, L)
    Bd = np.repeat(B, dg, axis=1)
    Cd = np.repeat(C, dg, axis=1)
    for t in range(L):
        a = np.exp(dt[:, :, t, None] * A[None])                 # (b, d, n)
        b = (dt[:, :, t] * u[:, :, t])[:, :, None] * Bd[:, :, :, t]
        h = a * h + b
        ys[:, :, t] = np.einsum("bdn,bdn->bd", Cd[:, :, :, t], h)
    if D is not None:
        ys = ys + np.asarray(D, np.float64)[None, :, None] * u
    if return_last_state:
        return ys, h
    return ys
