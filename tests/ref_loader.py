"""Loader for the torch reference model (CPU, for differential testing only).

Adds the shim dir + /root/reference/gm-unet to sys.path, patches the CUDA
selective-scan entry points with a pure-torch sequential implementation, and
exposes the reference ``model`` package. Never imported by product code.
"""
from __future__ import annotations

import os
import sys

REF_DIR = "/root/reference/gm-unet"
SHIM_DIR = os.path.join(os.path.dirname(__file__), "_shims")

_loaded = None


def reference_available() -> bool:
    return os.path.isdir(REF_DIR)


class _TorchSeqScan:
    """Drop-in for SelectiveScanCore/Oflex/Mamba: sequential fp32 scan.

    Signature per reference csms6s.py:324-386:
    apply(u, delta, A, B, C, D, delta_bias, delta_softplus, nrows,
    backnrows, oflex) -> out (B, D, L).
    """

    @staticmethod
    def apply(u, delta, A, B, C, D=None, delta_bias=None,
              delta_softplus=False, *args):
        import torch
        u = u.float()
        delta = delta.float()
        if delta_bias is not None:
            delta = delta + delta_bias.float().view(1, -1, 1)
        if delta_softplus:
            delta = torch.nn.functional.softplus(delta)
        if B.dim() == 3:
            B = B.unsqueeze(1)
        if C.dim() == 3:
            C = C.unsqueeze(1)
        batch, dim, L = u.shape
        _, G, N, _ = B.shape
        dg = dim // G
        Bd = B.float().repeat_interleave(dg, dim=1)  # (batch, dim, N, L)
        Cd = C.float().repeat_interleave(dg, dim=1)
        A = A.float()
        h = u.new_zeros(batch, dim, N)
        ys = []
        for t in range(L):
            a = torch.exp(delta[:, :, t, None] * A[None])
            b = (delta[:, :, t] * u[:, :, t])[:, :, None] * Bd[:, :, :, t]
            h = a * h + b
            ys.append((Cd[:, :, :, t] * h).sum(-1))
        y = torch.stack(ys, dim=-1)
        if D is not None:
            y = y + D.float().view(1, -1, 1) * u
        return y


def load_reference():
    """Import the reference ``model`` package with scan patched. Returns the
    package, or None if unavailable."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if not reference_available():
        return None
    for p in (SHIM_DIR, REF_DIR):
        if p not in sys.path:
            sys.path.insert(0, p)

    import model  # the reference package (needs shims on path)
    import model.gm.ss2d as gm_ss2d
    import model.gm.csms6s as gm_csms6s
    import model.vmamba.vmamba as vm
    import model.vmamba.csms6s as vm_csms6s

    for mod in (gm_ss2d, gm_csms6s, vm, vm_csms6s):
        for name in ("SelectiveScanCore", "SelectiveScanOflex",
                     "SelectiveScanMamba"):
            if hasattr(mod, name):
                setattr(mod, name, _TorchSeqScan)
    # Triton layout kernels can't run on CPU; the eager 4-direction
    # CrossScan/CrossMerge autograd functions share their API.
    vm.CrossScanTriton = vm_csms6s.CrossScan
    vm.CrossMergeTriton = vm_csms6s.CrossMerge
    # rebind the partial captured in FORWARD_TYPES at module construction
    # time: SS2Dv2.__initv2__ reads the module-global SelectiveScanCore, so
    # patching before model construction is sufficient.

    # the reference's one-name bug (model/__init__.py:29): EMCAD22nn is
    # undefined; the intended decoder is best_decoder.EMCAD (SURVEY.md §2.4)
    if not hasattr(model, "EMCAD22nn"):
        model.EMCAD22nn = model.EMCAD22n

    # Drop the triton shim once the reference modules hold their references:
    # a lingering fake ``triton`` makes torch._dynamo/_inductor believe
    # triton is installed and later crashes torch.optim construction
    # (AttributeError: triton.language.dtype) in unrelated tests.
    if SHIM_DIR in sys.path:
        sys.path.remove(SHIM_DIR)  # loguru/timm shims stay in sys.modules
    for name in [m for m in sys.modules
                 if m == "triton" or m.startswith("triton.")]:
        mod = sys.modules[name]
        if getattr(mod, "__file__", "") and SHIM_DIR in mod.__file__:
            del sys.modules[name]
    _loaded = model
    return model
