"""Debug guards: nan/inf detection + intermediate-tensor capture.

TPU rebuild of the reference's debug hooks:
- ``check_nan_inf`` (gm-unet/model/gm/csms6s.py:231-235): print + pdb on
  nan/inf. Under jit we can't drop into pdb mid-trace, so the guard uses
  ``jax.debug.callback`` (works inside jit/pjit/shard_map; runs on the host
  when the value materializes) and raises ``FloatingPointError`` — pair
  with ``CEIGM_DEBUG_PDB=1`` to get a post-mortem prompt.
- ``__DEBUG__`` tensor capture (gm-unet/model/gm/ss2d.py:488-493): stash
  the scan's intermediate tensors on a module-level dict for inspection.

Both are opt-in via ``CEIGM_DEBUG_NANCHECK=1`` / ``CEIGM_DEBUG_CAPTURE=1``
and compile to nothing when off (the checks happen at trace time, so the
disabled path adds zero ops to the compiled program).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

# latest captured intermediates (tag -> host array); CEIGM_DEBUG_CAPTURE=1
CAPTURED: Dict[str, Any] = {}


def nancheck_enabled() -> bool:
    return os.environ.get("CEIGM_DEBUG_NANCHECK") == "1"


def capture_enabled() -> bool:
    return os.environ.get("CEIGM_DEBUG_CAPTURE") == "1"


def _report(tag, has_nan, has_inf):
    if bool(has_nan) or bool(has_inf):
        msg = f"check_nan_inf[{tag}]: nan={bool(has_nan)} inf={bool(has_inf)}"
        print(msg, flush=True)
        if os.environ.get("CEIGM_DEBUG_PDB") == "1":
            import pdb
            pdb.set_trace()
        raise FloatingPointError(msg)


def check_nan_inf(tag: str, x: jnp.ndarray) -> jnp.ndarray:
    """Identity unless CEIGM_DEBUG_NANCHECK=1, in which case nan/inf in
    ``x`` raises on the host. Safe inside jit."""
    if not nancheck_enabled():
        return x
    xf = x.astype(jnp.float32)
    jax.debug.callback(_report, tag, jnp.isnan(xf).any(), jnp.isinf(xf).any())
    return x


def capture(tag: str, **tensors) -> None:
    """Stash named tensors into :data:`CAPTURED` (host copies) when
    CEIGM_DEBUG_CAPTURE=1; no-op (zero compiled ops) otherwise."""
    if not capture_enabled():
        return

    def _stash(**kw):
        for k, v in kw.items():
            CAPTURED[f"{tag}.{k}"] = v
    jax.debug.callback(_stash, **tensors)
