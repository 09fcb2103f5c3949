"""MSVM-UNet model assembly (reference gm-unet/model/__init__.py:12-51).

GroupMamba encoder + EMCAD decoder on the reversed feature pyramid. The
reference's ``EMCAD22nn`` NameError (model/__init__.py:29) is resolved to
the obvious intent — binding ``best_decoder.EMCAD`` (SURVEY.md §2.4).

Public API:
    build_model(in_channels=3, num_classes=9, enc_name="gm_tiny") -> MSVMUNet

Layout: the model is channel-last internally; `__call__` accepts either
NHWC or NCHW (auto-detected only at the 1/3-channel input edge via the
``channels_last`` flag) and returns logits in the same layout.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ceigm_unet_tpu.models.groupmamba import GroupMamba, GROUPMAMBA_CONFIGS
from ceigm_unet_tpu.models.emcad import EMCAD


class MSVMUNet(nn.Module):
    num_classes: int = 9
    enc_name: str = "gm_tiny"
    drop_path_rate: float = 0.0
    scan_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32
    channels_last: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not self.channels_last:  # NCHW in -> NHWC internal
            x = jnp.transpose(x, (0, 2, 3, 1))

        # 1-channel inputs are repeated to 3 (reference model/__init__.py:36)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)

        cfg = GROUPMAMBA_CONFIGS[self.enc_name]
        enc = GroupMamba(drop_path_rate=self.drop_path_rate,
                         scan_backend=self.scan_backend, dtype=self.dtype,
                         name="encoder", **cfg)
        feats = enc(x.astype(self.dtype), train=train)

        dims = list(cfg["embed_dims"])[::-1]
        logits = EMCAD(channels=dims, num_classes=self.num_classes,
                       scan_backend=self.scan_backend, dtype=self.dtype,
                       name="decoder")(feats[::-1], train=train)

        if not self.channels_last:
            logits = jnp.transpose(logits, (0, 3, 1, 2))
        return logits


def build_model(in_channels: int = 3, num_classes: int = 9,
                enc_name: str = "gm_tiny", **kwargs: Any) -> MSVMUNet:
    """Reference-parity factory (model/__init__.py:126). ``in_channels`` is
    accepted for API parity; the model repeats 1-channel input itself."""
    del in_channels
    return MSVMUNet(num_classes=num_classes, enc_name=enc_name, **kwargs)
