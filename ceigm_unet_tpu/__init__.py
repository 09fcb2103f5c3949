"""CEIGM-UNet TPU — a TPU-native (JAX / XLA / Pallas / pjit) rebuild of the
Chinaholmesfans/CEIGM-UNet medical-image segmentation framework.

Capability parity target: the GroupMamba-encoder + EMCAD-decoder MSVM-UNet
(reference: gm-unet/model/__init__.py:12-51) trained/evaluated on Synapse
multi-organ CT (9 classes) and ACDC cardiac MRI (4 classes), rebuilt
TPU-first:

- selective scan  -> Pallas chunked kernel + ``jax.lax.associative_scan``
  (reference: CUDA exts under gm-unet/kernels/selective_scan/)
- cross-scan layouts -> pure XLA transpose/flip ops
  (reference: gm-unet/model/gm/csms6s.py, model/vmamba/csm_triton.py)
- data parallelism -> ``jax.sharding.Mesh`` + ``shard_map`` collectives
  (reference capability: Lightning devices="auto" / NCCL DDP)
"""

__version__ = "0.1.0"
