"""Dataset readers honoring the reference's on-disk formats and lists/
layout (gm-unet/dataset_synapse.py, dataset_acdc.py):

- Synapse train: per-slice ``{case}_slice{N}.npz`` with keys image/label;
  test_vol: per-case ``{case}.npy.h5`` volumes (h5py), keys image/label.
- ACDC: ``.npz`` per split dir with keys img/label; train/valid resized to
  img_size, test passes raw volumes.
- Split lists: newline files under lists/lists_{Synapse,ACDC}.

Emitted samples are dicts {"image", "label", "case_name"} — image float32
(H, W) or (D, H, W), label float32 — matching the reference's tensors
before its torchvision transforms; normalization (x-0.5)/0.5 is applied by
the training pipeline, not here (same split of duties as the reference).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import numpy as np

from ceigm_unet_tpu.data.augment import augment_seg
from ceigm_unet_tpu.ops.resize import zoom_matrix  # noqa: F401 (shared cache)


def _resolve_list_dir(list_dir: str) -> str:
    """Resolve a split-list directory: as given (cwd-relative) first, then
    against the repo root, where the official splits are vendored
    (``lists/lists_{Synapse,ACDC}`` — the reference ships these manifests
    in gm-unet/lists/; they are data, and runs should work out of the
    box from any cwd)."""
    if os.path.isdir(list_dir):
        return list_dir
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # strip only an explicit "./" prefix (lstrip("./") would eat a "../"
    # parent reference or dotted leading components character-by-character
    # and silently remap an escape path onto the vendored lists)
    rel = list_dir[2:] if list_dir.startswith("./") else list_dir
    cand = os.path.normpath(os.path.join(repo_root, rel))
    if not (cand == repo_root or cand.startswith(repo_root + os.sep)):
        return list_dir
    return cand if os.path.isdir(cand) else list_dir


def _read_list(list_dir: str, split: str) -> list[str]:
    with open(os.path.join(_resolve_list_dir(list_dir),
                           split + ".txt")) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _zoom_pair(image, label, size):
    from ceigm_unet_tpu.ops.resize import zoom_host
    h, w = image.shape
    if h != size or w != size:
        image = zoom_host(image, (size, size), order=3)
        label = zoom_host(label, (size, size), order=0)
    return image, label


def make_label_pyramid(label: np.ndarray, scales) -> list:
    """Deep-supervision label pyramid (reference resize_mask /
    deep_supervision_scales, dataset_synapse.py:14-16,108-109):
    order-0 zoom of the label at each scale."""
    from ceigm_unet_tpu.ops.resize import zoom_host
    h, w = label.shape
    return [label if tuple(s) == (1, 1)
            else zoom_host(label, (round(h * s[0]), round(w * s[1])),
                           order=0)
            for s in scales]


class SynapseDataset:
    def __init__(self, base_dir: str, split: str = "train",
                 list_dir: str = "./lists/lists_Synapse",
                 img_size: int = 224, augment: bool = True,
                 seed: int = 0, deep_supervision_scales=None,
                 keep_raw_size: bool = False):
        """``keep_raw_size``: emit train slices at source resolution
        (no host zoom) — the feed for the on-device augmentation tier
        (data/device_aug.py), which augments AND resizes on device."""
        self.base_dir = base_dir
        self.split = split
        self.img_size = img_size
        self.samples = _read_list(list_dir, split)
        self.augment = augment and split == "train"
        self.rng = np.random.default_rng(seed)
        self.deep_supervision_scales = deep_supervision_scales
        self.keep_raw_size = keep_raw_size

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.get(idx)

    def get(self, idx: int, rng=None) -> Dict[str, Any]:
        """Like __getitem__, with an explicit augmentation rng — used by
        the loader to derive per-(seed, epoch, index) streams that are
        reproducible under any worker scheduling (threads or processes)."""
        rng = self.rng if rng is None else rng
        name = self.samples[idx]
        if self.split == "train":
            data = np.load(os.path.join(self.base_dir, name + ".npz"))
            image = np.asarray(data["image"], np.float32)
            label = np.asarray(data["label"], np.float32)
            if self.augment:
                image, label = augment_seg(rng, image, label)
            if not self.keep_raw_size:
                image, label = _zoom_pair(image, label, self.img_size)
        else:
            import h5py
            path = os.path.join(self.base_dir, f"{name}.npy.h5")
            with h5py.File(path, "r") as f:
                image = np.asarray(f["image"][:], np.float32)
                label = np.asarray(f["label"][:], np.float32)
        out = {"image": image, "label": label, "case_name": name}
        if self.deep_supervision_scales is not None:
            out["label_pyramid"] = make_label_pyramid(
                label, self.deep_supervision_scales)
        return out


class ACDCDataset:
    def __init__(self, base_dir: str, split: str = "train",
                 list_dir: str = "./lists/lists_ACDC",
                 img_size: int = 224, augment: bool = True,
                 seed: int = 0, deep_supervision_scales=None,
                 keep_raw_size: bool = False):
        self.base_dir = base_dir
        self.split = split
        self.img_size = img_size
        self.samples = _read_list(list_dir, split)
        self.augment = augment and split == "train"
        self.rng = np.random.default_rng(seed)
        self.deep_supervision_scales = deep_supervision_scales
        self.keep_raw_size = keep_raw_size

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.get(idx)

    def get(self, idx: int, rng=None) -> Dict[str, Any]:
        rng = self.rng if rng is None else rng
        name = self.samples[idx]
        data = np.load(os.path.join(self.base_dir, self.split, name))
        image = np.asarray(data["img"], np.float32)
        label = np.asarray(data["label"], np.float32)
        if self.split == "train" and self.augment:
            image, label = augment_seg(rng, image, label)
        if self.split in ("train", "valid") and not self.keep_raw_size:
            image, label = _zoom_pair(image, label, self.img_size)
        out = {"image": image, "label": label, "case_name": name}
        if self.deep_supervision_scales is not None:
            out["label_pyramid"] = make_label_pyramid(
                label, self.deep_supervision_scales)
        return out
