"""Batch loader (replacement for torch DataLoader workers).

The reference uses torch DataLoader with 6 worker processes for CPU-side
imgaug (SURVEY.md §3.1 process boundaries). Here worker processes map
sample loading + augmentation across cores (falling back to a thread pool
on single-core hosts or when the dataset cannot be shipped to workers —
e.g. open h5 handles); the main process assembles batches as numpy dicts
{"image": (B, H, W, 1) float32, "label": (B, H, W) int32} ready for
device_put.

Augmentation randomness is derived per (seed, epoch, index) via
SeedSequence inside the worker task, so runs are bit-reproducible under
ANY worker scheduling — threads, processes, or in-line (a determinism
improvement over the reference's per-worker RNG state).

Measured (tools/bench_loader.py, 512^2 Synapse-shaped slices): decode +
full aug policy + order-3 zoom = ~17 ms/sample/core with the native
warp/resize tier (ceigm_unet_tpu/native, default when g++ is present;
~55 ms/sample pure numpy/scipy) — ~1.4 cores saturate the r1 fp32 b48
train step. On very-few-core hosts route training through the on-device
augmentation tier instead: ``TrainConfig.device_aug=True`` (CLI
``--device-aug``) ships RAW slices and runs data/device_aug.py INSIDE the
sharded train step (train/trainstep.py), with ``normalize=False`` here.
"""
from __future__ import annotations

import concurrent.futures as cf
import multiprocessing
import os
from typing import Any, Dict, Iterator, Optional

import numpy as np

_WORKER_DS = None


def _worker_init(ds):
    global _WORKER_DS
    _WORKER_DS = ds


def _worker_get(task):
    idx, seed, epoch = task
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, idx]))
    return _WORKER_DS.get(idx, rng)


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
        self.epoch = 0
        self._pool = None
        self.mode = "inline"
        if num_workers > 0:
            if (os.cpu_count() or 1) > 1:
                try:
                    # spawn: forking after JAX/PJRT init can deadlock
                    # multithreaded parents; workers must start clean.
                    self._pool = cf.ProcessPoolExecutor(
                        num_workers, initializer=_worker_init,
                        initargs=(dataset,),
                        mp_context=multiprocessing.get_context("spawn"))
                    self.mode = "process"
                except Exception:
                    self._pool = None
            if self._pool is None:
                self._pool = cf.ThreadPoolExecutor(num_workers)
                self.mode = "thread"

    def __len__(self):
        n = len(self.ds)
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _get_inline(self, task):
        idx, seed, epoch = task
        rng = np.random.default_rng(
            np.random.SeedSequence([seed, epoch, idx]))
        return self.ds.get(idx, rng)

    def _fetch(self, tasks):
        if self.mode == "process":
            try:
                return list(self._pool.map(_worker_get, tasks))
            except Exception:
                # dataset not shippable to workers (pickling) — demote
                self._pool.shutdown(wait=False, cancel_futures=True)
                self._pool = cf.ThreadPoolExecutor(self.num_workers)
                self.mode = "thread"
        if self.mode == "thread":
            return list(self._pool.map(self._get_inline, tasks))
        return [self._get_inline(t) for t in tasks]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        limit = (n // self.batch_size * self.batch_size
                 if self.drop_last else n)
        for start in range(0, limit, self.batch_size):
            idxs = order[start:start + self.batch_size]
            tasks = [(int(i), self.seed, self.epoch) for i in idxs]
            batch = _collate(self._fetch(tasks))
            if self.normalize:
                batch["image"] = (batch["image"] - 0.5) / 0.5
            yield batch
