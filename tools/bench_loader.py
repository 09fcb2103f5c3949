"""Input-pipeline throughput measurement (VERDICT r1 item 8).

Times the CPU side of training data flow — npz decode + imgaug-parity
augmentation + scipy zoom to 224 — on synthetic Synapse-shaped slices
(512x512), and compares samples/sec against the training-step budget
(batch 48 / step time). Run: python tools/bench_loader.py
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from ceigm_unet_tpu.data.augment import augment_seg
    from ceigm_unet_tpu.ops.resize import zoom_host

    rng = np.random.default_rng(0)
    n = 32
    tmp = tempfile.mkdtemp(prefix="loaderbench_")
    for i in range(n):
        img = rng.random((512, 512)).astype(np.float32)
        lab = rng.integers(0, 9, (512, 512)).astype(np.float32)
        np.savez(os.path.join(tmp, f"s{i}.npz"), image=img, label=lab)

    t0 = time.perf_counter()
    for i in range(n):
        with np.load(os.path.join(tmp, f"s{i}.npz")) as z:
            img, lab = z["image"], z["label"]
        img, lab = augment_seg(rng, img, lab)
        h, w = img.shape
        if (h, w) != (224, 224):
            img = zoom_host(img, (224, 224), order=3)
            lab = zoom_host(lab, (224, 224), order=0)
    dt = time.perf_counter() - t0
    per = dt / n
    print(f"cores: {os.cpu_count()}")
    print(f"decode+aug+zoom: {per*1e3:.1f} ms/sample "
          f"-> {1/per:.1f} samples/s/core")
    for step_ms, tag in ((588, "fp32 b48 measured r1"),):
        need = 48 / (step_ms / 1e3)
        print(f"step budget {tag}: needs {need:.1f} samples/s "
              f"-> {need*per:.2f} cores to saturate")


if __name__ == "__main__":
    main()
