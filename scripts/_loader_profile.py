"""Split the from-disk loader cost: unpickle vs collate vs threading (not
shipped). Uses the bench disk set under /tmp/mmfn_bench_disk."""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.collate import collate_samples, data_loader
from mmfn_tpu.data.dataset import PreprocessedDataset

cfg = GlobalConfig()
root = "/tmp/mmfn_bench_disk"
ds = PreprocessedDataset(root, use_preload=False)
n = len(ds)
print("samples:", n, "bytes/sample:",
      os.path.getsize(ds.files[0]))

t0 = time.perf_counter()
samples = [ds[i] for i in range(n)]
t_unp = time.perf_counter() - t0
print(f"unpickle: {n / t_unp:.1f} samples/s ({t_unp:.2f}s)")

t0 = time.perf_counter()
for i in range(0, n - 24, 24):
    collate_samples(samples[i:i + 24], cfg.max_lanes)
t_col = time.perf_counter() - t0
nb = (n // 24) * 24
print(f"collate: {nb / t_col:.1f} samples/s ({t_col:.2f}s)")

for threads in (1, 2, 4):
    t0 = time.perf_counter()
    seen = 0
    for b in data_loader(ds, 24, cfg.max_lanes, num_threads=threads):
        seen += b.image.shape[0]
    dt = time.perf_counter() - t0
    print(f"data_loader threads={threads}: {seen / dt:.1f} samples/s")
