import numpy as np, jax
import bench as B
from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.models import build_model
cfg = GlobalConfig()
model = build_model(cfg, "rad")
for bs in (24,):
    s = B.timed_train(model, cfg, bs, iters=10)
    print(f"train batch {bs}: {s*1e3:.1f} ms/step -> {bs/s:.1f} samples/s")
