"""Device-world fleet throughput for the IMG variant (VERDICT r4 #5): the
map/camera raster synthesized on device from the birdview canvas tables.
Usage: python scripts/_dw_img_probe.py [widths]"""
import json
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _require_device
_require_device()

import numpy as np
import jax
import bench_loop
from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.harness.device_world import DeviceWorldPipeline
from mmfn_tpu.models import build_model

widths = [int(w) for w in (sys.argv[1] if len(sys.argv) > 1
                           else "64,128").split(",")]
cfg = GlobalConfig()
model = build_model(cfg, "img")
batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
variables = jax.jit(model.init, static_argnums=(2,))(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    batch, False)
dw_pipe = DeviceWorldPipeline(model, variables, cfg)

# bench_loop._fleet_mode builds 'rad'-variant agents; wrap it for img
import bench_loop as bl
_orig = bl.MMFNAgent


class _ImgAgent(_orig):
    def setup(self, conf):
        super().setup(dict(conf, variant="img"))


bl.MMFNAgent = _ImgAgent
for w in widths:
    r = bench_loop._fleet_mode(dw_pipe, cfg, w, 120, pipelined=True,
                               compact_world=True)
    print(json.dumps(dict(r, fleet=w, variant="img")), flush=True)
