"""Device-world fleet throughput at wide widths (96/128) on silicon —
extends the bench_loop sweep's 8-64 curve toward the device-side ceiling."""
import json
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _require_device
_require_device()

import bench_loop
from mmfn_tpu.harness.device_world import DeviceWorldPipeline

widths = [int(w) for w in (sys.argv[1] if len(sys.argv) > 1
                           else "96,128").split(",")]
agent = bench_loop._build_agent()
dw_pipe = DeviceWorldPipeline(agent.pipeline.model, agent.pipeline.variables,
                              agent.config)
for w in widths:
    r = bench_loop._fleet_mode(dw_pipe, agent.config, w, 120, pipelined=True,
                               compact_world=True)
    print(json.dumps(dict(r, fleet=w)), flush=True)
