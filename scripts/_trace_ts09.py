"""Trace the TS09 expert collision (scratch)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.harness import atoms  # noqa: F401
from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from mmfn_tpu.harness.scenarios import ScenarioTrigger
from mmfn_tpu.mapping.rough_map import default_tool_path
from tests.test_harness import STRAIGHT_XODR


class TracingAgent(ExpertCollectionAgent):
    def run_step(self, input_data, timestamp):
        control = super().run_step(input_data, timestamp)
        frame, priv = input_data["privileged"]
        ego = priv["ego"]
        others = [(a.actor_id, tuple(np.round(a.position, 1)),
                   tuple(np.round(a.velocity, 1)))
                  for a in priv["actors"]]
        if others and int(frame) % 5 == 0:
            print(f"t={timestamp:6.2f} ego=({ego[0]:6.1f},{ego[1]:5.1f}) "
                  f"v={ego[3]:4.1f} brake={control.brake:.1f} "
                  f"actors={others}")
        return control


config = RouteConfig(route_id="ts09", town="TownTest",
                     trajectory=[(0.0, 1.75, 0.0), (150.0, 1.75, 0.0)],
                     index=0)
agent = TracingAgent({"rmap_tool": default_tool_path(),
                      "tmp_dir": "/tmp/ts09_map",
                      "config": GlobalConfig()})
triggers = [ScenarioTrigger(x=45.0, y=1.75, yaw=0.0,
                            scenario_type="SignalizedJunctionRightTurn")]
rec = ClosedLoopRunner(max_wall_seconds=90).run_route(
    agent, config, STRAIGHT_XODR, triggers=triggers)
print(rec.status, rec.scores, {k: len(v) for k, v in rec.infractions.items()
                               if v})
