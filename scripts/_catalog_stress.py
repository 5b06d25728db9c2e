"""Expert-vs-catalog stress matrix (scratch): run the rule-based expert
through every registered scenario type on a straight route and report
status/score/infractions per type."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: F401

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.harness import atoms  # noqa: F401  (registers atom scenarios)
from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from mmfn_tpu.harness.scenarios import SCENARIO_CLASSES, ScenarioTrigger
from mmfn_tpu.mapping.rough_map import default_tool_path
from tests.test_harness import STRAIGHT_XODR

results = {}
for stype in sorted(SCENARIO_CLASSES):
    config = RouteConfig(route_id=stype, town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (150.0, 1.75, 0.0)],
                         index=0)
    agent = ExpertCollectionAgent({"rmap_tool": default_tool_path(),
                                   "tmp_dir": f"/tmp/stress_map",
                                   "config": GlobalConfig()})
    triggers = [ScenarioTrigger(x=45.0, y=1.75, yaw=0.0,
                                scenario_type=stype)]
    runner = ClosedLoopRunner(max_wall_seconds=90)
    try:
        rec = runner.run_route(agent, config, STRAIGHT_XODR,
                               triggers=triggers)
        inf = {k: len(v) for k, v in rec.infractions.items() if v}
        results[stype] = (rec.status, rec.scores["score_composed"], inf)
    except Exception as e:  # noqa: BLE001
        results[stype] = ("EXC", 0.0, str(e)[:120])

for stype, (status, score, inf) in sorted(results.items()):
    flag = "" if score == 100.0 and status == "Completed" else "  <<<"
    print(f"{stype:38s} {status:12s} {score:6.1f} {inf}{flag}")
