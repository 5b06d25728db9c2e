"""End-to-end drive of the lane-topology atoms on the signalized cross town
(verify scratch, not shipped to the driver): the expert drives the left-turn
route; a scenario tree gated on InTriggerDistanceToNextIntersection flips
the weather to rain as the ego nears the junction, WaitEndIntersection
holds through the crossing, then a second flip marks the exit; a parallel
AtRightmostLane probe confirms the single-lane roads read as rightmost.
Asserts the markers landed in order and the route still completes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.harness.atoms import (AtomBehavior, AtRightmostLane,
                                    ChangeWeather,
                                    InTriggerDistanceToNextIntersection,
                                    Sequence, EGO)
from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig, parse_routes_file
from mmfn_tpu.harness.scenarios import SCENARIO_CLASSES, ScenarioTrigger
from mmfn_tpu.harness.weather import WeatherSim
from mmfn_tpu.mapping.rough_map import RoughMap, build_rmap, default_tool_path
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
XODR = open(os.path.join(ROOT, "data", "maps", "fake_town_cross.xodr")).read()

# vectorize the cross map so the atoms have topology to query
d = tempfile.mkdtemp()
with open(os.path.join(d, "opstr.txt"), "w") as f:
    f.write(XODR)
build_rmap([d])
rm = RoughMap().read(os.path.join(d, "a.rmap"))
n_flagged = sum(int((l.nodes[:, 2] > 0.5).sum()) for l in rm.lanes)
print("lanes:", len(rm.lanes), "junction-flagged nodes:", n_flagged)
assert n_flagged > 0

events = []


class _Probe(AtomBehavior):
    def build_tree(self, ctx):
        class Mark(ChangeWeather):
            def tick(inner, c, dt):
                events.append((inner.preset, tuple(np.round(c.ego_xy, 1))))
                return super(Mark, inner).tick(c, dt)

        from mmfn_tpu.harness.atoms import WaitEndIntersection
        return Sequence(
            AtRightmostLane(EGO),                 # single-lane road: holds
            InTriggerDistanceToNextIntersection(EGO, distance=25.0),
            Mark("HardRainNoon"),
            WaitEndIntersection(EGO),
            Mark("ClearSunset"),
        )


SCENARIO_CLASSES["_TopologyProbe"] = _Probe

routes = parse_routes_file(os.path.join(ROOT, "data", "routes",
                                        "cross_left_turn.xml"))
config = routes[0]
agent = ExpertCollectionAgent({"rmap_tool": default_tool_path(),
                               "tmp_dir": "/tmp/verify_topo_map",
                               "config": GlobalConfig()})
weather_sim = WeatherSim(preset="ClearNoon", animation=False)
triggers = [ScenarioTrigger(x=-80.0, y=1.75, yaw=0.0,
                            scenario_type="_TopologyProbe")]
runner = ClosedLoopRunner(max_wall_seconds=180)
record = runner.run_route(agent, config, XODR, triggers=triggers,
                          rough_map=rm, weather_sim=weather_sim)
print("status:", record.status, "| events:", events)
assert record.status == "Completed", record.to_dict()
assert [e[0] for e in events] == ["HardRainNoon", "ClearSunset"], events
rain_x = events[0][1][0]
exit_pos = np.array(events[1][1])
# rain marker fired once within 25 m (arclength) of the junction edge
# (x=-10), not at route start
assert -40.0 < rain_x < -9.0, events
# exit marker fired after the junction (past the turn, heading south)
assert exit_pos[1] < -9.0, events
assert weather_sim.preset == "ClearSunset"
print("OK: topology atoms gated on the vectorized junction end-to-end")
