"""End-to-end drive of the round-3 world-service atoms (verify scratch,
not shipped to the driver): an atom-composed scenario forces the route's
red light green, waits for it, switches the weather to rain, and jitters
the ego steering — all through the ScenarioManagerLite world services that
replay.run_route auto-wires. Asserts the route completes with no red-light
infraction and that the weather + jitter really happened."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.harness.atoms import (AddNoiseToVehicle, AtomBehavior,
                                    ChangeWeather, EgoDriveDistance, Parallel,
                                    Sequence, TrafficLightStateSetter,
                                    WaitForTrafficLightState)
from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from mmfn_tpu.harness.scenarios import SCENARIO_CLASSES, ScenarioTrigger
from mmfn_tpu.harness.traffic import SignalSet, TrafficLight
from mmfn_tpu.harness.weather import WeatherSim
from mmfn_tpu.mapping.rough_map import default_tool_path
from tests.test_harness import STRAIGHT_XODR


class ServiceAtomsScenario(AtomBehavior):
    def build_tree(self, ctx):
        return Sequence(
            TrafficLightStateSetter("green", duration=60.0),
            WaitForTrafficLightState("green"),
            ChangeWeather("HardRainNoon"),
            Parallel(AddNoiseToVehicle(0.15, duration=1.0),
                     EgoDriveDistance(20.0), policy="all"),
        )


SCENARIO_CLASSES["_ServiceAtoms"] = ServiceAtomsScenario

config = RouteConfig(route_id="0", town="TownTest",
                     trajectory=[(0.0, 1.75, 0.0), (120.0, 1.75, 0.0)],
                     index=0)
agent = ExpertCollectionAgent({"rmap_tool": default_tool_path(),
                               "tmp_dir": "/tmp/verify_atoms_map",
                               "config": GlobalConfig()})
# a light mid-route, phase offset parked deep in red: without the scenario's
# TrafficLightStateSetter the expert would sit at it for ~10 s
signals = SignalSet(lights=[TrafficLight(position=np.array([60.0, 1.75]),
                                         yaw=0.0, offset=13.0, red=10.0,
                                         light_id=1)])
weather_sim = WeatherSim(preset="ClearNoon", animation=False)
triggers = [ScenarioTrigger(x=45.0, y=1.75, yaw=0.0,
                            scenario_type="_ServiceAtoms")]

runner = ClosedLoopRunner(max_wall_seconds=120)
record = runner.run_route(agent, config, STRAIGHT_XODR, triggers=triggers,
                          signals=signals, weather_sim=weather_sim)

print("status:", record.status)
print("scores:", record.scores)
print("weather preset now:", weather_sim.preset)
print("light forced_state:", signals.lights[0].forced_state)
assert record.status == "Completed", record.to_dict()
assert record.infractions["red_light"] == [], record.infractions["red_light"]
assert weather_sim.preset == "HardRainNoon"      # ChangeWeather landed
assert signals.lights[0].forced_state == "green"  # setter landed
print("OK: world-service atoms drove the closed loop end-to-end")
