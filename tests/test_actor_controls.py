"""Actor controllers (srunner actorcontrols parity) + OpenSCENARIO wiring."""

import math

import numpy as np
import pytest

from mmfn_tpu.harness.actor_controls import (
    NpcVehicleControl, Obstacle, PedestrianControl, SimpleVehicleControl,
    VehicleLongitudinalControl, make_controller)
from mmfn_tpu.harness.openscenario import OpenScenarioManager, parse_xosc

DT = 0.05


def _run(ctrl, position, yaw, speed, steps, obstacles=()):
    position = np.asarray(position, dtype=np.float64)
    for _ in range(steps):
        out = ctrl.run_step(position, yaw, speed, DT, obstacles)
        if out is None:
            break
        vel, yaw = out
        position = position + vel * DT
        speed = float(np.linalg.norm(vel))
    return position, yaw, speed


# --------------------------------------------------------------------------- #
# unit: controller classes
# --------------------------------------------------------------------------- #

def test_simple_vehicle_follows_waypoints_and_stops_at_goal():
    ctrl = SimpleVehicleControl()
    ctrl.update_target_speed(10.0)
    ctrl.update_waypoints([(30.0, 0.0), (30.0, 20.0)])
    pos, yaw, speed = _run(ctrl, (0.0, 0.0), 0.0, 0.0, steps=200)
    assert ctrl.reached_goal
    assert np.linalg.norm(pos - np.array([30.0, 20.0])) < SimpleVehicleControl.REACH + 1.0
    assert speed == 0.0                       # reached goal -> stop
    # the second leg turned the actor to +y
    assert abs(yaw - math.pi / 2) < 0.3


def test_simple_vehicle_without_waypoints_keeps_heading():
    ctrl = SimpleVehicleControl()
    ctrl.update_target_speed(8.0)
    pos, yaw, speed = _run(ctrl, (0.0, 0.0), math.pi / 2, 0.0, steps=40)
    assert speed == pytest.approx(8.0)
    assert pos[0] == pytest.approx(0.0, abs=1e-9)
    assert pos[1] == pytest.approx(8.0 * 40 * DT, rel=1e-6)


def test_simple_vehicle_brakes_for_slow_obstacle_ahead():
    ctrl = SimpleVehicleControl(
        {"consider_obstacles": "true", "proximity_threshold": "20"})
    ctrl.update_target_speed(10.0)
    blocker = Obstacle((12.0, 0.0), (0.0, 0.0))
    speeds = []
    speed = 10.0
    for _ in range(20):
        vel, _ = ctrl.run_step(np.zeros(2), 0.0, speed, DT, [blocker])
        speed = float(np.linalg.norm(vel))
        speeds.append(speed)
    # closing-speed braking law engaged: monotone deceleration
    assert speeds[0] < 10.0
    assert speeds[-1] < speeds[0]


def test_simple_vehicle_ignores_lateral_and_rear_obstacles():
    ctrl = SimpleVehicleControl(
        {"consider_obstacles": "true", "proximity_threshold": "20"})
    ctrl.update_target_speed(10.0)
    rear = Obstacle((-5.0, 0.0), (0.0, 0.0))
    lateral = Obstacle((10.0, 6.0), (0.0, 0.0))
    vel, _ = ctrl.run_step(np.zeros(2), 0.0, 10.0, DT, [rear, lateral])
    assert float(np.linalg.norm(vel)) == pytest.approx(10.0)


def test_npc_vehicle_rate_limits_acceleration():
    ctrl = NpcVehicleControl()
    ctrl.update_target_speed(10.0)
    vel, _ = ctrl.run_step(np.zeros(2), 0.0, 0.0, DT)
    assert float(np.linalg.norm(vel)) <= NpcVehicleControl.ACCEL * DT + 1e-9
    # converges to the target eventually
    _, _, speed = _run(ctrl, (0.0, 0.0), 0.0, 0.0, steps=200)
    assert speed == pytest.approx(10.0, rel=1e-3)


def test_longitudinal_control_bang_bang_and_fixed_heading():
    ctrl = VehicleLongitudinalControl()
    ctrl.update_target_speed(6.0)
    pos, yaw, speed = _run(ctrl, (0.0, 0.0), 1.0, 0.0, steps=100)
    assert speed == pytest.approx(6.0)
    assert yaw == 1.0                          # steering never touched
    # above target: coasts down at engine drag
    ctrl.update_target_speed(2.0)
    vel, _ = ctrl.run_step(np.zeros(2), 1.0, 6.0, DT)
    assert float(np.linalg.norm(vel)) == pytest.approx(
        6.0 - VehicleLongitudinalControl.DRAG_DECEL * DT)


def test_pedestrian_control_walks_waypoints():
    ctrl = PedestrianControl()
    ctrl.update_target_speed(1.5)
    ctrl.update_waypoints([(5.0, 0.0), (5.0, 5.0)])
    pos, _, _ = _run(ctrl, (0.0, 0.0), 0.0, 0.0, steps=300)
    assert ctrl.reached_goal
    assert np.linalg.norm(pos - np.array([5.0, 5.0])) < PedestrianControl.REACH + 0.5


def test_unknown_controller_module_raises():
    with pytest.raises(ValueError, match="unknown controller module"):
        make_controller("does_not_exist")


# --------------------------------------------------------------------------- #
# OpenSCENARIO wiring
# --------------------------------------------------------------------------- #

_HEADER = """<?xml version="1.0" encoding="UTF-8"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="2026-01-01T00:00:00"
              description="controller-test" author=""/>
  <CatalogLocations>{catalogs}</CatalogLocations>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="adversary">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car">
        <Properties><Property name="type" value="simulation"/></Properties>
      </Vehicle>
    </ScenarioObject>
  </Entities>
"""

_CONTROLLER_XOSC = _HEADER.format(catalogs="") + """
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="adversary">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="0" y="0" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
          <PrivateAction>
            <ControllerAction>
              <AssignControllerAction>
                <Controller name="AdversaryAgent">
                  <Properties>
                    <Property name="module" value="{module}"/>
                    <Property name="an_unused_property" value="whatever"/>
                  </Properties>
                </Controller>
              </AssignControllerAction>
              <OverrideControllerValueAction>
                <Throttle value="0" active="false"/>
                <Brake value="0" active="{override_active}"/>
              </OverrideControllerValueAction>
            </ControllerAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s">
      <Act name="a">
        <ManeuverGroup name="g" maximumExecutionCount="1">
          <Actors selectTriggeringEntities="false">
            <EntityRef entityRef="adversary"/>
          </Actors>
          <Maneuver name="m">
            <Event name="Drive" priority="overwrite">
              <Action name="Speed">
                <PrivateAction>
                  <LongitudinalAction>
                    <SpeedAction>
                      <SpeedActionDynamics dynamicsShape="step" value="0"
                                           dynamicsDimension="time"/>
                      <SpeedActionTarget>
                        <AbsoluteTargetSpeed value="5"/>
                      </SpeedActionTarget>
                    </SpeedAction>
                  </LongitudinalAction>
                </PrivateAction>
              </Action>
              <Action name="Route">
                <PrivateAction>
                  <RoutingAction>
                    <AssignRouteAction>
                      <Route name="r" closed="false">
                        <Waypoint routeStrategy="shortest">
                          <Position><WorldPosition x="40" y="0" z="0" h="0"/></Position>
                        </Waypoint>
                        <Waypoint routeStrategy="shortest">
                          <Position><WorldPosition x="40" y="30" z="0" h="0"/></Position>
                        </Waypoint>
                      </Route>
                    </AssignRouteAction>
                  </RoutingAction>
                </PrivateAction>
              </Action>
              <StartTrigger/>
            </Event>
          </Maneuver>
        </ManeuverGroup>
      </Act>
    </Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


def _write(tmp_path, text, name="scene.xosc"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def _tick_many(mgr, n, ego=(1000.0, 1000.0)):
    actors = []
    for _ in range(n):
        actors = mgr.tick(np.asarray(ego), DT)
    return actors


def test_xosc_controller_assignment_and_route(tmp_path):
    path = _write(tmp_path, _CONTROLLER_XOSC.format(
        module="npc_vehicle_control", override_active="false"))
    cfg = parse_xosc(path)
    spec = cfg.entities["adversary"]
    assert [a.kind for a in spec.init_actions] == ["controller"]
    assert spec.init_actions[0].module == "npc_vehicle_control"
    assert spec.init_actions[0].ctrl_args == {"an_unused_property": "whatever"}

    mgr = OpenScenarioManager(cfg)
    scripted = mgr.scripted["adversary"]
    assert isinstance(scripted.controller, NpcVehicleControl)
    _tick_many(mgr, 600)
    # followed the L-shaped route to its end and stopped there
    assert scripted.controller.reached_goal
    assert np.linalg.norm(
        scripted.actor.position - np.array([40.0, 30.0])) < 6.0
    assert float(np.linalg.norm(scripted.actor.velocity)) == 0.0


def test_xosc_external_control_leaves_default_motion(tmp_path):
    path = _write(tmp_path, _CONTROLLER_XOSC.format(
        module="external_control", override_active="false"))
    mgr = OpenScenarioManager(parse_xosc(path))
    scripted = mgr.scripted["adversary"]
    _tick_many(mgr, 100)
    # ExternalControl never steers: the default scripted motion drives the
    # actor straight along its init heading at the story speed, ignoring
    # the route assignment
    assert scripted.actor.position[1] == pytest.approx(0.0, abs=1e-6)
    assert scripted.actor.position[0] > 20.0


def test_xosc_active_controller_override_preempts_controller(tmp_path):
    """An active override riding on an AssignControllerAction (EXTENSION —
    the reference raises here, openscenario_parser.py:371-374) preempts the
    controller: with an active zero-value brake pedal the assigned route
    and story speed never move the actor."""
    path = _write(tmp_path, _CONTROLLER_XOSC.format(
        module="npc_vehicle_control", override_active="true"))
    cfg = parse_xosc(path)
    action = cfg.entities["adversary"].init_actions[0]
    assert action.kind == "controller"
    assert action.overrides == {"throttle": None, "brake": 0.0}
    mgr = OpenScenarioManager(cfg)
    scripted = mgr.scripted["adversary"]
    assert isinstance(scripted.controller, NpcVehicleControl)
    _tick_many(mgr, 100)
    assert float(np.linalg.norm(scripted.actor.position)) < 1e-9


def test_xosc_follow_trajectory_without_trajectory_raises(tmp_path):
    """FollowTrajectoryAction is now implemented (an extension beyond the
    reference, which raises NotImplementedError — openscenario_parser.py:
    1043-1044; full coverage in test_openscenario.py); a bare action with
    no Trajectory source is still a hard parse error."""
    xosc = _HEADER.format(catalogs="") + """
  <Storyboard>
    <Init/>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="adversary"/>
        </Actors>
        <Maneuver name="m"><Event name="e" priority="overwrite">
          <Action name="t"><PrivateAction>
            <RoutingAction><FollowTrajectoryAction/></RoutingAction>
          </PrivateAction></Action>
          <StartTrigger/>
        </Event></Maneuver>
      </ManeuverGroup>
    </Act></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""
    with pytest.raises(ValueError, match="FollowTrajectoryAction without"):
        parse_xosc(_write(tmp_path, xosc))


def test_xosc_activate_controller_toggles_autopilot(tmp_path):
    xosc = _HEADER.format(catalogs="") + """
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="adversary">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="0" y="0" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
          <PrivateAction>
            <LongitudinalAction>
              <SpeedAction>
                <SpeedActionDynamics dynamicsShape="step" value="0"
                                     dynamicsDimension="time"/>
                <SpeedActionTarget><AbsoluteTargetSpeed value="6"/></SpeedActionTarget>
              </SpeedAction>
            </LongitudinalAction>
          </PrivateAction>
          <PrivateAction>
            <ControllerAction>
              <AssignControllerAction>
                <Controller name="c"><Properties>
                  <Property name="module" value="simple_vehicle_control"/>
                </Properties></Controller>
              </AssignControllerAction>
            </ControllerAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="adversary"/>
        </Actors>
        <Maneuver name="m"><Event name="Off" priority="overwrite">
          <Action name="off"><PrivateAction>
            <ActivateControllerAction longitudinal="false" lateral="false"/>
          </PrivateAction></Action>
          <StartTrigger><ConditionGroup>
            <Condition name="t" delay="0" conditionEdge="rising">
              <ByValueCondition>
                <SimulationTimeCondition value="2" rule="greaterThan"/>
              </ByValueCondition>
            </Condition>
          </ConditionGroup></StartTrigger>
        </Event></Maneuver>
      </ManeuverGroup>
    </Act></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""
    mgr = OpenScenarioManager(parse_xosc(_write(tmp_path, xosc)))
    scripted = mgr.scripted["adversary"]
    _tick_many(mgr, 30)                         # t = 1.5 s: still driving
    assert float(np.linalg.norm(scripted.actor.velocity)) > 5.0
    _tick_many(mgr, 30)                         # t = 3 s: autopilot off
    assert scripted.controller is None
    assert float(np.linalg.norm(scripted.actor.velocity)) == 0.0


_ROUTE_CATALOG = """<?xml version="1.0"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="d" description="cat" author=""/>
  <Catalog name="RouteCatalog">
    <Route name="lap" closed="false">
      <Waypoint routeStrategy="shortest">
        <Position><WorldPosition x="10" y="0" z="0" h="0"/></Position>
      </Waypoint>
      <Waypoint routeStrategy="shortest">
        <Position><WorldPosition x="10" y="10" z="0" h="0"/></Position>
      </Waypoint>
    </Route>
  </Catalog>
  <Catalog name="ControllerCatalog">
    <Controller name="walker_brain">
      <Properties>
        <Property name="module" value="pedestrian_control"/>
      </Properties>
    </Controller>
  </Catalog>
</OpenSCENARIO>
"""


def test_xosc_route_and_controller_from_catalog(tmp_path):
    catdir = tmp_path / "catalogs"
    catdir.mkdir()
    (catdir / "routes.xosc").write_text(_ROUTE_CATALOG)
    xosc = _HEADER.format(catalogs="""
    <RouteCatalog><Directory path="catalogs"/></RouteCatalog>
    <ControllerCatalog><Directory path="catalogs"/></ControllerCatalog>
""") + """
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="adversary">
          <PrivateAction>
            <ControllerAction>
              <AssignControllerAction>
                <CatalogReference catalogName="ControllerCatalog"
                                  entryName="walker_brain"/>
              </AssignControllerAction>
            </ControllerAction>
          </PrivateAction>
          <PrivateAction>
            <LongitudinalAction>
              <SpeedAction>
                <SpeedActionDynamics dynamicsShape="step" value="0"
                                     dynamicsDimension="time"/>
                <SpeedActionTarget><AbsoluteTargetSpeed value="2"/></SpeedActionTarget>
              </SpeedAction>
            </LongitudinalAction>
          </PrivateAction>
          <PrivateAction>
            <RoutingAction>
              <AssignRouteAction>
                <CatalogReference catalogName="RouteCatalog" entryName="lap"/>
              </AssignRouteAction>
            </RoutingAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a"/></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""
    cfg = parse_xosc(_write(tmp_path, xosc))
    kinds = [a.kind for a in cfg.entities["adversary"].init_actions]
    assert kinds == ["controller", "route"]
    assert cfg.entities["adversary"].init_actions[0].module == \
        "pedestrian_control"
    assert cfg.entities["adversary"].init_actions[1].waypoints == \
        ((10.0, 0.0), (10.0, 10.0))

    mgr = OpenScenarioManager(cfg)
    scripted = mgr.scripted["adversary"]
    assert isinstance(scripted.controller, PedestrianControl)
    _tick_many(mgr, 400)
    assert scripted.controller.reached_goal
    assert np.linalg.norm(
        scripted.actor.position - np.array([10.0, 10.0])) < 2.0


# --------------------------------------------------------------------------- #
# bumper-gap obstacle ranging
# --------------------------------------------------------------------------- #

def test_simple_vehicle_stops_before_touching_obstacle():
    """The obstacle range is bumper-to-bumper (simple_vehicle_control.py:100),
    so the braking law parks the bodies apart, never overlapping."""
    ctrl = SimpleVehicleControl(
        {"consider_obstacles": "true", "proximity_threshold": "20"})
    ctrl.update_target_speed(10.0)
    blocker = Obstacle((15.0, 0.0), (0.0, 0.0))     # default extent 2.2
    pos, _, speed = _run(ctrl, (0.0, 0.0), 0.0, 10.0, steps=300,
                         obstacles=[blocker])
    assert speed == 0.0
    # parked at/behind the bumper-contact point 15 - 2.2 - 2.2 = 10.6,
    # give one tick of travel (10 m/s * 0.05 s) of slack
    assert pos[0] <= 10.6 + 10.0 * DT + 1e-6


def test_obstacle_extent_widens_the_braking_envelope():
    ctrl = SimpleVehicleControl(
        {"consider_obstacles": "true", "proximity_threshold": "20"})
    ctrl.update_target_speed(10.0)
    # gap to a bus-sized obstacle (25 - 2.2 - 5 = 17.8 m) is inside the
    # threshold; the same center with a bollard extent (22.3 m) is not
    bus = Obstacle((25.0, 0.0), (0.0, 0.0), extent=5.0)
    vel, _ = ctrl.run_step(np.zeros(2), 0.0, 10.0, DT, [bus])
    assert float(np.linalg.norm(vel)) < 10.0
    bollard = Obstacle((25.0, 0.0), (0.0, 0.0), extent=0.5)
    vel, _ = ctrl.run_step(np.zeros(2), 0.0, 10.0, DT, [bollard])
    assert float(np.linalg.norm(vel)) == pytest.approx(10.0)


# --------------------------------------------------------------------------- #
# parser: override-only / OSC 1.1 nesting / unsupported private actions
# --------------------------------------------------------------------------- #

def _story_event_xosc(event_actions: str) -> str:
    return _HEADER.format(catalogs="") + f"""
  <Storyboard>
    <Init/>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="adversary"/>
        </Actors>
        <Maneuver name="m"><Event name="e" priority="overwrite">
          {event_actions}
          <StartTrigger/>
        </Event></Maneuver>
      </ManeuverGroup>
    </Act></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


_OVERRIDE_XOSC = _HEADER.format(catalogs="") + """
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="adversary">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="0" y="0" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
          <PrivateAction>
            <LongitudinalAction><SpeedAction>
              <SpeedActionDynamics dynamicsShape="step"/>
              <SpeedActionTarget><AbsoluteTargetSpeed value="8"/></SpeedActionTarget>
            </SpeedAction></LongitudinalAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="adversary"/>
        </Actors>
        <Maneuver name="m">
          <Event name="slam" priority="overwrite">
            <Action name="slam"><PrivateAction>
              <ControllerAction>
                <OverrideControllerValueAction>
                  <Throttle value="0" active="false"/>
                  <Brake value="1" active="true"/>
                  <Clutch value="0" active="false"/>
                  <ParkingBrake value="0" active="false"/>
                  <SteeringWheel value="0" active="false"/>
                  <Gear number="0" active="false"/>
                </OverrideControllerValueAction>
              </ControllerAction>
            </PrivateAction></Action>
            <StartTrigger><ConditionGroup>
              <Condition name="t1" delay="0" conditionEdge="rising">
                <ByValueCondition>
                  <SimulationTimeCondition value="1" rule="greaterThan"/>
                </ByValueCondition>
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
          <Event name="release" priority="overwrite">
            <Action name="release"><PrivateAction>
              <ControllerAction>
                <OverrideControllerValueAction>
                  <Brake value="0" active="false"/>
                </OverrideControllerValueAction>
              </ControllerAction>
            </PrivateAction></Action>
            <StartTrigger><ConditionGroup>
              <Condition name="t2" delay="0" conditionEdge="rising">
                <ByValueCondition>
                  <SimulationTimeCondition value="4" rule="greaterThan"/>
                </ByValueCondition>
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
        </Maneuver>
      </ManeuverGroup>
    </Act></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


def test_xosc_override_brake_and_release(tmp_path):
    """OverrideControllerValueAction (EXTENSION — the reference raises on
    any active override, openscenario_parser.py:371-374): a full brake
    override preempts the story speed (8 m/s -> 0 at 8 m/s^2), and an
    ``active="false"`` override releases it so the story target resumes."""
    cfg = parse_xosc(_write(tmp_path, _OVERRIDE_XOSC))
    slam = cfg.events[0].actions[0]
    assert slam.kind == "override"
    assert slam.overrides == {"throttle": None, "brake": 1.0,
                              "parkingbrake": None, "steeringwheel": None}
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, -50.0])
    for _ in range(18):                         # t = 0.9: cruising at 8
        actors = mgr.tick(ego, DT)
    assert abs(np.linalg.norm(actors[0].velocity) - 8.0) < 1e-6
    for _ in range(42):                         # t = 3.0: braked ~2 s at 8
        actors = mgr.tick(ego, DT)
    assert np.linalg.norm(actors[0].velocity) == 0.0
    x_stopped = actors[0].position[0]
    for _ in range(60):                         # t = 6.0: released at t=4
        actors = mgr.tick(ego, DT)
    assert abs(np.linalg.norm(actors[0].velocity) - 8.0) < 1e-6
    assert actors[0].position[0] > x_stopped + 5.0


def test_xosc_override_throttle_steering_curves(tmp_path):
    """Throttle + SteeringWheel overrides drive the bicycle model: the
    actor accelerates from rest and carves a curve (yaw grows with
    traveled distance / 2.9 m wheelbase * tan(steer))."""
    xosc = _OVERRIDE_XOSC.replace(
        '<AbsoluteTargetSpeed value="8"/>', '<AbsoluteTargetSpeed value="0"/>'
    ).replace(
        '<Throttle value="0" active="false"/>',
        '<Throttle value="0.5" active="true"/>'
    ).replace(
        '<Brake value="1" active="true"/>', '<Brake value="0" active="false"/>'
    ).replace(
        '<SteeringWheel value="0" active="false"/>',
        '<SteeringWheel value="0.2" active="true"/>')
    cfg = parse_xosc(_write(tmp_path, xosc))
    assert cfg.events[0].actions[0].overrides["throttle"] == 0.5
    assert cfg.events[0].actions[0].overrides["steeringwheel"] == 0.2
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, -50.0])
    for _ in range(60):                         # t = 3.0 (fires at t=1)
        actors = mgr.tick(ego, DT)
    a = actors[0]
    speed = float(np.linalg.norm(a.velocity))
    assert abs(speed - 0.5 * 4.0 * 2.0) < 0.2   # ~2 s at 2 m/s^2
    assert a.yaw > 0.2                          # turned left
    assert a.position[1] > 0.5                  # curved off the +x axis


def test_xosc_osc11_activate_nested_in_controller_action(tmp_path):
    """OSC 1.1 nests ActivateControllerAction under ControllerAction; it
    must parse to the same activate action as the 1.0 direct form."""
    xosc = _story_event_xosc("""
          <Action name="off"><PrivateAction>
            <ControllerAction>
              <ActivateControllerAction longitudinal="false" lateral="false"/>
            </ControllerAction>
          </PrivateAction></Action>""")
    cfg = parse_xosc(_write(tmp_path, xosc))
    acts = cfg.events[0].actions
    assert [a.kind for a in acts] == ["activate"]
    assert acts[0].active is False


def test_xosc_visibility_action(tmp_path):
    """VisibilityAction (extension — the reference raises,
    openscenario_parser.py:1021-1022) parses its three flags and flips the
    actor's visibility state when the event fires; defaults restore to
    fully visible."""
    xosc = _story_event_xosc("""
          <Action name="hide"><PrivateAction>
            <VisibilityAction graphics="false" traffic="true" sensors="false"/>
          </PrivateAction></Action>""")
    cfg = parse_xosc(_write(tmp_path, xosc))
    action = cfg.events[0].actions[0]
    assert action.kind == "visibility"
    assert action.visibility == (False, True, False)

    mgr = OpenScenarioManager(cfg)
    actors = mgr.tick(np.array([0.0, 0.0]), DT)  # empty StartTrigger -> fires
    adversary = actors[0]
    assert adversary.visible_graphics is False
    assert adversary.visible_sensors is False
    assert adversary.visible_traffic is True


def test_xosc_synchronize_without_targets_raises(tmp_path):
    """SynchronizeAction is now implemented (extension beyond the reference,
    which raises NotImplementedError — openscenario_parser.py:1023-1024;
    runtime coverage in test_openscenario.py), but it still needs both
    target positions."""
    xosc = _story_event_xosc("""
          <Action name="x"><PrivateAction>
            <SynchronizeAction masterEntityRef="hero"/>
          </PrivateAction></Action>""")
    with pytest.raises(ValueError, match="TargetPositionMaster"):
        parse_xosc(_write(tmp_path, xosc))


# --------------------------------------------------------------------------- #
# runtime: autopilot resume + lane-change over a controller
# --------------------------------------------------------------------------- #

def _two_stage_activate_xosc() -> str:
    return _HEADER.format(catalogs="") + """
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="adversary">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="0" y="0" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
          <PrivateAction>
            <LongitudinalAction>
              <SpeedAction>
                <SpeedActionDynamics dynamicsShape="step" value="0"
                                     dynamicsDimension="time"/>
                <SpeedActionTarget><AbsoluteTargetSpeed value="6"/></SpeedActionTarget>
              </SpeedAction>
            </LongitudinalAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="adversary"/>
        </Actors>
        <Maneuver name="m">
          <Event name="Off" priority="overwrite">
            <Action name="off"><PrivateAction>
              <ActivateControllerAction longitudinal="false" lateral="false"/>
            </PrivateAction></Action>
            <StartTrigger><ConditionGroup>
              <Condition name="t1" delay="0" conditionEdge="rising">
                <ByValueCondition>
                  <SimulationTimeCondition value="1" rule="greaterThan"/>
                </ByValueCondition>
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
          <Event name="On" priority="overwrite">
            <Action name="on"><PrivateAction>
              <ActivateControllerAction longitudinal="true" lateral="true"/>
            </PrivateAction></Action>
            <StartTrigger><ConditionGroup>
              <Condition name="t2" delay="0" conditionEdge="rising">
                <ByValueCondition>
                  <SimulationTimeCondition value="2" rule="greaterThan"/>
                </ByValueCondition>
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
        </Maneuver>
      </ManeuverGroup>
    </Act></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


def test_xosc_autopilot_reenable_resumes_story_speed(tmp_path):
    mgr = OpenScenarioManager(parse_xosc(_write(
        tmp_path, _two_stage_activate_xosc())))
    scripted = mgr.scripted["adversary"]
    _tick_many(mgr, 30)                   # t = 1.5 s: autopilot off, halted
    assert scripted.controller is None
    assert float(np.linalg.norm(scripted.actor.velocity)) == 0.0
    _tick_many(mgr, 100)                  # t = 6.5 s: back on, resumed cruise
    assert scripted.controller is not None
    assert float(np.linalg.norm(scripted.actor.velocity)) == \
        pytest.approx(6.0, rel=1e-3)


def test_lane_change_rides_on_controller_motion(tmp_path):
    """A LaneChangeAction shifts the actor laterally while its assigned
    controller keeps driving it forward (srunner's lateral atom layers on
    the registered control)."""
    mgr = OpenScenarioManager(parse_xosc(_write(
        tmp_path, _CONTROLLER_XOSC.format(
            module="npc_vehicle_control", override_active="false"))))
    scripted = mgr.scripted["adversary"]
    _tick_many(mgr, 40)                   # cruising toward the first waypoint
    y0 = scripted.actor.position[1]
    from mmfn_tpu.harness.openscenario import XoscAction
    scripted.apply(XoscAction("lane_change", lane_offset=3.5, shift_time=1.0),
                   lambda name: None)
    _tick_many(mgr, 40)                   # 2 s > shift_time: shift complete
    assert scripted._shift_left == 0.0
    assert scripted.actor.position[1] - y0 > 2.5   # moved ~a lane width left
    assert float(np.linalg.norm(scripted.actor.velocity)) > 4.0  # kept driving


# --------------------------------------------------------------------------- #
# trigger-condition atoms (srunner atomic_trigger_conditions parity subset)
# --------------------------------------------------------------------------- #

def _condition_xosc(condition_xml):
    """An event that sets the adversary moving, gated by `condition_xml`."""
    return _HEADER.format(catalogs="") + """
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="adversary">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="50" y="0" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="adversary"/>
        </Actors>
        <Maneuver name="m">
          <Event name="Go" priority="overwrite">
            <Action name="Speed">
              <PrivateAction><LongitudinalAction><SpeedAction>
                <SpeedActionDynamics dynamicsShape="step" value="0"
                                     dynamicsDimension="time"/>
                <SpeedActionTarget><AbsoluteTargetSpeed value="5"/></SpeedActionTarget>
              </SpeedAction></LongitudinalAction></PrivateAction>
            </Action>
            <StartTrigger><ConditionGroup>
              <Condition name="gate" delay="0" conditionEdge="rising">
""" + condition_xml + """
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
        </Maneuver>
      </ManeuverGroup>
    </Act></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


def _by_hero(entity_condition_xml):
    return ("<ByEntityCondition><TriggeringEntities "
            "triggeringEntitiesRule=\"any\">"
            "<EntityRef entityRef=\"hero\"/></TriggeringEntities>"
            "<EntityCondition>" + entity_condition_xml +
            "</EntityCondition></ByEntityCondition>")


def test_unsupported_condition_warns_at_parse(tmp_path):
    """An out-of-subset condition must be LOUD: it parses as never-holding,
    which silently disables the event it gates (VERDICT r2 weak #6)."""
    from mmfn_tpu.harness.openscenario import UnsupportedOsc

    # every OSC 1.0 ByEntityCondition kind — and every ByValueCondition
    # kind the reference supports — is now in the subset; the canonical
    # out-of-subset construct is one the reference itself refuses
    # (openscenario_parser.py:878-879)
    xosc = _condition_xosc(
        "<ByValueCondition><TrafficSignalControllerCondition "
        'trafficSignalControllerRef="ctrl" phase="go"/></ByValueCondition>')
    with pytest.warns(UnsupportedOsc, match="TrafficSignalControllerCondition"):
        cfg = parse_xosc(_write(tmp_path, xosc))
    assert cfg.events[0].trigger[0][0].kind == "unsupported"
    # and the event indeed never fires
    mgr = OpenScenarioManager(cfg)
    _tick_many(mgr, 100, ego=(0.0, 0.0))
    assert mgr.fired_events == ()


def test_distance_along_route_condition(tmp_path):
    """InTriggerDistanceToLocationAlongRoute analog: along an L-shaped route
    the arc distance gates later than the crow-flies distance would."""
    xosc = _condition_xosc(_by_hero(
        '<DistanceCondition value="80" freespace="false" alongRoute="true"'
        ' rule="lessThan"><Position>'
        '<WorldPosition x="50" y="50" z="0"/></Position></DistanceCondition>'))
    cfg = parse_xosc(_write(tmp_path, xosc))
    cond = cfg.events[0].trigger[0][0]
    assert cond.kind == "distance" and cond.along_route

    route = [(float(x), 0.0) for x in range(0, 51, 5)] + \
            [(50.0, float(y)) for y in range(5, 51, 5)]
    mgr = OpenScenarioManager(cfg, route_xy=route)
    # ego at origin: euclidean distance to (50,50) is ~70.7 < 80, but the
    # along-route distance is 100 — must NOT fire
    mgr.tick(np.array([0.0, 0.0]), DT)
    assert mgr.fired_events == ()
    # ego at (30,0): along-route distance 70 < 80 -> fires
    mgr.tick(np.array([30.0, 0.0]), DT)
    assert mgr.fired_events == ("Go",)
    # without a route the same condition falls back to euclidean
    mgr2 = OpenScenarioManager(cfg)
    mgr2.tick(np.array([0.0, 0.0]), DT)
    assert mgr2.fired_events == ("Go",)


def test_time_to_collision_condition(tmp_path):
    """InTimeToArrivalToVehicle analog: fires when the closing-speed time to
    the adversary drops under the threshold; never fires while stationary."""
    xosc = _condition_xosc(_by_hero(
        '<TimeToCollisionCondition value="3" rule="lessThan">'
        '<TimeToCollisionConditionTarget>'
        '<EntityRef entityRef="adversary"/>'
        '</TimeToCollisionConditionTarget></TimeToCollisionCondition>'))
    cfg = parse_xosc(_write(tmp_path, xosc))
    assert cfg.events[0].trigger[0][0].kind == "ttc"

    mgr = OpenScenarioManager(cfg)
    # stationary ego 40 m from the adversary (at x=50): gap never closes
    for _ in range(20):
        mgr.tick(np.array([10.0, 0.0]), DT)
    assert mgr.fired_events == ()
    # ego approaching at 10 m/s: ttc crosses 3 s at gap < 30 m
    x = 10.0
    fired_at_gap = None
    for _ in range(100):
        x += 10.0 * DT
        mgr.tick(np.array([x, 0.0]), DT)
        if mgr.fired_events and fired_at_gap is None:
            fired_at_gap = 50.0 - x
            break
    assert fired_at_gap is not None and 28.0 < fired_at_gap < 31.0


def test_traffic_signal_condition(tmp_path):
    """WaitForTrafficLightState analog: the event opens only once the named
    light reaches the required state."""
    from mmfn_tpu.harness.traffic import SignalSet, TrafficLight

    xosc = _condition_xosc(
        '<ByValueCondition>'
        '<TrafficSignalCondition name="id=7" state="red"/>'
        '</ByValueCondition>')
    cfg = parse_xosc(_write(tmp_path, xosc))
    cond = cfg.events[0].trigger[0][0]
    assert cond.kind == "signal" and cond.state == "red"

    light = TrafficLight(position=np.array([50.0, 0.0]), yaw=0.0,
                         green=10.0, yellow=3.0, red=10.0, light_id=7)
    mgr = OpenScenarioManager(cfg, signals=SignalSet(lights=[light]))
    _tick_many(mgr, 100, ego=(0.0, 0.0))   # t = 5 s: still green
    assert mgr.fired_events == ()
    _tick_many(mgr, 180, ego=(0.0, 0.0))   # t = 14 s: red (>13 s)
    assert mgr.fired_events == ("Go",)


def test_speed_condition(tmp_path):
    xosc = _condition_xosc(_by_hero(
        '<SpeedCondition value="5" rule="greaterThan"/>'))
    mgr = OpenScenarioManager(parse_xosc(_write(tmp_path, xosc)))
    for _ in range(20):                    # ego parked
        mgr.tick(np.array([0.0, 0.0]), DT)
    assert mgr.fired_events == ()
    x = 0.0
    for _ in range(5):                     # ego at 8 m/s > 5
        x += 8.0 * DT
        mgr.tick(np.array([x, 0.0]), DT)
    assert mgr.fired_events == ("Go",)


def test_time_headway_condition(tmp_path):
    """TimeHeadwayCondition: gap to the adversary over OWN speed."""
    xosc = _condition_xosc(_by_hero(
        '<TimeHeadwayCondition entityRef="adversary" value="2"'
        ' rule="lessThan"/>'))
    mgr = OpenScenarioManager(parse_xosc(_write(tmp_path, xosc)))
    x = 0.0
    fired_at_gap = None
    for _ in range(200):                   # ego at 10 m/s toward x=50
        x += 10.0 * DT
        mgr.tick(np.array([x, 0.0]), DT)
        if mgr.fired_events:
            fired_at_gap = 50.0 - x
            break
    # headway < 2 s at 10 m/s -> gap < 20 m
    assert fired_at_gap is not None and 18.5 < fired_at_gap < 21.0


def test_collision_condition(tmp_path):
    """CollisionCondition: OBB contact between the hero and the adversary
    (the kinematic analog of CARLA's collision sensor)."""
    xosc = _condition_xosc(_by_hero(
        '<CollisionCondition><EntityRef entityRef="adversary"/>'
        '</CollisionCondition>'))
    cfg = parse_xosc(_write(tmp_path, xosc))
    assert cfg.events[0].trigger[0][0].kind == "collision"
    mgr = OpenScenarioManager(cfg)
    x = 0.0
    fired_at_gap = None
    for _ in range(300):                   # ego at 10 m/s toward x=50
        x += 10.0 * DT
        mgr.tick(np.array([x, 0.0]), DT)
        if mgr.fired_events:
            fired_at_gap = 50.0 - x
            break
    # boxes touch when the gap shrinks to ~(ego half length + adversary
    # half length): well before the centers coincide, well after 10 m
    assert fired_at_gap is not None and 2.0 < fired_at_gap < 8.0


def test_offroad_condition_duration(tmp_path):
    """OffroadCondition: continuous off-lane membership for `duration`
    (route-polyline fallback when no lane ribbon is wired)."""
    xosc = _condition_xosc(_by_hero('<OffroadCondition duration="1"/>'))
    cfg = parse_xosc(_write(tmp_path, xosc))
    assert cfg.events[0].trigger[0][0].kind == "offroad"
    mgr = OpenScenarioManager(
        cfg, route_xy=[(float(x), 0.0) for x in range(0, 101, 5)])
    _tick_many(mgr, 100, ego=(10.0, 0.0))  # on the route: never fires
    assert mgr.fired_events == ()
    for i in range(15):                    # 0.75 s offroad: not yet
        mgr.tick(np.array([10.0, 10.0]), DT)
    assert mgr.fired_events == ()
    mgr.tick(np.array([10.0, 0.0]), DT)    # back on-road resets the clock
    for _ in range(19):
        mgr.tick(np.array([10.0, 10.0]), DT)
    assert mgr.fired_events == ()          # 0.95 s continuous: still gated
    for _ in range(3):
        mgr.tick(np.array([10.0, 10.0]), DT)
    assert mgr.fired_events == ("Go",)     # >=1 s continuous


def test_end_of_road_condition(tmp_path):
    """EndOfRoadCondition: entity within 2 m of the route end, held for
    `duration`."""
    xosc = _condition_xosc(_by_hero('<EndOfRoadCondition duration="0.5"/>'))
    cfg = parse_xosc(_write(tmp_path, xosc))
    assert cfg.events[0].trigger[0][0].kind == "end_of_road"
    mgr = OpenScenarioManager(
        cfg, route_xy=[(float(x), 0.0) for x in range(0, 101, 5)])
    _tick_many(mgr, 50, ego=(50.0, 0.0))   # mid-route: never fires
    assert mgr.fired_events == ()
    for _ in range(9):                     # 0.45 s at the end: not yet
        mgr.tick(np.array([99.5, 0.0]), DT)
    assert mgr.fired_events == ()
    for _ in range(3):
        mgr.tick(np.array([99.5, 0.0]), DT)
    assert mgr.fired_events == ("Go",)
