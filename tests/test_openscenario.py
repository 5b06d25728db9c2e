"""OpenSCENARIO subset: parser, story runtime, and closed-loop integration."""

import math
import os

import numpy as np
import pytest

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.harness.openscenario import (
    OpenScenarioManager, XoscCondition, hero_trajectory, parse_xosc)
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from tests.test_harness import STRAIGHT_XODR

XOSC = """<?xml version="1.0" encoding="UTF-8"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="2026-01-01T00:00:00"
              description="subset-test:FollowAndCutIn" author=""/>
  <ParameterDeclarations>
    <ParameterDeclaration name="leadSpeed" parameterType="double" value="5.5"/>
  </ParameterDeclarations>
  <CatalogLocations/>
  <RoadNetwork>
    <LogicFile filepath="TownTest"/>
    <SceneGraphFile filepath=""/>
  </RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="lead">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car">
        <Properties><Property name="type" value="simulation"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="crosser">
      <Pedestrian name="walker.pedestrian.0001" model="walker"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <GlobalAction>
          <EnvironmentAction>
            <Environment name="Env">
              <TimeOfDay animation="false" dateTime="2026-01-01T12:00:00"/>
              <Weather cloudState="free">
                <Sun intensity="0.85" azimuth="0" elevation="1.31"/>
                <Fog visualRange="100000.0"/>
                <Precipitation precipitationType="dry" intensity="0.0"/>
              </Weather>
            </Environment>
          </EnvironmentAction>
        </GlobalAction>
        <Private entityRef="hero">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="0" y="1.75" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
        <Private entityRef="lead">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="40" y="1.75" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
        <Private entityRef="crosser">
          <PrivateAction>
            <TeleportAction>
              <Position>
                <RelativeWorldPosition entityRef="lead" dx="20" dy="6"/>
              </Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="Story">
      <Act name="Act">
        <ManeuverGroup name="Lead" maximumExecutionCount="1">
          <Actors selectTriggeringEntities="false">
            <EntityRef entityRef="lead"/>
          </Actors>
          <Maneuver name="LeadDrives">
            <Event name="LeadKeepsVelocity" priority="overwrite">
              <Action name="LeadKeepsVelocity">
                <PrivateAction>
                  <LongitudinalAction>
                    <SpeedAction>
                      <SpeedActionDynamics dynamicsShape="step" value="20"
                                           dynamicsDimension="distance"/>
                      <SpeedActionTarget>
                        <AbsoluteTargetSpeed value="$leadSpeed"/>
                      </SpeedActionTarget>
                    </SpeedAction>
                  </LongitudinalAction>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="NearLead" delay="0" conditionEdge="rising">
                    <ByEntityCondition>
                      <TriggeringEntities triggeringEntitiesRule="any">
                        <EntityRef entityRef="hero"/>
                      </TriggeringEntities>
                      <EntityCondition>
                        <RelativeDistanceCondition entityRef="lead" freespace="false"
                            relativeDistanceType="cartesianDistance"
                            value="25" rule="lessThan"/>
                      </EntityCondition>
                    </ByEntityCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
            <Event name="LeadChangesLane" priority="parallel">
              <Action name="LeadChangesLane">
                <PrivateAction>
                  <LateralAction>
                    <LaneChangeAction>
                      <LaneChangeActionDynamics dynamicsShape="sinusoidal"
                          value="2" dynamicsDimension="time"/>
                      <LaneChangeTarget>
                        <RelativeTargetLane entityRef="lead" value="1"/>
                      </LaneChangeTarget>
                    </LaneChangeAction>
                  </LateralAction>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="Later" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <SimulationTimeCondition value="8" rule="greaterThan"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
          </Maneuver>
        </ManeuverGroup>
      </Act>
    </Story>
    <StopTrigger>
      <ConditionGroup>
        <Condition name="EndTime" delay="0" conditionEdge="rising">
          <ByValueCondition>
            <SimulationTimeCondition value="60" rule="greaterThan"/>
          </ByValueCondition>
        </Condition>
        <Condition name="criteria_CollisionTest" delay="0" conditionEdge="rising">
          <ByValueCondition>
            <SimulationTimeCondition value="0" rule="greaterThan"/>
          </ByValueCondition>
        </Condition>
      </ConditionGroup>
    </StopTrigger>
  </Storyboard>
</OpenSCENARIO>
"""


@pytest.fixture()
def xosc_path(tmp_path):
    p = tmp_path / "follow.xosc"
    p.write_text(XOSC)
    return str(p)


def test_parse_xosc(xosc_path):
    cfg = parse_xosc(xosc_path)
    assert cfg.town == "TownTest"
    assert cfg.description.endswith("FollowAndCutIn")
    assert set(cfg.entities) == {"hero", "lead", "crosser"}
    hero = cfg.hero
    assert hero is not None and hero.name == "hero"
    assert (hero.x, hero.y, hero.yaw) == (0.0, 1.75, 0.0)
    lead = cfg.entities["lead"]
    assert (lead.x, lead.y) == (40.0, 1.75)
    crosser = cfg.entities["crosser"]
    assert crosser.kind == "walker"
    # relative position resolved against lead's init
    assert (crosser.x, crosser.y) == (60.0, 7.75)
    assert cfg.weather == "ClearNoon"

    assert len(cfg.events) == 2
    keep = cfg.events[0]
    assert keep.actors == ("lead",)
    assert keep.trigger[0][0].kind == "reldist"
    assert keep.trigger[0][0].value == 25.0
    assert keep.act_trigger == []      # the Act has no StartTrigger
    assert keep.actions[0].kind == "speed"
    assert keep.actions[0].target_speed == 5.5  # $leadSpeed substituted
    change = cfg.events[1]
    assert change.trigger[0][0].kind == "time"
    assert change.trigger[0][0].value == 8.0
    assert change.actions[0].kind == "lane_change"
    assert change.actions[0].lane_offset == pytest.approx(3.5)
    assert change.actions[0].shift_time == pytest.approx(2.0)

    # criteria conditions are extracted; the remaining group holds EndTime
    assert [[c.kind for c in g] for g in cfg.stop_trigger] == [["time"]]
    assert cfg.stop_trigger[0][0].value == 60.0
    assert cfg.criteria == ["CollisionTest"]


def test_manager_story_runtime(xosc_path):
    cfg = parse_xosc(xosc_path)
    mgr = OpenScenarioManager(cfg)
    # far away: lead stays parked
    actors = mgr.tick(np.array([0.0, 1.75]), 0.05)
    assert len(actors) == 2  # lead + crosser; hero is the ego, not spawned
    lead = next(a for a in actors if a.kind == "vehicle")
    assert np.linalg.norm(lead.velocity) == 0.0
    # within 25 m: the speed event fires
    mgr.tick(np.array([20.0, 1.75]), 0.05)
    assert "LeadKeepsVelocity" in mgr.fired_events
    for _ in range(20):
        actors = mgr.tick(np.array([20.0, 1.75]), 0.05)
    lead = next(a for a in actors if a.kind == "vehicle")
    assert np.linalg.norm(lead.velocity) == pytest.approx(5.5)
    assert lead.position[0] > 40.0
    # simulated time passes 8 s: the lane change fires and shifts left (+y)
    for _ in range(200):
        actors = mgr.tick(np.array([20.0, 1.75]), 0.05)
    assert "LeadChangesLane" in mgr.fired_events
    lead = next(a for a in actors if a.kind == "vehicle")
    assert lead.position[1] == pytest.approx(1.75 + 3.5, abs=0.2)
    # storyboard stop trigger at 60 s
    assert not mgr.stop_triggered()
    for _ in range(1000):
        mgr.tick(np.array([20.0, 1.75]), 0.05)
    assert mgr.stop_triggered()


def test_remove_actors_near(xosc_path):
    cfg = parse_xosc(xosc_path)
    mgr = OpenScenarioManager(cfg)
    mgr.tick(np.array([0.0, 1.75]), 0.05)
    assert mgr.remove_actors_near(np.array([40.0, 1.75]), radius=5.0) == 1
    assert len(mgr.tick(np.array([0.0, 1.75]), 0.05)) == 1


def test_hero_trajectory_without_map(xosc_path):
    cfg = parse_xosc(xosc_path)
    traj = hero_trajectory(cfg, distance=120.0)
    assert traj[0] == (0.0, 1.75)
    assert traj[-1][0] == pytest.approx(120.0)
    assert traj[-1][1] == pytest.approx(1.75)


def test_hero_trajectory_stop_bounded(xosc_path, tmp_path):
    from mmfn_tpu.harness.openscenario import XoscCondition

    cfg = parse_xosc(xosc_path)
    cfg.stop_trigger = [[XoscCondition(kind="traveled", value=50.0)]]
    traj = hero_trajectory(cfg, distance=500.0)
    # the route ends before the traveled-distance stop trigger would fire
    assert traj[-1][0] == pytest.approx(30.0)  # 50 - 20 margin


def test_unsupported_condition_keeps_event_gated(tmp_path):
    """A StartTrigger outside the subset must NOT fire its event immediately
    — unsupported conditions never hold (firing at t=0 would silently corrupt
    the story)."""
    xosc = XOSC.replace(
        """<ByValueCondition>
                      <SimulationTimeCondition value="8" rule="greaterThan"/>
                    </ByValueCondition>""",
        """<ByValueCondition>
                      <TrafficSignalControllerCondition trafficSignalControllerRef="ctrl"
                          phase="go"/>
                    </ByValueCondition>""")
    p = tmp_path / "gated.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p))
    assert cfg.events[1].trigger[0][0].kind == "unsupported"
    mgr = OpenScenarioManager(cfg)
    for _ in range(400):
        mgr.tick(np.array([20.0, 1.75]), 0.05)
    assert "LeadChangesLane" not in mgr.fired_events      # stays gated
    assert "LeadKeepsVelocity" in mgr.fired_events        # others unaffected


def test_condition_groups_are_or_of_ands(tmp_path):
    """Two ConditionGroups = OR: the event fires when EITHER group holds."""
    xosc = XOSC.replace(
        """<ConditionGroup>
                  <Condition name="Later" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <SimulationTimeCondition value="8" rule="greaterThan"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>""",
        """<ConditionGroup>
                  <Condition name="Never" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <SimulationTimeCondition value="9999" rule="greaterThan"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>
                <ConditionGroup>
                  <Condition name="Soon" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <SimulationTimeCondition value="2" rule="greaterThan"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>""")
    p = tmp_path / "orgroups.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p))
    assert len(cfg.events[1].trigger) == 2
    mgr = OpenScenarioManager(cfg)
    for _ in range(80):                                   # 4 s > 2 s, << 9999
        mgr.tick(np.array([0.0, 1.75]), 0.05)
    assert "LeadChangesLane" in mgr.fired_events


def test_managers_do_not_share_fired_state(xosc_path):
    """Two managers over ONE parsed config run independent storyboards."""
    cfg = parse_xosc(xosc_path)
    m1 = OpenScenarioManager(cfg)
    m1.tick(np.array([20.0, 1.75]), 0.05)                 # fires on m1
    assert "LeadKeepsVelocity" in m1.fired_events
    m2 = OpenScenarioManager(cfg)
    m2.tick(np.array([0.0, 1.75]), 0.05)                  # far away on m2
    assert "LeadKeepsVelocity" not in m2.fired_events
    actors = m2.tick(np.array([0.0, 1.75]), 0.05)
    lead = next(a for a in actors if a.kind == "vehicle")
    assert np.linalg.norm(lead.velocity) == 0.0           # still parked on m2


def test_closed_loop_openscenario(tool, tmp_path, xosc_path):
    """The expert drives the parsed scenario end-to-end on the straight road:
    the parked lead starts driving when approached, the episode is scored by
    the ordinary criteria, and no collision occurs."""
    from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent

    cfg = parse_xosc(xosc_path)
    traj = [(x, y, 0.0) for x, y in hero_trajectory(cfg, distance=120.0)]
    config = RouteConfig(route_id="xosc-0", town=cfg.town,
                         trajectory=[traj[0], traj[-1]], index=0)
    agent = ExpertCollectionAgent({"rmap_tool": tool,
                                   "tmp_dir": str(tmp_path / "map"),
                                   "config": GlobalConfig()})
    record = ClosedLoopRunner(max_wall_seconds=60).run_route(
        agent, config, STRAIGHT_XODR,
        scenario_manager=OpenScenarioManager(cfg))
    assert record.status == "Completed", record.to_dict()
    assert not record.infractions["collisions_vehicle"], record.to_dict()
    assert not record.infractions["collisions_pedestrian"], record.to_dict()


def test_hero_trajectory_attaches_mid_polyline(xosc_path):
    """An init position landing mid-polyline (no chunk head nearby) must
    still walk the lane instead of falling back to a straight chord."""
    from dataclasses import dataclass

    @dataclass
    class _Lane:
        nodes: np.ndarray

    @dataclass
    class _Map:
        lanes: list

    # one long polyline along +x at y=1.75, nodes every 5 m from x=-100
    nodes = np.stack([np.arange(-100.0, 100.0, 5.0),
                      np.full(40, 1.75)], axis=1)
    rough_map = _Map([_Lane(np.concatenate(
        [nodes, np.zeros((40, 3))], axis=1))])
    cfg = parse_xosc(xosc_path)        # hero at (0, 1.75): 20 nodes in
    traj = hero_trajectory(cfg, rough_map=rough_map, distance=60.0)
    assert len(traj) > 5               # walked nodes, not the 3-point fallback
    assert traj[-1][0] >= 55.0
    assert all(abs(y - 1.75) < 1e-6 for _, y in traj[1:])


CATALOG_XOSC = """<?xml version="1.0" encoding="UTF-8"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="2026-01-01T00:00:00"
              description="catalog-test" author=""/>
  <Catalog name="VehicleCatalog">
    <Vehicle name="catalog_car" vehicleCategory="car">
      <Properties><Property name="type" value="simulation"/></Properties>
    </Vehicle>
    <Vehicle name="catalog_bike" vehicleCategory="bicycle"/>
  </Catalog>
  <Catalog name="PedestrianCatalog">
    <Pedestrian name="catalog_walker" model="walker"/>
  </Catalog>
</OpenSCENARIO>
"""


def test_catalog_reference_and_expressions(tmp_path):
    """CatalogLocations/CatalogReference resolve Vehicle+Pedestrian entries
    from a catalog directory, and ${...} arithmetic expressions evaluate
    over $parameters (OSC 1.1 spec 10.8; srunner openscenario_parser)."""
    catdir = tmp_path / "catalogs"
    catdir.mkdir()
    (catdir / "vehicles.xosc").write_text(CATALOG_XOSC)

    xosc = """<?xml version="1.0" encoding="UTF-8"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="1" date="2026-01-01T00:00:00"
              description="cat" author=""/>
  <ParameterDeclarations>
    <ParameterDeclaration name="base" parameterType="double" value="10"/>
    <ParameterDeclaration name="spawnX" parameterType="double" value="${$base * 3 + 5}"/>
  </ParameterDeclarations>
  <CatalogLocations>
    <VehicleCatalog><Directory path="catalogs"/></VehicleCatalog>
    <PedestrianCatalog><Directory path="catalogs"/></PedestrianCatalog>
  </CatalogLocations>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="npc">
      <CatalogReference catalogName="VehicleCatalog" entryName="catalog_car"/>
    </ScenarioObject>
    <ScenarioObject name="rider">
      <CatalogReference catalogName="VehicleCatalog" entryName="catalog_bike"/>
    </ScenarioObject>
    <ScenarioObject name="ped">
      <CatalogReference catalogName="PedestrianCatalog" entryName="catalog_walker"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="npc">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="$spawnX" y="${2 * 1.75}" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a"/></Story>
  </Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "cat_scene.xosc"
    path.write_text(xosc)
    cfg = parse_xosc(str(path))
    assert cfg.entities["npc"].model == "catalog_car"
    assert cfg.entities["npc"].kind != "walker"
    assert cfg.entities["rider"].extent == 1.0        # bicycle category
    assert cfg.entities["ped"].kind == "walker"
    # ${$base * 3 + 5} with base=10 -> 35; ${2 * 1.75} -> 3.5
    assert cfg.entities["npc"].x == 35.0
    assert cfg.entities["npc"].y == 3.5


def test_catalog_parameter_assignments_are_scoped(tmp_path):
    """ParameterAssignments substitute into a deep copy of the catalog entry
    under a LOCAL scope (srunner get_catalog_entry): the entry's own
    ParameterDeclarations provide defaults, an assignment overrides them for
    that one reference, and nothing leaks into the scenario-global params."""
    catdir = tmp_path / "catalogs"
    catdir.mkdir()
    (catdir / "param_vehicles.xosc").write_text("""<?xml version="1.0"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="d" description="pc" author=""/>
  <Catalog name="VehicleCatalog">
    <Vehicle name="param_vehicle" vehicleCategory="$category">
      <ParameterDeclarations>
        <ParameterDeclaration name="category" parameterType="string" value="car"/>
      </ParameterDeclarations>
    </Vehicle>
  </Catalog>
</OpenSCENARIO>
""")
    xosc = """<?xml version="1.0"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="1" date="d" description="scope" author=""/>
  <ParameterDeclarations>
    <ParameterDeclaration name="speed" parameterType="double" value="10"/>
  </ParameterDeclarations>
  <CatalogLocations>
    <VehicleCatalog><Directory path="catalogs"/></VehicleCatalog>
  </CatalogLocations>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="bike">
      <CatalogReference catalogName="VehicleCatalog" entryName="param_vehicle">
        <ParameterAssignments>
          <ParameterAssignment parameterRef="category" value="bicycle"/>
          <ParameterAssignment parameterRef="speed" value="99"/>
        </ParameterAssignments>
      </CatalogReference>
    </ScenarioObject>
    <ScenarioObject name="plain">
      <CatalogReference catalogName="VehicleCatalog" entryName="param_vehicle"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="plain">
          <PrivateAction><TeleportAction><Position>
            <WorldPosition x="$speed" y="0" z="0" h="0"/>
          </Position></TeleportAction></PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a"/></Story>
  </Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "scope.xosc"
    path.write_text(xosc)
    cfg = parse_xosc(str(path))
    # assignment resolved INTO the copied entry's attributes
    assert cfg.entities["bike"].extent == 1.0          # category=bicycle
    # second reference sees the entry's own default, not the first
    # reference's assignment
    assert cfg.entities["plain"].extent != 1.0
    # the assignment named like a global parameter did NOT leak: $speed
    # downstream still resolves to the declared 10, not 99
    assert cfg.entities["plain"].x == 10.0


def test_unresolved_catalog_reference_raises(tmp_path):
    xosc = """<?xml version="1.0"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="d" description="x" author=""/>
  <CatalogLocations/>
  <Entities>
    <ScenarioObject name="npc">
      <CatalogReference catalogName="Nope" entryName="missing"/>
    </ScenarioObject>
  </Entities>
  <Storyboard><Init/></Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "bad.xosc"
    path.write_text(xosc)
    with pytest.raises(ValueError, match="CatalogReference"):
        parse_xosc(str(path))


def test_expression_rejects_non_arithmetic(tmp_path):
    from mmfn_tpu.harness.openscenario import _eval_expr

    assert _eval_expr("2 + 3 * 4", {}) == "14"
    assert _eval_expr("$a / 2", {"a": "9"}) == "4.5"
    # parameters are VALUES, not textual macros: a string parameter holding
    # an expression is parenthesized before substitution
    assert _eval_expr("$a * 3", {"a": "1+2"}) == "9"
    assert _eval_expr("-$a", {"a": "1-3"}) == "2"
    # the five OSC 1.1 spec 10.8 functions (round is round-half-up)
    assert _eval_expr("round(2.5)", {}) == "3"
    assert _eval_expr("round(-2.5)", {}) == "-2"
    assert _eval_expr("floor($a / 2)", {"a": "9"}) == "4"
    assert _eval_expr("ceil(4.01)", {}) == "5"
    assert _eval_expr("sqrt(2) * sqrt(2)", {}) == "2.0000000000000004"
    assert _eval_expr("pow($a, 2)", {"a": "3"}) == "9"
    with pytest.raises(ValueError):
        _eval_expr("__import__('os')", {})
    with pytest.raises(ValueError):
        _eval_expr("'str'", {})
    with pytest.raises(ValueError):
        _eval_expr("pow(2, exp=3)", {})
    with pytest.raises(ValueError):
        _eval_expr("undefined_name", {})


def _trajectory_xosc(time_reference: str, vertices: str) -> str:
    """Minimal scenario: one scripted 'mover' whose only event (no trigger)
    is a FollowTrajectoryAction — the construct the reference refuses
    (openscenario_parser.py:1043-1044); ours runs it."""
    return f"""<?xml version="1.0"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="d" description="traj" author=""/>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="mover">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="mover">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="10" y="0" z="0" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="mover"/>
        </Actors>
        <Maneuver name="m">
          <Event name="Follow" priority="overwrite">
            <Action name="Follow">
              <PrivateAction>
                <RoutingAction>
                  <FollowTrajectoryAction>
                    <Trajectory name="t" closed="false">
                      <Shape><Polyline>
{vertices}
                      </Polyline></Shape>
                    </Trajectory>
                    <TimeReference>{time_reference}</TimeReference>
                    <TrajectoryFollowingMode followingMode="position"/>
                  </FollowTrajectoryAction>
                </RoutingAction>
              </PrivateAction>
            </Action>
          </Event>
        </Maneuver>
      </ManeuverGroup>
    </Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""


_TIMED_VERTICES = """\
<Vertex time="0"><Position><WorldPosition x="10" y="0"/></Position></Vertex>
<Vertex time="2"><Position><WorldPosition x="20" y="0"/></Position></Vertex>
<Vertex time="4"><Position><WorldPosition x="20" y="10"/></Position></Vertex>"""


def test_follow_trajectory_timed(tmp_path):
    """A timed Polyline trajectory replays the vertex schedule exactly:
    linear interpolation between vertices, yaw along the motion, and the
    actor parks at the final vertex once the schedule is exhausted (its
    story target speed is still 0). Extension beyond the reference, which
    raises NotImplementedError (openscenario_parser.py:1043-1044)."""
    p = tmp_path / "timed.xosc"
    p.write_text(_trajectory_xosc(
        '<Timing domainAbsoluteRelative="relative" scale="1" offset="0"/>',
        _TIMED_VERTICES))
    cfg = parse_xosc(str(p))
    assert cfg.events[0].actions[0].kind == "trajectory"
    assert cfg.events[0].actions[0].times == (0.0, 2.0, 4.0)
    mgr = OpenScenarioManager(cfg)
    dt, ego = 0.05, np.array([0.0, -50.0])
    for _ in range(20):                                   # t = 1.0
        actors = mgr.tick(ego, dt)
    mover = actors[0]
    assert np.allclose(mover.position, [15.0, 0.0], atol=1e-6)
    assert abs(np.linalg.norm(mover.velocity) - 5.0) < 1e-6
    for _ in range(40):                                   # t = 3.0
        actors = mgr.tick(ego, dt)
    mover = actors[0]
    assert np.allclose(mover.position, [20.0, 5.0], atol=1e-6)
    assert abs(mover.yaw - math.pi / 2) < 1e-6            # second leg: +y
    for _ in range(40):                                   # t = 5.0 > end
        actors = mgr.tick(ego, dt)
    mover = actors[0]
    assert np.allclose(mover.position, [20.0, 10.0], atol=1e-6)
    assert np.linalg.norm(mover.velocity) == 0.0          # parked at the end


def test_follow_trajectory_timing_scale_offset(tmp_path):
    """Timing scale/offset transform the vertex schedule (OSC spec): with
    offset=1 the actor holds at vertex 0 until its scheduled time."""
    p = tmp_path / "scaled.xosc"
    p.write_text(_trajectory_xosc(
        '<Timing domainAbsoluteRelative="relative" scale="0.5" offset="1"/>',
        _TIMED_VERTICES))
    cfg = parse_xosc(str(p))
    assert cfg.events[0].actions[0].times == (1.0, 2.0, 3.0)
    mgr = OpenScenarioManager(cfg)
    dt, ego = 0.05, np.array([0.0, -50.0])
    for _ in range(10):                                   # t = 0.5 < offset
        actors = mgr.tick(ego, dt)
    assert np.allclose(actors[0].position, [10.0, 0.0], atol=1e-6)
    for _ in range(50):                                   # t = 3.0 = end
        actors = mgr.tick(ego, dt)
    assert np.allclose(actors[0].position, [20.0, 10.0], atol=1e-6)


def test_follow_trajectory_untimed_uses_controller(tmp_path):
    """TimeReference None degrades to controller waypoint following at the
    actor's target speed (like AssignRouteAction)."""
    xosc = _trajectory_xosc(
        "<None/>",
        """<Vertex><Position><WorldPosition x="30" y="0"/></Position></Vertex>
<Vertex><Position><WorldPosition x="60" y="0"/></Position></Vertex>""")
    # give the mover an initial speed so the follower moves
    xosc = xosc.replace(
        """<Private entityRef="mover">
          <PrivateAction>
            <TeleportAction>""",
        """<Private entityRef="mover">
          <PrivateAction>
            <LongitudinalAction><SpeedAction>
              <SpeedActionDynamics dynamicsShape="step"/>
              <SpeedActionTarget><AbsoluteTargetSpeed value="6"/></SpeedActionTarget>
            </SpeedAction></LongitudinalAction>
          </PrivateAction>
          <PrivateAction>
            <TeleportAction>""")
    p = tmp_path / "untimed.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p))
    action = cfg.events[0].actions[0]
    assert action.kind == "trajectory" and action.times == ()
    mgr = OpenScenarioManager(cfg)
    dt, ego = 0.05, np.array([0.0, -50.0])
    for _ in range(40):                                   # t = 2.0
        actors = mgr.tick(ego, dt)
    mover = actors[0]
    assert mover.position[0] > 15.0                       # moving toward x=30
    assert abs(mover.position[1]) < 0.5
    assert abs(np.linalg.norm(mover.velocity) - 6.0) < 1e-6


def _clothoid_xosc(clothoid: str, time_reference: str = "") -> str:
    return _trajectory_xosc(time_reference, "").replace(
        "<Shape><Polyline>\n\n                      </Polyline></Shape>",
        f"<Shape>{clothoid}</Shape>")


def test_follow_trajectory_clothoid_circle(tmp_path):
    """A constant-curvature Clothoid is a circular arc: κ=0.1 (R=10 m) over
    a quarter circle (length πR/2) from (10,0) heading +x must end at
    (20, 10) heading +y; with startTime/stopTime it replays on a uniform
    schedule (constant speed along the arc). Extension — the reference
    raises on every FollowTrajectoryAction (openscenario_parser.py:1043)."""
    length = math.pi * 10.0 / 2.0
    p = tmp_path / "clothoid_circle.xosc"
    p.write_text(_clothoid_xosc(
        f'<Clothoid curvature="0.1" curvatureDot="0" length="{length}" '
        f'startTime="0" stopTime="4">'
        f'<Position><WorldPosition x="10" y="0" h="0"/></Position>'
        f'</Clothoid>'))
    cfg = parse_xosc(str(p))
    action = cfg.events[0].actions[0]
    assert action.kind == "trajectory"
    assert action.times[0] == 0.0 and abs(action.times[-1] - 4.0) < 1e-9
    mgr = OpenScenarioManager(cfg)
    dt, ego = 0.05, np.array([0.0, -50.0])
    speeds = []
    for _ in range(40):                                   # t = 2.0: halfway
        actors = mgr.tick(ego, dt)
        speeds.append(float(np.linalg.norm(actors[0].velocity)))
    mover = actors[0]
    # halfway around the quarter arc: 45 deg -> (10 + R sin45, R(1-cos45))
    assert np.allclose(mover.position,
                       [10 + 10 * math.sin(math.pi / 4),
                        10 * (1 - math.cos(math.pi / 4))], atol=0.05)
    # constant pace = length / 4 s
    assert abs(speeds[-1] - length / 4.0) < 0.1
    for _ in range(50):                                   # past the end
        actors = mgr.tick(ego, dt)
    mover = actors[0]
    assert np.allclose(mover.position, [20.0, 10.0], atol=0.05)
    assert abs(mover.yaw - math.pi / 2) < 0.05            # heading +y


def test_follow_trajectory_clothoid_untimed_spiral(tmp_path):
    """An untimed Clothoid degrades to controller waypoints (like an untimed
    Polyline); the sampled points match an independent fine integration of
    the spiral heading θ(s) = κ0·s + ½κ'·s²."""
    p = tmp_path / "clothoid_spiral.xosc"
    p.write_text(_clothoid_xosc(
        '<Clothoid curvature="0" curvatureDot="0.01" length="40">'
        '<Position><WorldPosition x="10" y="0" h="0"/></Position>'
        '</Clothoid>'))
    cfg = parse_xosc(str(p))
    action = cfg.events[0].actions[0]
    assert action.kind == "trajectory" and action.times == ()
    # independent check: integrate at 1 mm steps
    s = np.arange(0, 40.0, 0.001)
    theta = 0.5 * 0.01 * s * s
    end = np.array([10 + np.sum(np.cos(theta)) * 0.001,
                    np.sum(np.sin(theta)) * 0.001])
    assert np.linalg.norm(np.asarray(action.waypoints[-1]) - end) < 0.02
    assert np.allclose(action.waypoints[0], [10.0, 0.0], atol=1e-9)


def test_follow_trajectory_nurbs_quarter_circle(tmp_path):
    """A rational quadratic NURBS with weights (1, √2/2, 1) over a clamped
    knot vector is an EXACT quarter circle — every sampled waypoint must sit
    on the radius-10 circle about the origin to float precision, and the
    control-point times must interpolate into a monotone schedule.
    Extension — the reference raises on every FollowTrajectoryAction."""
    w_mid = math.sqrt(2) / 2
    p = tmp_path / "nurbs.xosc"
    p.write_text(_clothoid_xosc(f"""
      <Nurbs order="3">
        <ControlPoint time="0" weight="1">
          <Position><WorldPosition x="10" y="0"/></Position>
        </ControlPoint>
        <ControlPoint time="2" weight="{w_mid}">
          <Position><WorldPosition x="10" y="10"/></Position>
        </ControlPoint>
        <ControlPoint time="4" weight="1">
          <Position><WorldPosition x="0" y="10"/></Position>
        </ControlPoint>
        <Knot value="0"/><Knot value="0"/><Knot value="0"/>
        <Knot value="1"/><Knot value="1"/><Knot value="1"/>
      </Nurbs>"""))
    cfg = parse_xosc(str(p))
    action = cfg.events[0].actions[0]
    assert action.kind == "trajectory"
    pts = np.asarray(action.waypoints)
    radii = np.linalg.norm(pts, axis=1)
    assert np.allclose(radii, 10.0, atol=1e-9)            # exact circle
    assert np.allclose(pts[0], [10.0, 0.0], atol=1e-9)
    assert np.allclose(pts[-1], [0.0, 10.0], atol=1e-9)
    # times interpolate through the same rational basis: monotone 0 -> 4
    assert action.times[0] == 0.0 and abs(action.times[-1] - 4.0) < 1e-9
    assert np.all(np.diff(action.times) > 0)


def test_follow_trajectory_nurbs_nonclamped_endpoint(tmp_path):
    """A UNIFORM (non-clamped) knot vector: the domain-end sample must be
    attributed to the single span containing it — zeroth-degree spans at or
    past the domain end must stay silent, or the rational denominator
    doubles at the endpoint and the final waypoint blends in the padding
    column. A degree-1 uniform B-spline is linear through its control
    points over the domain [knots[p], knots[n]] (here [1, 4] -> x: 0..3)."""
    p = tmp_path / "nurbs_uniform.xosc"
    p.write_text(_clothoid_xosc("""
      <Nurbs order="2">
        <ControlPoint time="0"><Position><WorldPosition x="0" y="0"/></Position></ControlPoint>
        <ControlPoint time="1"><Position><WorldPosition x="1" y="0"/></Position></ControlPoint>
        <ControlPoint time="2"><Position><WorldPosition x="2" y="0"/></Position></ControlPoint>
        <ControlPoint time="3"><Position><WorldPosition x="3" y="0"/></Position></ControlPoint>
        <Knot value="0"/><Knot value="1"/><Knot value="2"/>
        <Knot value="3"/><Knot value="4"/><Knot value="5"/>
      </Nurbs>"""))
    cfg = parse_xosc(str(p))
    action = cfg.events[0].actions[0]
    assert action.kind == "trajectory"
    pts = np.asarray(action.waypoints)
    assert np.allclose(pts[:, 1], 0.0, atol=1e-9)
    assert np.allclose(pts[0], [0.0, 0.0], atol=1e-9)
    assert np.allclose(pts[-1], [3.0, 0.0], atol=1e-9)   # endpoint intact
    u = np.linspace(0.0, 3.0, len(pts))
    assert np.allclose(pts[:, 0], u, atol=1e-9)          # linear in u
    assert np.all(np.diff(action.times) > 0)             # schedule monotone
    assert abs(action.times[-1] - 3.0) < 1e-9


def test_follow_trajectory_nurbs_validates(tmp_path):
    p = tmp_path / "nurbs_bad.xosc"
    p.write_text(_clothoid_xosc("""
      <Nurbs order="3">
        <ControlPoint><Position><WorldPosition x="0" y="0"/></Position></ControlPoint>
        <ControlPoint><Position><WorldPosition x="1" y="0"/></Position></ControlPoint>
        <ControlPoint><Position><WorldPosition x="2" y="0"/></Position></ControlPoint>
        <Knot value="0"/><Knot value="1"/>
      </Nurbs>"""))
    with pytest.raises(ValueError, match="knot vector"):
        parse_xosc(str(p))


def test_follow_trajectory_nonmonotonic_times_raise(tmp_path):
    p = tmp_path / "bad_times.xosc"
    p.write_text(_trajectory_xosc(
        '<Timing domainAbsoluteRelative="relative" scale="1" offset="0"/>',
        """<Vertex time="0"><Position><WorldPosition x="10" y="0"/></Position></Vertex>
<Vertex time="2"><Position><WorldPosition x="20" y="0"/></Position></Vertex>
<Vertex time="1"><Position><WorldPosition x="30" y="0"/></Position></Vertex>"""))
    with pytest.raises(ValueError, match="strictly increasing"):
        parse_xosc(str(p))


def _synchronize_xosc(final_speed: str) -> str:
    """One scripted 'crosser' synchronizing its arrival at (50, 0) with the
    hero's arrival at (50, 30) — the junction-meeting shape SynchronizeAction
    exists for (OSC spec 3.87). The reference refuses this construct
    (openscenario_parser.py:1023-1024); ours runs it."""
    return f"""<?xml version="1.0"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="d" description="sync" author=""/>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="crosser">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="crosser">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="50" y="-40" z="0" h="1.5708"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="crosser"/>
        </Actors>
        <Maneuver name="m">
          <Event name="Sync" priority="overwrite">
            <Action name="Sync">
              <PrivateAction>
                <SynchronizeAction masterEntityRef="hero">
                  <TargetPositionMaster>
                    <Position><WorldPosition x="50" y="30"/></Position>
                  </TargetPositionMaster>
                  <TargetPosition>
                    <Position><WorldPosition x="50" y="0"/></Position>
                  </TargetPosition>
                  {final_speed}
                </SynchronizeAction>
              </PrivateAction>
            </Action>
          </Event>
        </Maneuver>
      </ManeuverGroup>
    </Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""


def test_synchronize_action_meets_master(tmp_path):
    """The crosser paces itself so it reaches (50, 0) when the hero (moving
    at a constant 5 m/s along y toward (50, 30)) reaches its own target;
    after arrival the absolute FinalSpeed applies."""
    p = tmp_path / "sync.xosc"
    p.write_text(_synchronize_xosc(
        '<FinalSpeed><AbsoluteSpeed value="7"/></FinalSpeed>'))
    cfg = parse_xosc(str(p))
    action = cfg.events[0].actions[0]
    assert action.kind == "sync" and action.relative_to == "hero"
    assert action.target_speed == 7.0

    mgr = OpenScenarioManager(cfg)
    dt = 0.05
    # hero drives +y at 5 m/s from (50, -50): 16 s to (50, 30); the crosser
    # has 40 m to cover -> it should settle near 40/16 = 2.5 m/s
    hero_y, speeds = -50.0, []
    crosser_arrival_t = master_arrival_t = None
    for step in range(400):                               # 20 s
        hero_y += 5.0 * dt
        actors = mgr.tick(np.array([50.0, hero_y]), dt)
        crosser = actors[0]
        speeds.append(float(np.linalg.norm(crosser.velocity)))
        t = (step + 1) * dt
        if crosser_arrival_t is None and float(np.linalg.norm(
                crosser.position - np.array([50.0, 0.0]))) < 2.5:
            crosser_arrival_t = t
        if master_arrival_t is None and hero_y >= 30.0:
            master_arrival_t = t
    # both arrive at their targets at (almost) the same moment; the slack
    # is the 2.5 m detection radius (crossed ~1 s early at ~2.5 m/s) plus
    # the 2 m reach handoff to FinalSpeed — the pacing itself is exact
    assert crosser_arrival_t is not None and master_arrival_t is not None
    assert abs(crosser_arrival_t - master_arrival_t) < 1.5
    # mid-run pace was the synchronized ~2.5 m/s, not a constant dash
    mid = speeds[len(speeds) // 3]
    assert 1.5 < mid < 3.5
    # after arrival the FinalSpeed applies
    assert abs(speeds[-1] - 7.0) < 1e-6


def test_synchronize_final_speed_relative_to_master(tmp_path):
    """FinalSpeed RelativeSpeedToMaster: on arrival the crosser adopts the
    master's live speed plus the delta."""
    p = tmp_path / "sync_rel.xosc"
    p.write_text(_synchronize_xosc(
        '<FinalSpeed><RelativeSpeedToMaster value="-1"/></FinalSpeed>'))
    cfg = parse_xosc(str(p))
    assert cfg.events[0].actions[0].final_relative is True
    mgr = OpenScenarioManager(cfg)
    dt, hero_y = 0.05, -50.0
    for _ in range(400):
        hero_y += 5.0 * dt
        actors = mgr.tick(np.array([50.0, hero_y]), dt)
    # hero speed 5 m/s, delta -1 -> final 4 m/s
    assert abs(float(np.linalg.norm(actors[0].velocity)) - 4.0) < 0.2


def test_synchronize_waits_for_parked_master(tmp_path):
    """A parked master means an unbounded ETA: the synchronized actor waits
    instead of dividing by zero or dashing ahead."""
    p = tmp_path / "sync_wait.xosc"
    p.write_text(_synchronize_xosc(
        '<FinalSpeed><AbsoluteSpeed value="7"/></FinalSpeed>'))
    cfg = parse_xosc(str(p))
    mgr = OpenScenarioManager(cfg)
    for _ in range(100):                                  # hero never moves
        actors = mgr.tick(np.array([50.0, -50.0]), 0.05)
    assert np.allclose(actors[0].position, [50.0, -40.0], atol=0.5)


def test_lane_position_resolves_through_rmap(tool, tmp_path):
    """LanePosition (roadId, laneId, s, offset) resolves through the native
    vectorizer's rmap v3 ids when parse_xosc is given the map; without a map
    it is a clear parse error. srunner resolves the same construct through
    the CARLA map API (openscenario_parser.get_position)."""
    from mmfn_tpu.mapping import RoughMap, build_rmap

    d = tmp_path / "map"
    d.mkdir()
    (d / "opstr.txt").write_text(STRAIGHT_XODR)
    assert build_rmap([str(d)], tool_path=tool) is False
    rmap = RoughMap().read(str(d / "a.rmap"))

    xosc = _story_xosc_lane_position()
    p = tmp_path / "lanepos.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p), rough_map=rmap)
    spec = cfg.entities["lead"]
    # road 0, lane -1 (center CARLA y=+1.75), s=40, offset 0.5 toward +t
    assert abs(spec.x - 40.0) < 1e-6
    assert abs(spec.y - 1.25) < 1e-6
    # relative Orientation h=0.1 adds to the lane's travel heading (0)
    assert abs(spec.yaw - 0.1) < 1e-9

    with pytest.raises(ValueError, match="vectorized map"):
        parse_xosc(str(p))


def _story_xosc_lane_position() -> str:
    return """<?xml version="1.0"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="d" description="lp" author=""/>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="lead">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="lead">
          <PrivateAction>
            <TeleportAction>
              <Position>
                <LanePosition roadId="0" laneId="-1" s="40" offset="0.5">
                  <Orientation type="relative" h="0.1"/>
                </LanePosition>
              </Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="g" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="lead"/>
        </Actors>
        <Maneuver name="m"><Event name="e" priority="overwrite">
          <Action name="go"><PrivateAction>
            <LongitudinalAction><SpeedAction>
              <SpeedActionDynamics dynamicsShape="step"/>
              <SpeedActionTarget><AbsoluteTargetSpeed value="5"/></SpeedActionTarget>
            </SpeedAction></LongitudinalAction>
          </PrivateAction></Action>
          <StartTrigger/>
        </Event></Maneuver>
      </ManeuverGroup>
    </Act></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


TWO_LANE_XODR = """<?xml version="1.0" standalone="yes"?>
<OpenDRIVE>
  <header revMajor="1" revMinor="4" name="two"/>
  <road name="R0" length="200.0" id="0" junction="-1">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="200.0"><line/></geometry>
    </planView>
    <lanes>
      <laneSection s="0.0">
        <left>
          <lane id="1" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </left>
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
    </lanes>
  </road>
</OpenDRIVE>
"""


def test_relative_positions_resolve(tool, tmp_path):
    """RelativeObjectPosition rotates dx/dy into the referenced entity's
    init frame; RelativeLanePosition locates the entity's lane through the
    rmap v3 inverse lookup, shifts dLane lanes travel-relative (dLane=+1 is
    srunner's get_right_lane(), skipping the nonexistent lane 0) and ds
    meters along the TARGET lane's travel direction."""
    from mmfn_tpu.mapping import RoughMap, build_rmap

    d = tmp_path / "map2"
    d.mkdir()
    (d / "opstr.txt").write_text(TWO_LANE_XODR)
    assert build_rmap([str(d)], tool_path=tool) is False
    rmap = RoughMap().read(str(d / "a.rmap"))

    xosc = _story_xosc_lane_position().replace(
        '<LanePosition roadId="0" laneId="-1" s="40" offset="0.5">\n'
        '                  <Orientation type="relative" h="0.1"/>\n'
        '                </LanePosition>',
        '<LanePosition roadId="0" laneId="-1" s="40" offset="0"/>')
    # second entity placed relative to the lead: 5 m ahead in the lead's
    # frame (lead heading = lane -1 travel = +x)
    xosc = xosc.replace(
        "</Actions>",
        """<Private entityRef="hero">
          <PrivateAction><TeleportAction><Position>
            <RelativeObjectPosition entityRef="lead" dx="5" dy="1"/>
          </Position></TeleportAction></PrivateAction>
        </Private>
        </Actions>""", 1)
    p = tmp_path / "relpos.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p), rough_map=rmap)
    lead = cfg.entities["lead"]
    assert abs(lead.x - 40.0) < 1e-6 and abs(lead.y - 1.75) < 1e-6
    hero = cfg.entities["hero"]
    assert abs(hero.x - 45.0) < 1e-6 and abs(hero.y - 2.75) < 1e-6

    # RelativeLanePosition: dLane=-1 is srunner's get_left_lane()
    # (openscenario_parser.py:509-524) — from right-side lane -1 it crosses
    # the centerline (no lane 0) to oncoming lane 1 at CARLA y=-1.75; ds=10
    # then walks wp.next(10) along the TARGET lane's travel (-x), so
    # x = 40 - 10
    xosc2 = xosc.replace(
        '<RelativeObjectPosition entityRef="lead" dx="5" dy="1"/>',
        '<RelativeLanePosition entityRef="lead" dLane="-1" ds="10" offset="0"/>')
    p2 = tmp_path / "rellane.xosc"
    p2.write_text(xosc2)
    cfg2 = parse_xosc(str(p2), rough_map=rmap)
    hero2 = cfg2.entities["hero"]
    assert abs(hero2.x - 30.0) < 1e-6
    assert abs(hero2.y + 1.75) < 1e-6
    # the oncoming lane travels against s: resolved heading ~ pi
    assert abs(abs(hero2.yaw) - math.pi) < 1e-6


NEW_CONSTRUCTS_XOSC = """<?xml version="1.0" encoding="UTF-8"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="2026-01-01T00:00:00"
              description="round3:GlobalActionsAndConditions" author=""/>
  <ParameterDeclarations/>
  <CatalogLocations/>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="lead">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car">
        <Properties><Property name="type" value="simulation"/></Properties>
      </Vehicle>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="hero">
          <PrivateAction><TeleportAction><Position>
            <WorldPosition x="0" y="1.75" h="0"/>
          </Position></TeleportAction></PrivateAction>
        </Private>
        <Private entityRef="lead">
          <PrivateAction><TeleportAction><Position>
            <WorldPosition x="30" y="1.75" h="0"/>
          </Position></TeleportAction></PrivateAction>
          <PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step" value="0"
                                 dynamicsDimension="time"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="8.0"/>
            </SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="mg" maximumExecutionCount="1">
        <Actors selectTriggeringEntities="false">
          <EntityRef entityRef="lead"/>
        </Actors>
        <Maneuver name="m">
          <Event name="ForceRed" priority="overwrite">
            <Action name="red"><GlobalAction>
              <InfrastructureAction><TrafficSignalAction>
                <TrafficSignalStateAction name="id=7" state="red"/>
              </TrafficSignalAction></InfrastructureAction>
            </GlobalAction></Action>
            <StartTrigger><ConditionGroup>
              <Condition name="t0" delay="0" conditionEdge="rising">
                <ByValueCondition>
                  <SimulationTimeCondition value="0.1" rule="greaterThan"/>
                </ByValueCondition>
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
          <Event name="DuskRain" priority="overwrite">
            <Action name="rain"><GlobalAction>
              <EnvironmentAction><Environment name="dusk">
                <TimeOfDay animation="false" dateTime="2026-01-01T18:30:00"/>
                <Weather cloudState="rainy">
                  <Sun intensity="0.2" azimuth="0" elevation="0.05"/>
                  <Precipitation precipitationType="rain" intensity="0.7"/>
                </Weather>
              </Environment></EnvironmentAction>
            </GlobalAction></Action>
            <StartTrigger><ConditionGroup>
              <Condition name="dusk" delay="0" conditionEdge="rising">
                <ByValueCondition>
                  <TimeOfDayCondition dateTime="2026-01-01T18:00:00"
                                      rule="greaterThan"/>
                </ByValueCondition>
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
          <Event name="LeadBrakes" priority="overwrite">
            <Action name="stop"><PrivateAction><LongitudinalAction>
              <SpeedAction>
                <SpeedActionDynamics dynamicsShape="linear" value="2.0"
                                     dynamicsDimension="rate"/>
                <SpeedActionTarget><AbsoluteTargetSpeed value="0.0"/>
                </SpeedActionTarget>
              </SpeedAction>
            </LongitudinalAction></PrivateAction></Action>
            <StartTrigger><ConditionGroup>
              <Condition name="rel" delay="0" conditionEdge="rising">
                <ByEntityCondition>
                  <TriggeringEntities triggeringEntitiesRule="any">
                    <EntityRef entityRef="lead"/>
                  </TriggeringEntities>
                  <EntityCondition>
                    <RelativeSpeedCondition entityRef="hero" value="3.0"
                                            rule="greaterThan"/>
                  </EntityCondition>
                </ByEntityCondition>
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
          <Event name="HardBrakeSeen" priority="overwrite">
            <Action name="noop"><PrivateAction><LongitudinalAction>
              <SpeedAction>
                <SpeedActionDynamics dynamicsShape="step" value="0"
                                     dynamicsDimension="time"/>
                <SpeedActionTarget><AbsoluteTargetSpeed value="0.0"/>
                </SpeedActionTarget>
              </SpeedAction>
            </LongitudinalAction></PrivateAction></Action>
            <StartTrigger><ConditionGroup>
              <Condition name="acc" delay="0" conditionEdge="rising">
                <ByEntityCondition>
                  <TriggeringEntities triggeringEntitiesRule="any">
                    <EntityRef entityRef="lead"/>
                  </TriggeringEntities>
                  <EntityCondition>
                    <AccelerationCondition value="1.5" rule="greaterThan"/>
                  </EntityCondition>
                </ByEntityCondition>
              </Condition>
            </ConditionGroup></StartTrigger>
          </Event>
        </Maneuver>
      </ManeuverGroup>
      <StartTrigger/>
    </Act></Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


def test_global_actions_and_new_conditions(tmp_path):
    """Round-3 OSC constructs: story-level TrafficSignalStateAction +
    EnvironmentAction (applied to the auto-wirable world services), and the
    TimeOfDay / RelativeSpeed / Acceleration conditions — all parse without
    UnsupportedOsc and drive the story."""
    import warnings

    from mmfn_tpu.harness.openscenario import UnsupportedOsc
    from mmfn_tpu.harness.traffic import SignalSet, TrafficLight
    from mmfn_tpu.harness.weather import WeatherSim

    p = tmp_path / "new_constructs.xosc"
    p.write_text(NEW_CONSTRUCTS_XOSC)
    with warnings.catch_warnings():
        warnings.simplefilter("error", category=UnsupportedOsc)
        cfg = parse_xosc(str(p))

    class _World:
        weather = "ClearNoon"

        def set_weather(self, preset, sun_altitude_deg=None):
            self.weather = preset

    mgr = OpenScenarioManager(cfg)
    light = TrafficLight(position=np.array([50.0, 1.75]), yaw=0.0,
                         light_id=7)
    mgr.signals = SignalSet(lights=[light])
    # weather clock compressed: 1 sim second = 1 clock hour, starting 17:54
    ws = WeatherSim(preset="ClearNoon", animation=False, start_hour=17.9,
                    time_scale=3600.0)
    world = _World()
    mgr.weather_sim, mgr.world = ws, world

    ego = np.array([0.0, 1.75])
    t = 0.0
    for _ in range(400):
        ws.update(t)                      # replay.py's per-tick update
        mgr.tick(ego, 0.05)
        t += 0.05
        if len(mgr.fired_events) >= 4:
            break
    assert "ForceRed" in mgr.fired_events
    assert light.forced_state == "red"
    assert light.state(mgr.time) == "red"
    assert "DuskRain" in mgr.fired_events           # clock passed 18:00
    assert ws.preset == "HardRainSunset"            # sim retargeted...
    assert world.weather == "HardRainSunset"        # ...and world pushed
    assert "LeadBrakes" in mgr.fired_events         # relspeed 8 - 0 > 3
    assert "HardBrakeSeen" in mgr.fired_events      # |decel| 2 > 1.5


# --------------------------------------------------------------------------- #
# ByValueCondition: ParameterCondition + StoryboardElementStateCondition
# (srunner openscenario_parser.py:815-861 / OSCStartEndCondition)
# --------------------------------------------------------------------------- #

ELEMENT_STATE_XOSC = """<?xml version="1.0" encoding="UTF-8"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="2026-01-01T00:00:00"
              description="element-state-test" author=""/>
  <ParameterDeclarations>
    <ParameterDeclaration name="phase" parameterType="string" value="demo"/>
    <ParameterDeclaration name="nLaps" parameterType="int" value="3"/>
  </ParameterDeclarations>
  <CatalogLocations/>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="lead">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="lead">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="40" y="1.75" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="Story">
      <Act name="MainAct">
        <ManeuverGroup name="Lead" maximumExecutionCount="1">
          <Actors selectTriggeringEntities="false">
            <EntityRef entityRef="lead"/>
          </Actors>
          <Maneuver name="LeadManeuver">
            <Event name="Accelerate" priority="overwrite">
              <Action name="Accelerate">
                <PrivateAction>
                  <LongitudinalAction><SpeedAction>
                    <SpeedActionDynamics dynamicsShape="linear" value="2"
                                         dynamicsDimension="rate"/>
                    <SpeedActionTarget>
                      <AbsoluteTargetSpeed value="4"/>
                    </SpeedActionTarget>
                  </SpeedAction></LongitudinalAction>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="RightPhase" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <ParameterCondition parameterRef="phase" value="demo"
                                          rule="equalTo"/>
                    </ByValueCondition>
                  </Condition>
                  <Condition name="EnoughLaps" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <ParameterCondition parameterRef="nLaps" value="2"
                                          rule="greaterThan"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
            <Event name="AfterAccel" priority="parallel">
              <Action name="AfterAccel">
                <PrivateAction>
                  <LateralAction><LaneChangeAction>
                    <LaneChangeActionDynamics dynamicsShape="sinusoidal"
                        value="2" dynamicsDimension="time"/>
                    <LaneChangeTarget>
                      <RelativeTargetLane entityRef="lead" value="1"/>
                    </LaneChangeTarget>
                  </LaneChangeAction></LateralAction>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="AccelDone" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <StoryboardElementStateCondition
                          storyboardElementType="event"
                          storyboardElementRef="Accelerate"
                          state="completeState"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
            <Event name="WrongPhase" priority="parallel">
              <Action name="WrongPhase">
                <PrivateAction>
                  <LongitudinalAction><SpeedAction>
                    <SpeedActionDynamics dynamicsShape="step" value="0"
                                         dynamicsDimension="time"/>
                    <SpeedActionTarget>
                      <AbsoluteTargetSpeed value="0"/>
                    </SpeedActionTarget>
                  </SpeedAction></LongitudinalAction>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="OtherPhase" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <ParameterCondition parameterRef="phase" value="other"
                                          rule="equalTo"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
          </Maneuver>
          <Maneuver name="Followup">
            <Event name="ManeuverStarted" priority="parallel">
              <Action name="ManeuverStarted">
                <PrivateAction>
                  <VisibilityAction graphics="true" traffic="true"
                                    sensors="false"/>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="LeadManeuverRuns" delay="0"
                             conditionEdge="rising">
                    <ByValueCondition>
                      <StoryboardElementStateCondition
                          storyboardElementType="maneuver"
                          storyboardElementRef="LeadManeuver"
                          state="startTransition"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
          </Maneuver>
        </ManeuverGroup>
      </Act>
    </Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


def test_parameter_and_element_state_conditions(tmp_path):
    """ParameterCondition folds to a parse-time constant; a
    StoryboardElementStateCondition chains one event off another's
    completion (srunner OSCStartEndCondition rule=END semantics)."""
    import warnings

    from mmfn_tpu.harness.openscenario import UnsupportedOsc

    p = tmp_path / "elemstate.xosc"
    p.write_text(ELEMENT_STATE_XOSC)
    with warnings.catch_warnings():
        # every construct here is in the subset — no UnsupportedOsc allowed
        warnings.simplefilter("error", category=UnsupportedOsc)
        cfg = parse_xosc(str(p))
    by_name = {e.name: e for e in cfg.events}
    assert by_name["Accelerate"].maneuver == "LeadManeuver"
    assert by_name["Accelerate"].act_name == "MainAct"
    # both parameter comparisons (string equalTo + numeric greaterThan)
    # folded true at parse time
    assert all(c.kind == "parameter" and c.value == 1.0
               for c in by_name["Accelerate"].trigger[0])
    assert by_name["WrongPhase"].trigger[0][0].value == 0.0

    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    mgr.tick(ego, 0.05)
    # tick 1: Accelerate fired (parameter conditions hold); AfterAccel must
    # NOT fire yet — the rate-limited speed action (0 -> 4 m/s at 2 m/s^2)
    # takes ~2 s; ManeuverStarted sees LeadManeuver in startTransition
    assert "Accelerate" in mgr.fired_events
    assert "ManeuverStarted" in mgr.fired_events
    assert "AfterAccel" not in mgr.fired_events
    assert "WrongPhase" not in mgr.fired_events
    for _ in range(36):                    # t = 1.85 s: still accelerating
        mgr.tick(ego, 0.05)
    assert "AfterAccel" not in mgr.fired_events
    for _ in range(8):                     # past 2 s: target speed reached
        mgr.tick(ego, 0.05)
    assert "AfterAccel" in mgr.fired_events
    assert "WrongPhase" not in mgr.fired_events
    lead = mgr.scripted["lead"]
    assert abs(lead.speed - 4.0) < 0.05    # reached the rate-limited target
    assert lead.actor.visible_sensors is False   # ManeuverStarted applied


def test_element_state_running_and_unsupported_state_warns(tmp_path):
    """runningState holds only between start and completion; an unmapped
    state (e.g. standbyState) degrades to the loud unsupported path."""
    import warnings

    from mmfn_tpu.harness.openscenario import UnsupportedOsc

    xosc = ELEMENT_STATE_XOSC.replace('state="completeState"',
                                      'state="runningState"')
    p = tmp_path / "running.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p))
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    mgr.tick(ego, 0.05)
    mgr.tick(ego, 0.05)
    # AfterAccel now fires WHILE Accelerate is still executing
    assert "AfterAccel" in mgr.fired_events

    bad = ELEMENT_STATE_XOSC.replace('state="completeState"',
                                     'state="standbyState"')
    p2 = tmp_path / "standby.xosc"
    p2.write_text(bad)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        parse_xosc(str(p2))
    assert any(issubclass(x.category, UnsupportedOsc) for x in w)


def test_act_stop_trigger_cancels_act(tmp_path):
    """An Act's StopTrigger terminates the act: in-flight transitional
    actions halt where they are and the act's remaining events never fire
    (srunner terminates the act's parallel composite the same way,
    open_scenario.py:364-370)."""
    xosc = ELEMENT_STATE_XOSC.replace(
        """        </ManeuverGroup>
      </Act>""",
        """        </ManeuverGroup>
        <StopTrigger>
          <ConditionGroup>
            <Condition name="ActEnds" delay="0" conditionEdge="rising">
              <ByValueCondition>
                <SimulationTimeCondition value="1" rule="greaterThan"/>
              </ByValueCondition>
            </Condition>
          </ConditionGroup>
        </StopTrigger>
      </Act>""")
    assert xosc != ELEMENT_STATE_XOSC
    p = tmp_path / "actstop.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p))
    assert cfg.events[0].act_stop            # parsed onto the events
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    for _ in range(120):                     # 6 s, stop fires at t=1
        mgr.tick(ego, 0.05)
    lead = mgr.scripted["lead"]
    # the 0 -> 4 m/s @ 2 m/s^2 ramp was cancelled at ~1 s: speed froze
    # around 2 m/s and never reached the target
    assert 1.8 <= lead.speed <= 2.2, lead.speed
    assert lead.speed == lead.target_speed   # pursuit released
    # the act's gated lane change never fired, even though the cancelled
    # speed action now reports complete (stopTransition ends the element)
    assert "AfterAccel" not in mgr.fired_events
    assert "Accelerate" in mgr.fired_events


def test_act_stop_trigger_inert_before_start(tmp_path):
    """A StopTrigger on a NOT-yet-started act is inert — srunner's stop
    conditions only tick inside the started act's composite."""
    xosc = ELEMENT_STATE_XOSC.replace(
        '<Act name="MainAct">',
        """<Act name="MainAct">
        <StartTrigger>
          <ConditionGroup>
            <Condition name="ActStarts" delay="0" conditionEdge="rising">
              <ByValueCondition>
                <SimulationTimeCondition value="3" rule="greaterThan"/>
              </ByValueCondition>
            </Condition>
          </ConditionGroup>
        </StartTrigger>""").replace(
        """        </ManeuverGroup>
      </Act>""",
        """        </ManeuverGroup>
        <StopTrigger>
          <ConditionGroup>
            <Condition name="ActEnds" delay="0" conditionEdge="rising">
              <ByValueCondition>
                <SimulationTimeCondition value="1" rule="greaterThan"/>
              </ByValueCondition>
            </Condition>
          </ConditionGroup>
        </StopTrigger>
      </Act>""")
    p = tmp_path / "actstop2.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p))
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    for _ in range(50):                      # t = 2.5 s: act not started,
        mgr.tick(ego, 0.05)                  # stop (t>1) must stay inert
    assert mgr.scripted["lead"].speed == 0.0
    assert "Accelerate" not in mgr.fired_events
    assert not mgr._stopped_acts
    for _ in range(20):                      # t = 3.5 s: act starts, and the
        mgr.tick(ego, 0.05)                  # already-true stop kills it
    assert "MainAct" in mgr._stopped_acts


REPEAT_XOSC = """<?xml version="1.0" encoding="UTF-8"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="2026-01-01T00:00:00"
              description="repetition-test" author=""/>
  <CatalogLocations/>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="lead">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="lead">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="40" y="1.75" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="Story">
      <Act name="MainAct">
        <ManeuverGroup name="Lead" maximumExecutionCount="2">
          <Actors selectTriggeringEntities="false">
            <EntityRef entityRef="lead"/>
          </Actors>
          <Maneuver name="LeadManeuver">
            <Event name="Shift" priority="parallel">
              <Action name="Shift">
                <PrivateAction>
                  <LateralAction><LaneChangeAction>
                    <LaneChangeActionDynamics dynamicsShape="sinusoidal"
                        value="2" dynamicsDimension="time"/>
                    <LaneChangeTarget>
                      <RelativeTargetLane entityRef="lead" value="1"/>
                    </LaneChangeTarget>
                  </LaneChangeAction></LateralAction>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="Soon" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <SimulationTimeCondition value="0.5" rule="greaterThan"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
          </Maneuver>
        </ManeuverGroup>
      </Act>
    </Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


def test_maneuver_group_maximum_execution_count(tmp_path):
    """maximumExecutionCount repeats the group in sequence: each iteration
    re-fires its events once their previous run completed (srunner repeats
    the group subtree, open_scenario.py:271). Two iterations of a +1
    relative-lane change accumulate two 3.5 m shifts."""
    p = tmp_path / "repeat.xosc"
    p.write_text(REPEAT_XOSC)
    cfg = parse_xosc(str(p))
    assert all(e.max_exec == 2 for e in cfg.events)
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    y0 = float(mgr.scripted["lead"].actor.position[1])
    for _ in range(200):                   # 10 s: 2x (trigger + 2 s shift)
        mgr.tick(ego, 0.05)
    lead = mgr.scripted["lead"]
    # two full 3.5 m shifts, the second only after the first completed
    assert abs(abs(float(lead.actor.position[1]) - y0) - 7.0) < 0.3, \
        lead.actor.position
    assert mgr._count[0] == 2

    # a group stalls (srunner SUCCESS_ON_ALL) if an event can't complete —
    # capped by max_exec: no third shift ever happens
    for _ in range(200):
        mgr.tick(ego, 0.05)
    assert abs(abs(float(lead.actor.position[1]) - y0) - 7.0) < 0.3


def test_maximum_execution_count_one_fires_once(tmp_path):
    """The default single execution is unchanged: one firing per event."""
    p = tmp_path / "once.xosc"
    p.write_text(ELEMENT_STATE_XOSC)
    cfg = parse_xosc(str(p))
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    y0 = float(mgr.scripted["lead"].actor.position[1])
    for _ in range(300):
        mgr.tick(ego, 0.05)
    lead = mgr.scripted["lead"]
    assert abs(abs(float(lead.actor.position[1]) - y0) - 3.5) < 0.3
    assert max(mgr._count.values()) == 1


def test_maneuver_group_element_ref_matches_group_name(tmp_path):
    """A storyboardElementType='maneuverGroup' ref resolves against the
    ManeuverGroup NAME ('Lead'), not the Maneuver name ('LeadManeuver') —
    srunner registers group names as their own element type
    (openscenario_parser.py:850-861). A maneuverGroup ref that only matches
    a maneuver name resolves to nothing and keeps its event gated."""
    xosc = ELEMENT_STATE_XOSC.replace(
        'storyboardElementType="maneuver"\n'
        '                          storyboardElementRef="LeadManeuver"',
        'storyboardElementType="maneuverGroup"\n'
        '                          storyboardElementRef="Lead"')
    assert xosc != ELEMENT_STATE_XOSC
    p = tmp_path / "groupref.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p))
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    mgr.tick(ego, 0.05)
    # the group started (Accelerate fired), so the group-ref condition holds
    assert "Accelerate" in mgr.fired_events
    assert "ManeuverStarted" in mgr.fired_events

    # referencing the MANEUVER's name as a maneuverGroup matches nothing
    wrong = ELEMENT_STATE_XOSC.replace(
        'storyboardElementType="maneuver"\n'
        '                          storyboardElementRef="LeadManeuver"',
        'storyboardElementType="maneuverGroup"\n'
        '                          storyboardElementRef="LeadManeuver"')
    p2 = tmp_path / "groupref_wrong.xosc"
    p2.write_text(wrong)
    mgr2 = OpenScenarioManager(parse_xosc(str(p2)))
    for _ in range(40):
        mgr2.tick(ego, 0.05)
    assert "ManeuverStarted" not in mgr2.fired_events


def test_parameter_condition_not_equal_numeric(tmp_path):
    """Numeric ParameterCondition rule='notEqualTo' must not fold to
    greaterThan: nLaps=3 vs 3 is False, vs 2 is True; an undeclared
    parameterRef warns and never holds."""
    import warnings

    ne_same = ELEMENT_STATE_XOSC.replace(
        'parameterRef="nLaps" value="2"\n'
        '                                          rule="greaterThan"',
        'parameterRef="nLaps" value="3"\n'
        '                                          rule="notEqualTo"')
    assert ne_same != ELEMENT_STATE_XOSC
    p = tmp_path / "ne_same.xosc"
    p.write_text(ne_same)
    cfg = parse_xosc(str(p))
    by_name = {e.name: e for e in cfg.events}
    assert any(c.kind == "parameter" and c.value == 0.0
               for c in by_name["Accelerate"].trigger[0])

    ne_diff = ELEMENT_STATE_XOSC.replace(
        'parameterRef="nLaps" value="2"\n'
        '                                          rule="greaterThan"',
        'parameterRef="nLaps" value="2"\n'
        '                                          rule="notEqualTo"')
    p2 = tmp_path / "ne_diff.xosc"
    p2.write_text(ne_diff)
    cfg2 = parse_xosc(str(p2))
    by_name2 = {e.name: e for e in cfg2.events}
    assert all(c.value == 1.0 for c in by_name2["Accelerate"].trigger[0])

    missing = ELEMENT_STATE_XOSC.replace('parameterRef="nLaps"',
                                         'parameterRef="noSuchParam"')
    p3 = tmp_path / "missing_param.xosc"
    p3.write_text(missing)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg3 = parse_xosc(str(p3))
    assert any("undeclared parameter" in str(x.message) for x in w)
    by_name3 = {e.name: e for e in cfg3.events}
    assert any(c.kind == "parameter" and c.value == 0.0
               for c in by_name3["Accelerate"].trigger[0])


LEAK_XOSC = """<?xml version="1.0" encoding="UTF-8"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" date="2026-01-01T00:00:00"
              description="end-state-leak-test" author=""/>
  <CatalogLocations/>
  <RoadNetwork><LogicFile filepath="TownTest"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz2017" vehicleCategory="car">
        <Properties><Property name="type" value="ego_vehicle"/></Properties>
      </Vehicle>
    </ScenarioObject>
    <ScenarioObject name="lead">
      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="lead">
          <PrivateAction>
            <TeleportAction>
              <Position><WorldPosition x="40" y="1.75" h="0"/></Position>
            </TeleportAction>
          </PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="Story">
      <Act name="MainAct">
        <ManeuverGroup name="Lead" maximumExecutionCount="2">
          <Actors selectTriggeringEntities="false">
            <EntityRef entityRef="lead"/>
          </Actors>
          <Maneuver name="LeadManeuver">
            <Event name="SpeedUp" priority="overwrite">
              <Action name="SpeedUp">
                <PrivateAction>
                  <LongitudinalAction><SpeedAction>
                    <SpeedActionDynamics dynamicsShape="linear" value="2"
                                         dynamicsDimension="rate"/>
                    <SpeedActionTarget>
                      <AbsoluteTargetSpeed value="2"/>
                    </SpeedActionTarget>
                  </SpeedAction></LongitudinalAction>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="Soon" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <SimulationTimeCondition value="0.2" rule="greaterThan"/>
                    </ByValueCondition>
                  </Condition>
                  <Condition name="StillSlow" delay="0" conditionEdge="rising">
                    <ByEntityCondition>
                      <TriggeringEntities triggeringEntitiesRule="any">
                        <EntityRef entityRef="lead"/>
                      </TriggeringEntities>
                      <EntityCondition>
                        <SpeedCondition value="1" rule="lessThan"/>
                      </EntityCondition>
                    </ByEntityCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
            <Event name="Shift" priority="parallel">
              <Action name="Shift">
                <PrivateAction>
                  <LateralAction><LaneChangeAction>
                    <LaneChangeActionDynamics dynamicsShape="sinusoidal"
                        value="2" dynamicsDimension="time"/>
                    <LaneChangeTarget>
                      <RelativeTargetLane entityRef="lead" value="1"/>
                    </LaneChangeTarget>
                  </LaneChangeAction></LateralAction>
                </PrivateAction>
              </Action>
              <StartTrigger>
                <ConditionGroup>
                  <Condition name="SpedUp" delay="0" conditionEdge="rising">
                    <ByValueCondition>
                      <StoryboardElementStateCondition
                          storyboardElementType="event"
                          storyboardElementRef="SpeedUp"
                          state="completeState"/>
                    </ByValueCondition>
                  </Condition>
                </ConditionGroup>
              </StartTrigger>
            </Event>
          </Maneuver>
        </ManeuverGroup>
      </Act>
    </Story>
    <StopTrigger/>
  </Storyboard>
</OpenSCENARIO>
"""


def test_element_end_state_does_not_leak_across_iterations(tmp_path):
    """After a ManeuverGroup iteration advances, an event's completeState
    from the PREVIOUS iteration must not satisfy downstream element_state
    'end' gates before the event re-fires in the new one (srunner's
    OSCStartEndCondition only reacts to transitions it observes). Here
    SpeedUp can never re-fire in iteration 2 (the lead is no longer slow),
    so Shift must fire exactly once."""
    p = tmp_path / "leak.xosc"
    p.write_text(LEAK_XOSC)
    cfg = parse_xosc(str(p))
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    y0 = float(mgr.scripted["lead"].actor.position[1])
    for _ in range(300):                   # 15 s: iter 1 completes fully
        mgr.tick(ego, 0.05)
    lead = mgr.scripted["lead"]
    by_name = {e.name: i for i, e in enumerate(cfg.events)}
    assert mgr._count[by_name["SpeedUp"]] == 1
    # the leak would re-fire Shift in iteration 2 -> a second 3.5 m shift
    assert mgr._count[by_name["Shift"]] == 1
    assert abs(abs(float(lead.actor.position[1]) - y0) - 3.5) < 0.3


def test_road_position_resolves_through_rmap(tool, tmp_path):
    """RoadPosition (roadId, s, t) resolves against the road reference line
    reconstructed from the innermost lane's centerline + width columns
    (the last OSC position kind: srunner converts it via the CARLA map API,
    openscenario_parser.py:548-550). t=0 is the reference line, negative t
    the right-side lanes (CARLA y-flip: lane -1 center at y=+1.75)."""
    from mmfn_tpu.mapping import RoughMap, build_rmap
    from mmfn_tpu.mapping.rough_map import (resolve_road_position,
                                            road_position_of)

    d = tmp_path / "map"
    d.mkdir()
    (d / "opstr.txt").write_text(TWO_LANE_XODR)
    assert build_rmap([str(d)], tool_path=tool) is False
    rmap = RoughMap().read(str(d / "a.rmap"))

    x, y, yaw = resolve_road_position(rmap, "0", 40.0, 0.0)
    assert abs(x - 40.0) < 1e-6 and abs(y) < 1e-6      # reference line
    assert abs(yaw) < 1e-9                             # +s direction
    x, y, _ = resolve_road_position(rmap, "0", 60.0, -1.75)
    assert abs(x - 60.0) < 1e-6 and abs(y - 1.75) < 1e-6   # lane -1 center
    x, y, _ = resolve_road_position(rmap, "0", 60.0, 1.75)
    assert abs(y + 1.75) < 1e-6                        # lane +1 center

    # inverse: world point -> (road, s, t) round-trips
    road_id, s, t = road_position_of(rmap, 75.0, 1.0)
    assert road_id == "0"
    assert abs(s - 75.0) < 0.51     # node sampling granularity
    assert abs(t + 1.0) < 1e-6      # CARLA y=+1 is t=-1

    with pytest.raises(ValueError):
        resolve_road_position(rmap, "0", 1e6, 0.0)
    with pytest.raises(KeyError):
        resolve_road_position(rmap, "99", 10.0, 0.0)


def test_road_position_scenario_runs(tool, tmp_path):
    """A storyboard using RoadPosition (init teleport) and
    RelativeRoadPosition (acquire target) parses and drives: the lead spawns
    on the reference-line t-offset and chases a point ds ahead of itself."""
    from mmfn_tpu.mapping import RoughMap, build_rmap

    d = tmp_path / "map"
    d.mkdir()
    (d / "opstr.txt").write_text(TWO_LANE_XODR)
    assert build_rmap([str(d)], tool_path=tool) is False
    rmap = RoughMap().read(str(d / "a.rmap"))

    xosc = _story_xosc_lane_position().replace(
        """<LanePosition roadId="0" laneId="-1" s="40" offset="0.5">
                  <Orientation type="relative" h="0.1"/>
                </LanePosition>""",
        '<RoadPosition roadId="0" s="40" t="-1.75"/>')
    xosc = xosc.replace(
        """<Action name="go"><PrivateAction>
            <LongitudinalAction><SpeedAction>
              <SpeedActionDynamics dynamicsShape="step"/>
              <SpeedActionTarget><AbsoluteTargetSpeed value="5"/></SpeedActionTarget>
            </SpeedAction></LongitudinalAction>
          </PrivateAction></Action>""",
        """<Action name="go"><PrivateAction>
            <LongitudinalAction><SpeedAction>
              <SpeedActionDynamics dynamicsShape="step"/>
              <SpeedActionTarget><AbsoluteTargetSpeed value="5"/></SpeedActionTarget>
            </SpeedAction></LongitudinalAction>
          </PrivateAction></Action>
          <Action name="chase"><PrivateAction>
            <RoutingAction><AcquirePositionAction>
              <Position><RelativeRoadPosition entityRef="lead" ds="30" dt="0"/></Position>
            </AcquirePositionAction></RoutingAction>
          </PrivateAction></Action>""")
    p = tmp_path / "roadpos.xosc"
    p.write_text(xosc)
    cfg = parse_xosc(str(p), rough_map=rmap)
    spec = cfg.entities["lead"]
    assert abs(spec.x - 40.0) < 1e-6
    assert abs(spec.y - 1.75) < 1e-6    # t=-1.75 -> lane -1 center
    mgr = OpenScenarioManager(cfg)
    ego = np.array([0.0, 1.75])
    for _ in range(40):
        mgr.tick(ego, 0.05)
    lead = mgr.scripted["lead"]
    assert "e" in mgr.fired_events
    # chasing the RelativeRoadPosition goal 30 m down its own road coords
    assert float(lead.actor.position[0]) > 41.0
    assert abs(float(lead.actor.position[1]) - 1.75) < 0.5

    with pytest.raises(ValueError, match="vectorized map"):
        parse_xosc(str(p))


def test_running_state_false_between_group_iterations(tmp_path):
    """An event that completed its run and is parked awaiting re-fire in the
    next ManeuverGroup iteration is STANDBY, not running: a runningState
    gate must not hold during the gap (srunner parks repeated elements in
    standbyState until the restart transition), and an 'end' gate must not
    hold either (the previous iteration's completion is consumed)."""
    xosc = REPEAT_XOSC.replace(
        """<ByValueCondition>
                      <SimulationTimeCondition value="0.5" rule="greaterThan"/>
                    </ByValueCondition>""",
        """<ByEntityCondition>
                      <TriggeringEntities triggeringEntitiesRule="any">
                        <EntityRef entityRef="hero"/>
                      </TriggeringEntities>
                      <EntityCondition>
                        <RelativeDistanceCondition entityRef="lead"
                            freespace="false"
                            relativeDistanceType="cartesianDistance"
                            value="15" rule="lessThan"/>
                      </EntityCondition>
                    </ByEntityCondition>""")
    assert xosc != REPEAT_XOSC
    p = tmp_path / "refire_gap.xosc"
    p.write_text(xosc)
    mgr = OpenScenarioManager(parse_xosc(str(p)))
    cond_running = XoscCondition("element_state", entity="Shift",
                                 rule="event", state="running")
    cond_end = XoscCondition("element_state", entity="Shift",
                             rule="event", state="end")
    near = np.array([30.0, 1.75])            # <15 m from lead at x=40
    far = np.array([0.0, 1.75])              # trigger false here

    # approach the lead -> iteration 1 fires; retreat while the 2 s shift
    # completes, so the trigger is FALSE at the moment the group advances
    for _ in range(5):
        mgr.tick(near, 0.05)
    assert mgr._count[0] == 1
    for _ in range(60):                      # 3 s: shift completes far away
        mgr.tick(far, 0.05)
    assert 0 in mgr._pending_refire
    # the gap: the event is parked awaiting re-fire — neither running
    # nor ended
    assert not mgr._holds(cond_running, far)
    assert not mgr._holds(cond_end, far)

    # approach again -> iteration 2 fires; while the shift executes it IS
    # running (and not ended)
    for _ in range(5):
        mgr.tick(near, 0.05)
    assert mgr._count[0] == 2
    assert mgr._holds(cond_running, near)
    assert not mgr._holds(cond_end, near)
