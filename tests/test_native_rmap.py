"""Integration tests for the native OpenDRIVE -> .rmap vectorizer."""

import math
import subprocess

import numpy as np

from mmfn_tpu.mapping import RoughMap, build_rmap

_XODR_TEMPLATE = """<?xml version="1.0" standalone="yes"?>
<OpenDRIVE>
  <header revMajor="1" revMinor="4" name="test"/>
  {roads}
</OpenDRIVE>
"""

_STRAIGHT = """
  <road name="R0" length="100.0" id="0" junction="-1">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="100.0"><line/></geometry>
    </planView>
    <lanes>
      <laneSection s="0.0">
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
          <lane id="-2" type="sidewalk" level="false">
            <width sOffset="0.0" a="2.0" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
    </lanes>
  </road>
"""

# quarter-circle arc of radius 50, in a junction, with a traffic light
_ARC = """
  <road name="R1" length="{arclen}" id="1" junction="5">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="{arclen}">
        <arc curvature="0.02"/>
      </geometry>
    </planView>
    <lanes>
      <laneSection s="0.0">
        <center><lane id="0" type="none" level="false"/></center>
        <left>
          <lane id="1" type="driving" level="false">
            <width sOffset="0.0" a="4.0" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </left>
      </laneSection>
    </lanes>
    <signals>
      <signal s="10.0" t="-4" id="99" name="light" dynamic="yes" type="1000001"
              subtype="-1" orientation="+"/>
    </signals>
  </road>
""".format(arclen=50 * math.pi / 2)


def _run_tool(tool, tmp_path, roads_xml):
    d = tmp_path / "map"
    d.mkdir()
    (d / "opstr.txt").write_text(_XODR_TEMPLATE.format(roads=roads_xml))
    proc = subprocess.run([tool, str(d)], capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.rstrip().endswith("ok")
    return RoughMap().read(str(d / "a.rmap")), d


def test_straight_road_geometry(tool, tmp_path):
    rmap, _ = _run_tool(tool, tmp_path, _STRAIGHT)
    # only the driving lane is vectorized (sidewalk skipped); 21 samples ->
    # 3 chunks with shared boundary nodes (seamless tiling)
    assert len(rmap.lanes) == 3
    # consecutive chunks share their boundary node
    np.testing.assert_allclose(rmap.lanes[0].nodes[-1], rmap.lanes[1].nodes[0])
    nodes = rmap.lanes[0].nodes
    # right lane center at t=-1.75 (xodr) -> CARLA y = +1.75
    np.testing.assert_allclose(nodes[:, 1], 1.75)
    np.testing.assert_allclose(nodes[:, 0], np.arange(10) * 5.0)
    # attrs: not a junction, no signals, straight
    assert np.all(nodes[:, 2] == 0) and np.all(nodes[:, 3] == 0) and np.all(nodes[:, 4] == 0)


def test_arc_junction_signal(tool, tmp_path):
    rmap, _ = _run_tool(tool, tmp_path, _ARC)
    assert len(rmap.lanes) >= 1
    nodes = rmap.lanes[0].nodes
    # left lane (id 1) at t=+2.0: radius from arc center (xodr center (0,50))
    # CARLA frame: y flipped -> center (0,-50); lane radius = 50-2 = 48
    center = np.array([0.0, -50.0])
    radii = np.linalg.norm(nodes[:, :2] - center, axis=1)
    np.testing.assert_allclose(radii, 48.0, atol=0.05)
    assert np.all(nodes[:, 2] == 1)   # junction
    # traffic control is signal-local: the light sits at s=10, so exactly the
    # nodes within the +-15 m window (arc length from the road start (0,0))
    # are controlled, wherever chunking/reversal puts them
    all_nodes = np.concatenate([l.nodes for l in rmap.lanes])
    controlled = all_nodes[all_nodes[:, 4] == 1]
    uncontrolled = all_nodes[all_nodes[:, 4] == 0]
    assert len(controlled) and len(uncontrolled)
    # chord distance from the road start for arc length 25 on R=48: ~24.7
    start = np.array([0.0, 0.0])
    assert np.linalg.norm(controlled[:, :2] - start, axis=1).max() < 25.0
    assert np.linalg.norm(uncontrolled[:, :2] - start, axis=1).min() > 24.0
    # xodr CCW arc + CARLA y-flip = right turn along road s; the left lane
    # travels against s, so in ITS direction of travel it is a left turn
    assert np.all(nodes[:, 3] == 1)


def test_crop_pipeline_end_to_end(tool, tmp_path):
    rmap, _ = _run_tool(tool, tmp_path, _STRAIGHT + _ARC)
    lanes, n = rmap.process_padded([10.0, 1.75, 0.0], max_lanes=16)
    assert n >= 1
    assert lanes.shape == (16, 10, 5)
    # nearest node of the straight lane should be ~at the ego origin
    d = np.linalg.norm(lanes[:n, :, :2].reshape(-1, 2), axis=1)
    assert d.min() < 1e-6


def test_build_rmap_driver(tool, tmp_path):
    d = tmp_path / "drv"
    d.mkdir()
    (d / "opstr.txt").write_text(_XODR_TEMPLATE.format(roads=_STRAIGHT))
    assert build_rmap([str(d)], tool_path=tool) is False  # False = no error
    assert (d / "a.rmap").exists()


_SPIRAL = """
  <road name="R2" length="60.0" id="2" junction="-1">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="60.0">
        <spiral curvStart="0.0" curvEnd="0.04"/>
      </geometry>
    </planView>
    <lanes>
      <laneSection s="0.0">
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="3.0" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
    </lanes>
  </road>
"""

_PARAMPOLY = """
  <road name="R3" length="50.0" id="3" junction="-1">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="50.0">
        <paramPoly3 aU="0" bU="50" cU="0" dU="0" aV="0" bV="0" cV="8" dV="0"
                    pRange="normalized"/>
      </geometry>
    </planView>
    <lanes>
      <laneSection s="0.0">
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="3.0" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
    </lanes>
  </road>
"""

_OFFSET_SECTIONS = """
  <road name="R4" length="100.0" id="4" junction="-1">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="100.0"><line/></geometry>
    </planView>
    <lanes>
      <laneOffset s="0.0" a="1.0" b="0.0" c="0.0" d="0.0"/>
      <laneSection s="0.0">
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="4.0" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
      <laneSection s="50.0">
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="2.0" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
    </lanes>
  </road>
"""


def _spiral_lane_node(curv_end, length, s, t):
    """Numerically integrate the clothoid and offset laterally by t; returns
    the expected node in the CARLA (y-flipped) frame."""
    n = 20000
    ds = s / n
    x = y = 0.0
    dk = curv_end / length
    for i in range(n):
        si = (i + 0.5) * ds
        h = dk * si * si / 2.0
        x += ds * math.cos(h)
        y += ds * math.sin(h)
    h = dk * s * s / 2.0
    x += t * -math.sin(h)
    y += t * math.cos(h)
    return x, -y


def test_spiral_geometry(tool, tmp_path):
    rmap, _ = _run_tool(tool, tmp_path, _SPIRAL)
    nodes = np.concatenate([l.nodes for l in rmap.lanes])
    # sample at s=30 (7th node of the first chunk), lane center t=-1.5
    ex, ey = _spiral_lane_node(0.04, 60.0, 30.0, -1.5)
    d = np.linalg.norm(nodes[:, :2] - np.array([ex, ey]), axis=1)
    assert d.min() < 0.2, (ex, ey, nodes[np.argmin(d)])
    # reference line bends +y in xodr -> the far end bends -y in CARLA
    assert nodes[np.argmax(nodes[:, 0]), 1] < 0


def test_parampoly3_geometry(tool, tmp_path):
    rmap, _ = _run_tool(tool, tmp_path, _PARAMPOLY)
    nodes = np.concatenate([l.nodes for l in rmap.lanes])
    # v(p)=8p^2 bends +y in xodr -> lane y should go negative in CARLA frame
    # beyond the initial straight part
    assert nodes[:, 1].min() < -4.0
    assert nodes[:, 0].max() > 30.0


def test_lane_offset_and_sections(tool, tmp_path):
    rmap, _ = _run_tool(tool, tmp_path, _OFFSET_SECTIONS)
    nodes = np.concatenate([l.nodes for l in rmap.lanes])
    first = nodes[np.isclose(nodes[:, 0], 0.0, atol=0.1)]
    # laneOffset +1 shifts the center to t=+1; lane center t = 1 - 2 = -1
    # -> CARLA y = +1
    np.testing.assert_allclose(first[:, 1], 1.0, atol=0.05)
    # second section (s>=50): width 2 -> t = 1 - 1 = 0 -> CARLA y = 0
    late = nodes[nodes[:, 0] >= 55.0]
    np.testing.assert_allclose(late[:, 1], 0.0, atol=0.05)


def test_rmap_v3_ids_arclength_and_lane_position(tool, tmp_path):
    """rmap v3: lane headers carry OpenDRIVE road/lane ids, nodes a 7th
    road-arclength column, and resolve_lane_position maps OpenSCENARIO
    LanePosition (roadId, laneId, s, offset) onto the CARLA world frame."""
    from mmfn_tpu.mapping.rough_map import resolve_lane_position

    rmap, _ = _run_tool(tool, tmp_path, _STRAIGHT)
    lane = rmap.lanes[0]
    assert lane.road_id == "0" and lane.lane_id == -1
    np.testing.assert_allclose(lane.node_s, np.arange(10) * 5.0)
    # model-facing node contract unchanged: still 5 features
    assert lane.nodes.shape[1] == 5

    x, y, yaw = resolve_lane_position(rmap, "0", -1, 37.0)
    assert abs(x - 37.0) < 1e-6 and abs(y - 1.75) < 1e-6
    assert abs(yaw) < 1e-9
    # +offset displaces toward the road's +t axis (the reference line here:
    # CARLA y decreases for a right-side lane)
    x, y, _ = resolve_lane_position(rmap, "0", -1, 37.0, offset=1.0)
    assert abs(y - 0.75) < 1e-6

    import pytest
    with pytest.raises(KeyError):
        resolve_lane_position(rmap, "0", -2, 10.0)   # sidewalk: not emitted
    with pytest.raises(ValueError):
        resolve_lane_position(rmap, "0", -1, 140.0)  # past the road end


def test_rmap_v3_left_lane_arclength_descends(tool, tmp_path):
    """Left-side lanes travel against road s: their polylines are emitted in
    direction of travel, so the v3 s column runs descending and the resolved
    yaw points against the reference-line heading."""
    from mmfn_tpu.mapping.rough_map import resolve_lane_position

    rmap, _ = _run_tool(tool, tmp_path, _ARC)
    lane = rmap.lanes[0]
    assert lane.road_id == "1" and lane.lane_id == 1
    assert lane.node_s[0] > lane.node_s[-1]

    x, y, yaw = resolve_lane_position(rmap, "1", 1, 10.0)
    # lane center rides radius 48 about the arc center (CARLA frame (0,-50))
    assert abs(math.hypot(x - 0.0, y + 50.0) - 48.0) < 0.05
    # travel direction at s=10 opposes the (flipped) reference heading 0.2
    expect = math.atan2(math.sin(0.2), -math.cos(0.2))
    assert abs(yaw - expect) < 0.08
