"""Generate the signalized crossroads town (data/maps/fake_town_cross.xodr)
and a left-turn route through it (data/routes/cross_left_turn.xml).

A 4-way junction exercises the parts of the stack the single-road loop town
cannot: junction-flagged roads (the vectorizer's ``intersection`` feature),
turn connectors (arc geometry + ``turn_dir``), multiple roads with linkage,
and signal-gated approaches from two directions. Layout (OpenDRIVE frame;
CARLA mirrors y):

            road 4 (x=0, y: 10..120)
               |
  road 1 ---- JUNCTION ---- road 2     junction connectors (junction="1"):
  (y=0,        (+-10 m)      (y=0,       10: W-E straight   11: S-N straight
   x:-120..-10)              x:10..120)  12: W-N left arc   13: W-S right arc
               |
            road 3 (x=0, y: -120..-10)

External roads are two-way (lanes +-1, 3.5 m); straight connectors are
two-way; turn connectors are one-way (lane -1). Traffic lights (type
1000001): on the west and south approaches 5 m before the junction, plus
one on road 2 at s=5 gating the WESTBOUND (+1-lane, -s travel) approach —
for that direction of travel the controlled stretch is entered from the
east, so the derived stop line lands before the junction. The vectorizer
marks nodes within +-15 m of a signal as controlled (road-local), which is
where signals_from_rough_map places each route's stop line.

Route-keypoint rule (see docs/PARITY.md + fake-world notes): arc keypoints
every ~2 m — route interpolation is LINEAR between keypoints.
"""

import math
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R = 10.0              # junction half-size / turn reference radius
LANE = 3.5
ARC_LEN = math.pi * R / 2.0


def _road(rid, name, geoms, lanes_xml, signals="", junction="-1"):
    length = sum(g[4] for g in geoms)
    g_xml = "".join(
        f'      <geometry s="{s:.7f}" x="{x:.4f}" y="{y:.4f}" '
        f'hdg="{h:.10f}" length="{l:.7f}">{kind}</geometry>\n'
        for (s, x, y, h, l, kind) in geoms)
    sig = f"    <signals>\n{signals}    </signals>\n" if signals else ""
    return (f'  <road name="{name}" length="{length:.7f}" id="{rid}" '
            f'junction="{junction}">\n'
            f"    <planView>\n{g_xml}    </planView>\n"
            f"    <lanes>\n{lanes_xml}    </lanes>\n{sig}  </road>\n")


TWO_WAY = """      <laneSection s="0.0">
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
"""

ONE_WAY = """      <laneSection s="0.0">
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
"""


def _signal(s, sid, name):
    return (f'      <signal s="{s:.1f}" t="-4" id="{sid}" name="{name}" '
            f'dynamic="yes" type="1000001" subtype="-1" orientation="+"/>\n')


def line(s, x, y, hdg, length):
    return (s, x, y, hdg, length, "<line/>")


def arc(s, x, y, hdg, length, curv):
    return (s, x, y, hdg, length, f'<arc curvature="{curv:.10f}"/>')


def build_xodr() -> str:
    roads = [
        _road(1, "West", [line(0, -120, 0, 0.0, 110)], TWO_WAY,
              signals=_signal(105.0, 1, "west_light")),
        _road(2, "East", [line(0, 10, 0, 0.0, 110)], TWO_WAY,
              signals=_signal(5.0, 2, "east_light")),
        _road(3, "South", [line(0, 0, -120, math.pi / 2, 110)], TWO_WAY,
              signals=_signal(105.0, 3, "south_light")),
        _road(4, "North", [line(0, 0, 10, math.pi / 2, 110)], TWO_WAY),
        _road(10, "WE", [line(0, -R, 0, 0.0, 2 * R)], TWO_WAY, junction="1"),
        _road(11, "SN", [line(0, 0, -R, math.pi / 2, 2 * R)], TWO_WAY,
              junction="1"),
        _road(12, "WN_left", [arc(0, -R, 0, 0.0, ARC_LEN, 1.0 / R)],
              ONE_WAY, junction="1"),
        _road(13, "WS_right", [arc(0, -R, 0, 0.0, ARC_LEN, -1.0 / R)],
              ONE_WAY, junction="1"),
    ]
    conns = "".join(
        f'    <connection id="{i}" incomingRoad="{inc}" '
        f'connectingRoad="{con}" contactPoint="start">'
        f'<laneLink from="-1" to="-1"/></connection>\n'
        for i, (inc, con) in enumerate([(1, 10), (3, 11), (1, 12), (1, 13)]))
    return ('<?xml version="1.0" standalone="yes"?>\n<OpenDRIVE>\n'
            '  <header revMajor="1" revMinor="4" name="fake_town_cross"/>\n'
            + "".join(roads)
            + f'  <junction id="1" name="cross">\n{conns}  </junction>\n'
            + "</OpenDRIVE>\n")


def left_turn_route_carla():
    """Keypoints (CARLA frame: y = -xodr_y) for W-approach -> left-turn
    connector -> north road, following lane -1 centers (t = -1.75)."""
    pts = []
    # west approach: xodr lane -1 center at y=-1.75 -> CARLA y=+1.75
    x = -80.0
    while x < -R - 1.0:
        pts.append((x, 1.75))
        x += 6.0
    # turn connector 12: xodr arc center (-R, R); lane -1 radius R + 1.75
    r = R + 1.75
    steps = 16
    for i in range(steps + 1):
        phi = -math.pi / 2 + (math.pi / 2) * i / steps   # -90deg .. 0
        xo = -R + r * math.cos(phi)
        yo = R + r * math.sin(phi)
        pts.append((xo, -yo))
    # north road (xodr): lane -1 center x=+1.75, y 10..80 -> CARLA y -10..-80
    y = 14.0
    while y <= 80.0:
        pts.append((1.75, -y))
        y += 6.0
    return pts


def straight_we_route_carla():
    """West approach straight through the junction onto the east road
    (lane -1 throughout: CARLA y=+1.75)."""
    return [(x, 1.75) for x in range(-80, 81, 6)]


def straight_sn_route_carla():
    """The perpendicular movement: road 3 northbound (xodr +s) through
    connector 11 onto road 4 — in CARLA, x=+1.75 from y=+80 to y=-80."""
    return [(1.75, -y) for y in range(-80, 81, 6)]


def right_turn_route_carla():
    """W approach -> right-turn connector 13 -> southbound on road 3's +1
    lane (CARLA: from y=+1.75 eastbound, arcing to x=-1.75, y: 10..80)."""
    pts = [(float(x), 1.75) for x in range(-80, -11, 6)]
    r = R - 1.75                      # lane -1 is INSIDE the right turn
    steps = 16
    for i in range(steps + 1):
        phi = math.pi / 2 - (math.pi / 2) * i / steps    # +90deg .. 0
        xo = -R + r * math.cos(phi)
        yo = -R + r * math.sin(phi)
        pts.append((xo, -yo))
    pts.extend((-1.75, float(y)) for y in range(14, 81, 6))
    return pts


ROUTES = {
    "cross_left_turn.xml": left_turn_route_carla,
    "cross_straight.xml": straight_we_route_carla,
    "cross_straight_sn.xml": straight_sn_route_carla,
    "cross_right_turn.xml": right_turn_route_carla,
}


def route_xml(pts) -> str:
    wps = "".join(
        f'    <waypoint pitch="0.0" roll="0.0" x="{x:.3f}" y="{y:.3f}" '
        f'yaw="0.0" z="0.0" />\n' for x, y in pts)
    return ('<?xml version="1.0" encoding="UTF-8"?>\n<routes>\n'
            '  <route id="0" town="TownCross">\n'
            + wps + "  </route>\n</routes>\n")


def main():
    xodr_path = os.path.join(ROOT, "data", "maps", "fake_town_cross.xodr")
    with open(xodr_path, "w") as f:
        f.write(build_xodr())
    print(f"wrote {xodr_path}")
    for name, fn in ROUTES.items():
        route_path = os.path.join(ROOT, "data", "routes", name)
        with open(route_path, "w") as f:
            f.write(route_xml(fn()))
        print(f"wrote {route_path}")


if __name__ == "__main__":
    main()
