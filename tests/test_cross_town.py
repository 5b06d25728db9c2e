"""The signalized crossroads town (scripts/gen_cross_town.py): junction
roads, turn connectors, and signal-gated approaches through the native
vectorizer, and the expert driving the left-turn route closed-loop."""

import os
import subprocess
import sys

import numpy as np

from tests.conftest import clean_subprocess_env as _clean_env

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
XODR = os.path.join(ROOT, "data", "maps", "fake_town_cross.xodr")
ROUTE = os.path.join(ROOT, "data", "routes", "cross_left_turn.xml")


def test_generator_is_current(tmp_path):
    """The checked-in town/route files must match the generator's output
    (the generator is the source of truth for the junction geometry)."""
    env = dict(os.environ)
    proc = subprocess.run([sys.executable, "-c", f"""
import sys
sys.path.insert(0, {ROOT!r})
import scripts.gen_cross_town as g
print(g.build_xodr(), end="")
for name, fn in g.ROUTES.items():
    print("=FILE=" + name)
    print(g.route_xml(fn()), end="")
"""], capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr[-1500:]
    chunks = proc.stdout.split("=FILE=")
    assert chunks[0] == open(XODR).read()
    for chunk in chunks[1:]:
        name, content = chunk.split("\n", 1)
        path = os.path.join(ROOT, "data", "routes", name)
        assert content == open(path).read(), name


def test_cross_town_vectorizes_with_junction_features(tool):
    from mmfn_tpu.mapping import vectorize_xodr

    rm, _, _ = vectorize_xodr(open(XODR).read())
    nodes = [np.asarray(l.nodes) for l in rm.lanes]
    assert len(nodes) >= 20
    # junction connectors carry the intersection flag
    assert sum(1 for n in nodes if n[:, 2].max() > 0.5) >= 4
    # both turn directions appear (left/right arc connectors)
    dirs = set()
    for n in nodes:
        dirs.update(np.unique(n[:, 3]).tolist())
    assert {1.0, 2.0} <= dirs
    # the signalized west/south/east approaches mark controlled nodes
    assert sum(1 for n in nodes
               if n.shape[1] >= 5 and n[:, 4].max() > 0.5) >= 3


def test_expert_completes_left_turn_with_traffic(tmp_path):
    """phase0 end-to-end on the cross town: the expert takes the signalized
    left turn among background traffic and completes at full score."""
    import json

    ck = tmp_path / "cross.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase0_run_eval.py"),
         "--config", os.path.join(ROOT, "run_steps", "config", "eval.yaml"),
         "agent.type=expert", f"routes={ROUTE}", f"map={XODR}",
         "background_traffic=4", "resume=false", f"checkpoint={ck}"],
        capture_output=True, text=True, env=_clean_env(), cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.load(open(ck))["_checkpoint"]["records"][0]
    assert rec["status"] == "Completed", rec
    assert rec["scores"]["score_composed"] >= 80.0, rec["infractions"]

def test_scenario_on_route_through_junction(tmp_path):
    """scenario_run --route (srunner --route analog): the Scenario8
    junction-left-turn behavior triggers along the cross-town route and the
    expert still completes it."""
    import json

    junit = tmp_path / "s8.xml"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "scenario_run.py"),
         "--scenario", "Scenario8", "--route", ROUTE, "--map", XODR,
         "--trigger-s", "60", "--junit", str(junit)],
        capture_output=True, text=True, env=_clean_env(), cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-2000:]
    import xml.etree.ElementTree as ET
    suite = ET.parse(junit).getroot()
    assert suite.get("failures") == "0"
