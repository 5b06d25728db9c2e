"""CLI layer tests: config loader and the phase1 preprocessing entry point."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from mmfn_tpu.utils.cli import load_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


from tests.conftest import clean_subprocess_env as _clean_env



def test_load_config_with_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nnested:\n  b: [1, 2]\n  c: x\n")
    cfg = load_config(str(p), ["a=5", "nested.c=y", "nested.d=[3,4]", "new.k=true"])
    assert cfg["a"] == 5
    assert cfg["nested"]["b"] == [1, 2]
    assert cfg["nested"]["c"] == "y"
    assert cfg["nested"]["d"] == [3, 4]
    assert cfg["new"]["k"] is True
    # attribute access
    assert cfg.nested.c == "y"


def _make_raw_town(root, town="Town01", n_frames=10, seed=0):
    rng = np.random.default_rng(seed)
    rd = os.path.join(root, f"{town}_short", "route_00")
    for sub in ("rgb_front", "lidar", "radar", "maps", "vectormap", "measurements"):
        os.makedirs(os.path.join(rd, sub), exist_ok=True)
    for i in range(1, n_frames + 1):
        name = str(i).zfill(4)
        np.save(os.path.join(rd, "rgb_front", f"{name}.npy"),
                rng.integers(0, 255, size=(256, 900, 3)).astype(np.uint8))
        np.save(os.path.join(rd, "maps", f"{name}.npy"),
                rng.integers(0, 255, size=(256, 256, 3)).astype(np.uint8))
        np.save(os.path.join(rd, "lidar", f"{name}.npy"),
                rng.uniform(-20, 20, size=(300, 4)).astype(np.float32))
        np.save(os.path.join(rd, "radar", f"{name}.npy"),
                rng.normal(size=(20, 5)).astype(np.float32) + 1.0)
        np.save(os.path.join(rd, "vectormap", f"{name}.npy"),
                rng.normal(size=(2, 10, 5)).astype(np.float32))
        with open(os.path.join(rd, "measurements", f"{name}.json"), "w") as f:
            json.dump({"x": float(i), "y": 0.0, "theta": 0.0, "speed": 4.0,
                       "x_command": float(i + 10), "y_command": 0.0, "command": 4,
                       "steer": 0.0, "throttle": 0.4, "brake": 0.0}, f)


def test_phase1_cli(tmp_path):
    data_root = tmp_path / "data" / "mmfn"
    _make_raw_town(str(data_root))
    cfg = {"data_folder": str(data_root), "train_towns": ["Town01"],
           "val_towns": ["Town01"], "logdir": str(tmp_path / "log"),
           "image_ext": "npy"}
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase1_preprocess_data.py"),
         "--config", str(cfg_path)],
        capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr
    out_dir = tmp_path / "data" / "pro_train_fmmfn"
    assert out_dir.is_dir()
    assert len(list(out_dir.glob("*.pkl"))) == 4  # (10 - 4 - 2) // 1


def test_phase0_collect_cli(tmp_path):
    """End-to-end collect: expert drives the fake world and writes a dataset."""
    cfg = {
        "routes": os.path.join(ROOT, "tests", "fixtures", "route_straight.xml"),
        "repetitions": 1, "resume": False,
        "checkpoint": str(tmp_path / "results" / "collect.json"),
        "agent": {"type": "expert",
                  "data_save": str(tmp_path / "TownTest_short" / "route_00"),
                  "image_ext": "npy", "seed": 0},
        "simulator": "fake",
    }
    cfg_path = tmp_path / "collect.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase0_run_eval.py"),
         "--config", str(cfg_path)],
        capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "driving score" in proc.stdout
    frames = list((tmp_path / "TownTest_short" / "route_00" / "rgb_front").glob("*.npy"))
    assert len(frames) >= 3
    import json as _json
    ck = _json.load(open(tmp_path / "results" / "collect.json"))
    assert ck["_checkpoint"]["records"][0]["scores"]["score_route"] > 50


@pytest.mark.slow
def test_phase2_train_cli(tmp_path):
    """End-to-end training CLI: phase1 pickles -> 1 epoch -> checkpoint files."""
    data_root = tmp_path / "data" / "mmfn"
    _make_raw_town(str(data_root))
    base_cfg = {"data_folder": str(data_root), "train_towns": ["Town01"],
                "val_towns": ["Town01"], "logdir": str(tmp_path / "log"),
                "image_ext": "npy"}
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(base_cfg))
    env = _clean_env()
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(ROOT, "tests", ".jax_cache")

    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase1_preprocess_data.py"),
         "--config", str(cfg_path)], capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr[-1500:]

    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase2_train_net.py"),
         "--config", str(cfg_path),
         "batch_size=2", "epochs=1", "val_every=1", "save_every=1",
         "model.n_layer=1", "max_lanes=8",
         "train_agent.entry_point=mmfn_vec"],
        capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr[-2500:]
    assert (tmp_path / "log" / "best_model.msgpack").exists()
    assert (tmp_path / "log" / "recent.log").exists()
    assert (tmp_path / "log" / "metrics.jsonl").exists()
    import json as _json
    table = _json.load(open(tmp_path / "log" / "recent.log"))
    assert table["epoch"] == 1 and len(table["train_loss"]) == 1


def test_phase0_openscenario_cli(tmp_path):
    """phase0 runs a .xosc routes file: the story drives the lead vehicle and
    the episode is scored like any route (expert follows without collision)."""
    cfg = {
        "routes": os.path.join(ROOT, "data", "scenarios",
                               "follow_leading_vehicle.xosc"),
        "repetitions": 1, "resume": False,
        "checkpoint": str(tmp_path / "results" / "xosc.json"),
        "agent": {"type": "expert", "seed": 0},
        "simulator": "fake",
    }
    cfg_path = tmp_path / "xosc.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase0_run_eval.py"),
         "--config", str(cfg_path)],
        capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "driving score" in proc.stdout
    record = json.load(open(tmp_path / "results" / "xosc.json"))[
        "_checkpoint"]["records"][0]
    assert record["infractions"]["collisions_vehicle"] == []
    assert record["scores"]["score_route"] > 50, record


def test_phase0_openscenario_controller_cli(tmp_path):
    """phase0 runs the controller-layer .xosc: the adversary is driven by
    npc_vehicle_control along an AssignRouteAction merge route; the expert
    absorbs the cut-in and completes without collision."""
    cfg = {
        "routes": os.path.join(ROOT, "data", "scenarios",
                               "cut_in_with_controller.xosc"),
        "repetitions": 1, "resume": False,
        "checkpoint": str(tmp_path / "results" / "xosc_ctrl.json"),
        "agent": {"type": "expert", "seed": 0},
        "simulator": "fake",
    }
    cfg_path = tmp_path / "xosc_ctrl.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase0_run_eval.py"),
         "--config", str(cfg_path)],
        capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr[-2000:]
    record = json.load(open(tmp_path / "results" / "xosc_ctrl.json"))[
        "_checkpoint"]["records"][0]
    assert record["infractions"]["collisions_vehicle"] == []
    assert record["scores"]["score_route"] > 50, record


@pytest.mark.parametrize("xosc,tag", [
    ("trajectory_lead_pulls_off.xosc", "traj"),
    ("synchronize_crossing.xosc", "sync"),
    ("clothoid_pull_off_ghost.xosc", "clo"),
])
def test_phase0_openscenario_extension_cli(tmp_path, xosc, tag):
    """phase0 runs the shipped episodes built on constructs the reference's
    parser refuses (FollowTrajectoryAction Polyline/Clothoid, Synchronize-
    Action, VisibilityAction — openscenario_parser.py:1043-1044 / 1023-1024 /
    1021-1022): the story actor clears or times itself around the ego's path
    and the expert completes cleanly."""
    cfg = {
        "routes": os.path.join(ROOT, "data", "scenarios", xosc),
        "repetitions": 1, "resume": False,
        "checkpoint": str(tmp_path / "results" / f"xosc_{tag}.json"),
        "agent": {"type": "expert", "seed": 0},
        "simulator": "fake",
    }
    cfg_path = tmp_path / f"xosc_{tag}.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase0_run_eval.py"),
         "--config", str(cfg_path)],
        capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr[-2000:]
    record = json.load(open(tmp_path / "results" / f"xosc_{tag}.json"))[
        "_checkpoint"]["records"][0]
    assert record["infractions"]["collisions_vehicle"] == []
    assert record["scores"]["score_route"] > 50, record


def test_phase0_fleet_cli(tmp_path):
    """``fleet: 2`` drives both route repetitions in lockstep through ONE
    batched forward per tick (harness/fleet.py); both land in the checkpoint
    as ordinary scored records. Tiny e2e model + max_ticks cap keep the
    subprocess compile/run small; the persistent cache dir is passed through
    the env (conftest sets it in-process only)."""
    cfg = {
        "routes": os.path.join(ROOT, "tests", "fixtures", "route_straight.xml"),
        "repetitions": 2, "fleet": 2, "max_ticks": 6, "resume": False,
        "checkpoint": str(tmp_path / "results" / "fleet.json"),
        "agent": {"variant": "vec", "n_layer": 1, "max_lanes": 16,
                  "model_path": None},
        "simulator": "fake",
    }
    cfg_path = tmp_path / "fleet.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    env = _clean_env()
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(ROOT, "tests", ".jax_cache")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase0_run_eval.py"),
         "--config", str(cfg_path)],
        capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "fleet of 2" in proc.stdout
    assert "driving score" in proc.stdout
    records = json.load(open(tmp_path / "results" / "fleet.json"))[
        "_checkpoint"]["records"]
    assert len(records) == 2
    for record in records:
        assert record["status"].startswith(("Failed", "Completed"))


@pytest.mark.slow
def test_phase0_device_world_cli(tmp_path):
    """``agent.device_world: true`` runs the eval with on-device sensor
    synthesis: the fake world emits compact world_state frames
    (compact_sensors, wired by the CLI) and the agent serves through
    DeviceWorldPipeline instead of JitPipeline."""
    cfg = {
        "routes": os.path.join(ROOT, "tests", "fixtures", "route_straight.xml"),
        "max_ticks": 6, "resume": False,
        "checkpoint": str(tmp_path / "results" / "dw.json"),
        # rad at n_layer=1/max_lanes=16 rides the device-world program
        # test_device_world.py already left in the persistent cache
        "agent": {"variant": "rad", "n_layer": 1, "max_lanes": 16,
                  "device_world": True, "model_path": None},
        "simulator": "fake",
    }
    cfg_path = tmp_path / "dw.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    env = _clean_env()
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(ROOT, "tests", ".jax_cache")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "phase0_run_eval.py"),
         "--config", str(cfg_path)],
        capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "driving score" in proc.stdout
    records = json.load(open(tmp_path / "results" / "dw.json"))[
        "_checkpoint"]["records"]
    assert len(records) == 1
    assert records[0]["status"].startswith(("Failed", "Completed"))


def test_dotdict_attribute_protocol():
    """Missing attributes raise AttributeError (not KeyError) so
    deepcopy / hasattr / getattr-with-default work."""
    import copy

    from mmfn_tpu.utils.cli import DotDict

    d = DotDict(a=1)
    assert d.a == 1
    assert not hasattr(d, "missing")
    assert getattr(d, "missing", "fallback") == "fallback"
    assert copy.deepcopy(d) == {"a": 1}
    with pytest.raises(AttributeError):
        _ = d.missing


def test_route_save_path_per_route():
    sys.path.insert(0, os.path.join(ROOT, "run_steps"))
    try:
        from phase0_run_eval import _route_save_path
    finally:
        sys.path.remove(os.path.join(ROOT, "run_steps"))

    # multi-route collection gets per-route subdirs
    assert _route_save_path("/data/Town_short", 3) == "/data/Town_short/route_03"
    # an exact route dir (tests, single-route configs) is honored as-is
    assert _route_save_path("/data/Town_short/route_00", 3) \
        == "/data/Town_short/route_00"
    assert _route_save_path(None, 3) is None


def test_scenario_run_cli(tmp_path):
    """Standalone scenario runner (srunner scenario_runner.py analog):
    --list prints the catalog; --scenario runs a named behavior in the fake
    world with repetitions + JUnit output."""
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "scenario_run.py"),
         "--list"], capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Scenario1" in proc.stdout and "CutIn" in proc.stdout

    junit = tmp_path / "junit.xml"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "scenario_run.py"),
         "--scenario", "Scenario2", "--agent", "npc", "--repetitions", "2",
         "--randomize", "--junit", str(junit),
         "--record", str(tmp_path / "ep.json"),
         "--output", str(tmp_path / "out.txt")],
        capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.count("Scenario2 rep") == 2

    # --record (srunner --record analog): one recording per repetition,
    # loadable by the metrics module
    from mmfn_tpu.harness.recording import EpisodeRecorder

    for rep in range(2):
        rec = EpisodeRecorder.load(str(tmp_path / f"ep_rep{rep}.json"))
        assert rec["frames"] and rec["criteria"]

    import xml.etree.ElementTree as ET
    suite = ET.parse(junit).getroot()
    assert suite.get("tests") == "2"
    assert len(suite.findall("testcase")) == 2
    assert (tmp_path / "out.txt").read_text().strip()

    # --openscenario runs the storyboard engine through the same loop and
    # honors the srunner-mirror output flags
    junit_x = tmp_path / "junit_x.xml"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run_steps", "scenario_run.py"),
         "--openscenario",
         os.path.join(ROOT, "data", "scenarios", "follow_leading_vehicle.xosc"),
         "--junit", str(junit_x)],
        capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr[-2000:]
    suite = ET.parse(junit_x).getroot()
    assert suite.get("name") == "follow_leading_vehicle"
    assert suite.get("failures") == "0"
