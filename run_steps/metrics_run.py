#!/usr/bin/env python
"""Run a user-defined metric over a recorded episode — the
scenario_runner ``metrics_manager.py`` analog.

The reference's flow (metrics_manager.py:31-120): point it at a CARLA
recorder ``.log`` + a criteria JSON + a metric ``.py``; it loads the recorded
map through a live CARLA server, wraps the log in a MetricsLog and
instantiates the first BasicMetric subclass found in the metric file. Here
the recording is the self-contained JSON that ``scenario_run.py --record`` /
``ClosedLoopRunner(recorder=...)`` writes: the map is vectorized from the
embedded OpenDRIVE (no simulator) and the criteria summary is already
inside, so the only required inputs are the log and the metric.

Usage:
    python run_steps/metrics_run.py --log episode.json \
        --metric examples/metrics/distance_to_lane_center.py [--out DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log", required=True,
                    help="episode recording (JSON from --record)")
    ap.add_argument("--metric", required=True,
                    help="path to a .py defining a BasicMetric subclass")
    ap.add_argument("--criteria", default=None,
                    help="optional criteria JSON overriding the recording's")
    ap.add_argument("--out", default=".",
                    help="directory the metric writes its outputs to")
    ap.add_argument("--no-map", action="store_true",
                    help="skip vectorizing the recorded map (town_map=None)")
    args = ap.parse_args()

    from mmfn_tpu.harness.metrics_log import MetricsLog, run_metric
    from mmfn_tpu.harness.recording import EpisodeRecorder

    recording = EpisodeRecorder.load(args.log)
    criteria = None
    if args.criteria:
        import json
        with open(args.criteria) as f:
            criteria = json.load(f)

    town_map = None
    if args.no_map:
        recording = dict(recording, opendrive="")
    os.makedirs(args.out, exist_ok=True)
    metric = run_metric(args.metric, recording, town_map=town_map,
                        criteria=criteria, out_dir=args.out)
    log = MetricsLog(recording)
    print(f"{type(metric).__name__}: ran over "
          f"{log.get_total_frame_count()} frames "
          f"({log.get_elapsed_time(log.get_total_frame_count() - 1):.1f} s "
          f"sim time); outputs in {args.out}")


if __name__ == "__main__":
    main()
