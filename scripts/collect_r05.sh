#!/bin/bash
# Reference-scale data collection (VERDICT r4 #2): the expert drives both
# fake towns under scenarios + ambient traffic across four weathers, with
# laterally-offset repetitions (recovery demonstrations). ~10k frames at the
# reference's 2 Hz capture rate (mmfn_pilot.py:97). Output layout matches
# phase1's <data_folder>/<Town>_short/route_NN contract.
#
# Usage: ROOT=/tmp/mmfn_r05 bash scripts/collect_r05.sh
set -e
cd "$(dirname "$0")/.."
ROOT="${ROOT:-/tmp/mmfn_r05}"
DATA="$ROOT/data/mmfn"
SCEN="scenarios=data/scenarios/fake_towns_scenarios.json"
mkdir -p "$DATA"

for W in ClearNoon WetNoon MidRainNoon HardRainNoon; do
  # TownCross: 3 train routes (straight_sn held out) x 10 offset repetitions
  python run_steps/phase0_run_eval.py --config run_steps/config/collect.yaml \
    routes=data/routes/cross_train_3.xml map=data/maps/fake_town_cross.xodr \
    repetitions=10 collect_offsets=true weather=$W $SCEN background_traffic=10 \
    agent.data_save="$DATA/Cross${W}_short" \
    checkpoint="$ROOT/collect_cross_$W.json" resume=true

  # TownLoop circuit x 4 offset repetitions
  python run_steps/phase0_run_eval.py --config run_steps/config/collect.yaml \
    routes=data/routes/fake_loop.xml map=data/maps/fake_town_loop.xodr \
    repetitions=4 collect_offsets=true weather=$W $SCEN background_traffic=10 \
    agent.data_save="$DATA/Loop${W}_short" \
    checkpoint="$ROOT/collect_loop_$W.json" resume=true

  # held-out validation route (single on-lane pass per weather)
  python run_steps/phase0_run_eval.py --config run_steps/config/collect.yaml \
    routes=data/routes/cross_straight_sn.xml map=data/maps/fake_town_cross.xodr \
    weather=$W $SCEN background_traffic=10 \
    agent.data_save="$DATA/Val${W}_short/route_00" \
    checkpoint="$ROOT/collect_val_$W.json" resume=true
done

echo "frames collected:"
find "$DATA" -name "*.json" -path "*measurements*" | wc -l
