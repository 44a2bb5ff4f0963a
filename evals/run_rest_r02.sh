#!/bin/bash
# Remaining round-2 evals (restart after a TPU relay stall killed the first
# sweep mid-way). STRICTLY one TPU process at a time — concurrent clients
# through the relay are what wedged it.
set -x
cd "$(dirname "$0")/.."
LOG=evals/r02_sweep.log

run() { timeout "$1" "${@:2}" 2>&1 | grep -v cpu_aot >> "$LOG"; }

run 4200 python evals/long_run.py --duration 300 --path figure8 --speed 0.75 \
    --seed 32 --out LONGRUN_RESULTS.json --tag figure8_300s_full
run 4200 python evals/long_run.py --duration 300 --path figure8 --speed 0.75 \
    --seed 32 --no-vision --out LONGRUN_RESULTS.json --tag figure8_300s_imuleg
run 5400 python evals/long_run.py --duration 240 --path street --speed 0.75 \
    --seed 33 --images --loop --out LONGRUN_RESULTS.json --tag street_240s_img_loop
run 5400 python evals/run_configs.py --duration 20 --out CONFIG_RESULTS.json
echo DONE >> "$LOG"
