#!/bin/bash
# Round-2 evaluation sweep. Runs SEQUENTIALLY: the TPU tunnel serves one
# process at a time, and fair wall-clock numbers need an uncontended host.
# Writes LONGRUN_RESULTS.json / CONFIG_RESULTS.json / MULTICHIP_r02.json.
set -x
cd "$(dirname "$0")/.."
LOG=evals/r02_sweep.log
: > "$LOG"

run() { timeout "$1" "${@:2}" 2>&1 | grep -v cpu_aot_loader >> "$LOG"; }

# --- long-horizon drift runs (VERDICT next #3): 200-450 m, two paths,
# full VILO + IMU+leg-only ---
run 7200 python evals/long_run.py --duration 450 --path street --speed 0.75 \
    --seed 31 --out LONGRUN_RESULTS.json --tag street_450s_full
run 7200 python evals/long_run.py --duration 450 --path street --speed 0.75 \
    --seed 31 --no-vision --out LONGRUN_RESULTS.json --tag street_450s_imuleg
run 5400 python evals/long_run.py --duration 400 --path figure8 --speed 0.6 \
    --seed 32 --out LONGRUN_RESULTS.json --tag figure8_400s_full
run 5400 python evals/long_run.py --duration 400 --path figure8 --speed 0.6 \
    --seed 32 --no-vision --out LONGRUN_RESULTS.json --tag figure8_400s_imuleg

# --- loop closure on a revisiting path, image front-end (VERDICT next #4) ---
run 7200 python evals/long_run.py --duration 240 --path street --speed 0.75 \
    --seed 33 --images --loop --out LONGRUN_RESULTS.json --tag street_240s_img_loop

# --- config table incl. image-based config 6 (VERDICT next #1) ---
run 7200 python evals/run_configs.py --duration 20 --out CONFIG_RESULTS.json

# --- multichip scaling with production solver opts (VERDICT next #5) ---
run 3600 python evals/multichip_scaling.py --out MULTICHIP_r02.json

echo DONE >> "$LOG"
