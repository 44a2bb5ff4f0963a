#!/bin/bash
# Round-3 follow-up evals: loop-closure rerun with the retuned matching
# (23x23 patches, RANSAC-decides gates) and device-tracker rerun with the
# 4-level pyramid fix. Waits for the main battery to drain first.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=LONGRUN_RESULTS.json
while pgrep -f "evals/long_run.py|evals/run_configs.py" >/dev/null; do sleep 20; done

timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker cv --loop --platform tpu --out $OUT \
  --tag street_300s_img_loop_r3b

timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker device --platform tpu --out $OUT \
  --tag street_300s_img_device_r3b
echo DONE_R03B
