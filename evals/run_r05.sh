#!/bin/bash
# Round-5 evidence battery (VERDICT r4 items 1-4, 8), serialized on the one
# TPU chip. All image runs use --prerender: frames are rendered before the
# timed loop (camera frames cost a real robot's VILO process nothing), so
# realtime_factor measures track->solve->adopt.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=LONGRUN_RESULTS.json

# 1. device/cv tracker A/B on the same 300 s sequence (VERDICT 2)
timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker device --platform tpu --prerender \
  --out $OUT --tag street_300s_img_device_r5
timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker cv --platform tpu --prerender \
  --out $OUT --tag street_300s_img_cv_r5

# 2. multi-lap loop evidence on shipped defaults (VERDICT 1) + prerendered
#    image-mode realtime (VERDICT 4)
timeout 5400 python evals/long_run.py --duration 470 --path street \
  --speed 0.75 --images --tracker cv --loop --platform tpu --prerender \
  --out $OUT --tag street_470s_img_loop_r5
timeout 7200 python evals/long_run.py --duration 900 --path street \
  --speed 0.75 --images --tracker cv --loop --loop-kf-dist 0.6 \
  --platform tpu --prerender --out $OUT --tag street_900s_img_loop_r5

# 3. robustness battery on the final code (dropout fix) + 300 s promotions
#    of the two previously-failing cases (VERDICT 3, 8)
timeout 10800 python evals/robustness.py --duration 60 --platform tpu \
  --out ROBUSTNESS.json
timeout 10800 python evals/robustness.py --duration 300 --platform tpu \
  --cases td_init_-20ms,imu_dropout_2x1s --out ROBUSTNESS_300S.json

echo DONE_R05_BATCH1
