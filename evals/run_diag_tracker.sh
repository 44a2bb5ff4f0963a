#!/bin/bash
# Bisect the device-tracker drift regression (r5b A/B: device 0.547% vs cv
# 0.288% on the 300 s street sequence). Candidates: the top-32 detection-
# stereo bound (f14d9ec) and the 2-step prediction seed (30d68c1).
# 120 s runs discriminate; the winner gets a 300 s confirmation.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=evals/diag_tracker_r5.json

timeout 1800 python evals/long_run.py --duration 120 --path street \
  --speed 0.75 --images --tracker device --platform tpu --prerender \
  --out $OUT --tag d120_base
CERB_DET_STEREO=120 timeout 1800 python evals/long_run.py --duration 120 \
  --path street --speed 0.75 --images --tracker device --platform tpu \
  --prerender --out $OUT --tag d120_fullstereo
CERB_PREDICT_STEPS=1 timeout 1800 python evals/long_run.py --duration 120 \
  --path street --speed 0.75 --images --tracker device --platform tpu \
  --prerender --out $OUT --tag d120_pred1
timeout 1800 python evals/long_run.py --duration 120 --path street \
  --speed 0.75 --images --tracker cv --platform tpu --prerender \
  --out $OUT --tag c120_base
echo DONE_DIAG_TRACKER
