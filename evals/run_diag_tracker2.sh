#!/bin/bash
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=evals/diag_tracker_r5.json
while ! grep -q DONE_DIAG_TRACKER evals/diag_tracker_r5.log 2>/dev/null; do sleep 15; done
CERB_PREDICT_STEPS=1 timeout 1800 python evals/long_run.py --duration 120 \
  --path street --speed 0.75 --images --tracker cv --platform tpu \
  --prerender --out $OUT --tag c120_pred1
echo DONE_DIAG_TRACKER2
