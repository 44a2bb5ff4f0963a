#!/bin/bash
# Round-3 eval battery (VERDICT r2 items 2,4,5,7,9). Each eval is its own
# process so a relay drop kills at most one entry.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=LONGRUN_RESULTS.json

# 1. Go1 configuration long run (force-sigmoid contacts, leg bias fixed)
timeout 3600 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --robot go1 --platform tpu --out $OUT --tag street_300s_go1

# 2. Loop closure on a revisit-heavy street circuit (2+ laps), image pipeline
timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker cv --loop --platform tpu --out $OUT \
  --tag street_300s_img_loop_r3

# 3. On-device KLT front-end in anger
timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker device --platform tpu --out $OUT \
  --tag street_300s_img_device

# 4. Config sweep at >=60 s (configs 1-6, incl. EKF-only refresh)
timeout 5400 python evals/run_configs.py --duration 60 --platform tpu \
  --out CONFIG_RESULTS.json

# 5. A1 street full-VILO refresh on the fused streaming path
timeout 3600 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --platform tpu --out $OUT --tag street_300s_full_r3
echo DONE_R03
