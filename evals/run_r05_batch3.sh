#!/bin/bash
# Round-5 batch 3: final-code refreshes — 900 s multi-lap loop run with the
# frame-consistent pose graph (+ keyframe recording), the config sweep, the
# multichip scaling curve (CPU, serialized after the TPU work so neither
# contends for the 2 host cores), and a canonical bench preview.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=LONGRUN_RESULTS.json
while ! grep -q DONE_R05_BATCH2 evals/r05_batch2.log 2>/dev/null; do
  sleep 30
done

timeout 7200 python evals/long_run.py --duration 900 --path street \
  --speed 0.75 --images --tracker cv --loop --loop-kf-dist 0.6 \
  --platform tpu --prerender \
  --loop-record /root/repo/evals/loop_records_900s.pkl \
  --out $OUT --tag street_900s_img_loop_r5b

timeout 7200 python evals/run_configs.py --duration 60 --platform tpu \
  --out CONFIG_RESULTS.json

timeout 3600 python evals/multichip_scaling.py --devices 1,2,4,8 \
  --batch-per-device 16 --platform cpu --out MULTICHIP_SCALING_r05.json

timeout 1800 python bench.py > /tmp/bench_final.json 2>/dev/null || true
tail -1 /tmp/bench_final.json

echo DONE_R05_BATCH3
