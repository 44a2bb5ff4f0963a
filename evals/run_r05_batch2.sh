#!/bin/bash
# Round-5 batch 2: waits for batch 1 to drain, then runs the tracker A/B
# rerun (trimmed detection-stereo + 2-step prediction for the pipelined
# front-end), the lane-Cholesky bench experiments, the feature-mode
# headline refresh, and the config sweep.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=LONGRUN_RESULTS.json
# wait for batch 1's completion marker (a process-liveness check can fire
# in the gap between batch-1 stages)
while ! grep -q DONE_R05_BATCH1 evals/r05_batch1.log 2>/dev/null; do
  sleep 30
done

# tracker A/B with the r5b front-end fixes
timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker device --platform tpu --prerender \
  --out $OUT --tag street_300s_img_device_r5b
timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker cv --platform tpu --prerender \
  --out $OUT --tag street_300s_img_cv_r5b

# solver throughput experiments: XLA vmap path vs lane-batched path vs
# lane + 'high' GEMMs
(BENCH_LANE_CHOL=0 timeout 1800 python bench.py | tail -1 \
  > /tmp/bench_xla.json) 2>/dev/null
(BENCH_LANE_CHOL=1 timeout 1800 python bench.py | tail -1 \
  > /tmp/bench_lane.json) 2>/dev/null
(BENCH_LANE_CHOL=1 BENCH_GEMM_PRECISION=high timeout 1800 python bench.py \
  | tail -1 > /tmp/bench_lane_high.json) 2>/dev/null
python - <<'EOF'
import json
out = {}
for name, path in [("xla_vmap", "/tmp/bench_xla.json"),
                   ("lane_chol", "/tmp/bench_lane.json"),
                   ("lane_chol_gemm_high", "/tmp/bench_lane_high.json")]:
    try:
        with open(path) as f:
            out[name] = json.loads(f.read().strip().splitlines()[-1])
    except Exception as e:
        out[name] = {"error": str(e)}
with open("BENCH_EXPERIMENTS.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF

# 470 s loop rerun on final code (the batch-1 470 s run started seconds
# before the 2-step-prediction commit landed)
timeout 5400 python evals/long_run.py --duration 470 --path street \
  --speed 0.75 --images --tracker cv --loop --platform tpu --prerender \
  --loop-record /root/repo/evals/loop_records_470s.pkl \
  --out $OUT --tag street_470s_img_loop_r5b

# feature-mode headline refresh on final code
timeout 5400 python evals/long_run.py --duration 450 --path street \
  --speed 0.75 --platform tpu --out $OUT --tag street_450s_full_r5

echo DONE_R05_BATCH2
