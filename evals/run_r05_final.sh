#!/bin/bash
# Final round-5 stages after the predict_steps fix.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=LONGRUN_RESULTS.json

# 300 s tracker A/B on the fixed default (1-step prediction)
timeout 3600 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker device --platform tpu --prerender \
  --out $OUT --tag street_300s_img_device_r5c
timeout 3600 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker cv --platform tpu --prerender \
  --out $OUT --tag street_300s_img_cv_r5c
echo DONE_FINAL_AB

# solver throughput experiments
(BENCH_LANE_CHOL=0 timeout 1800 python bench.py | tail -1 \
  > /tmp/bench_xla.json) 2>/dev/null
(BENCH_LANE_CHOL=1 timeout 1800 python bench.py | tail -1 \
  > /tmp/bench_lane.json) 2>/dev/null
(BENCH_LANE_CHOL=1 BENCH_GEMM_PRECISION=high timeout 1800 python bench.py \
  | tail -1 > /tmp/bench_lane_high.json) 2>/dev/null
python - <<'PYEOF'
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
PYEOF
echo DONE_FINAL_BENCHEXP

# batched-path attribution
timeout 1800 python evals/profile_batched.py --batch 128 \
  --out PROFILE_BATCHED.json
echo DONE_FINAL_PROFBATCH

# config sweep 2-6 on TPU (config 1 already refreshed on CPU)
timeout 3600 python evals/run_configs.py --duration 60 --platform tpu \
  --configs 2,3,4,5,6 --out CONFIG_RESULTS.json
echo DONE_FINAL_CONFIGS

# multichip scaling curve (CPU)
timeout 2400 python evals/multichip_scaling.py --devices 1,2,4,8 \
  --batch-per-device 16 --platform cpu --out MULTICHIP_SCALING_r05.json
echo DONE_R05_FINAL
