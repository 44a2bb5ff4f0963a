#!/bin/bash
# Round-5 consolidated evidence battery (replaces run_r05{,_batch2,_batch3}.sh,
# which were queued before the final code landed — all commits are now in, so
# the pre-fix "_r5" duplicates are dropped and every run below is shipped-code).
# Ordered by VERDICT priority so the most important artifacts land first.
# All image runs use --prerender: frames render before the timed loop (a robot
# camera costs the VILO process nothing), so realtime_factor measures
# track->solve->adopt.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=LONGRUN_RESULTS.json

# 1. Robustness battery on final code (VERDICT 3: IMU-dropout bridge)
timeout 7200 python evals/robustness.py --duration 60 --platform tpu \
  --out ROBUSTNESS.json
echo DONE_STAGE_robustness60

# 2. Multi-lap loop evidence, shipped defaults (VERDICT 1) — 470 s then 900 s.
#    900 s also carries the prerendered image-mode realtime number (VERDICT 4).
timeout 5400 python evals/long_run.py --duration 470 --path street \
  --speed 0.75 --images --tracker cv --loop --platform tpu --prerender \
  --loop-record /root/repo/evals/loop_records_470s.pkl \
  --out $OUT --tag street_470s_img_loop_r5b
echo DONE_STAGE_loop470
timeout 7200 python evals/long_run.py --duration 900 --path street \
  --speed 0.75 --images --tracker cv --loop --loop-kf-dist 0.6 \
  --platform tpu --prerender \
  --loop-record /root/repo/evals/loop_records_900s.pkl \
  --out $OUT --tag street_900s_img_loop_r5
echo DONE_STAGE_loop900

# 3. Device/cv tracker A/B on the same 300 s sequence (VERDICT 2)
timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker device --platform tpu --prerender \
  --out $OUT --tag street_300s_img_device_r5b
timeout 5400 python evals/long_run.py --duration 300 --path street \
  --speed 0.75 --images --tracker cv --platform tpu --prerender \
  --out $OUT --tag street_300s_img_cv_r5b
echo DONE_STAGE_trackerAB

# 4. 300 s promotions of the two previously-failing cases (VERDICT 8)
timeout 7200 python evals/robustness.py --duration 300 --platform tpu \
  --cases td_init_-20ms,imu_dropout_2x1s --out ROBUSTNESS_300S.json
echo DONE_STAGE_robustness300

# 5. Solver throughput experiments (VERDICT 5): XLA vmap path vs lane-batched
#    Cholesky vs lane + 'high' GEMMs
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
echo DONE_STAGE_benchexp

# 6. Batched-path attribution (VERDICT 5) — writes PROFILE_BATCHED.json
timeout 3600 python evals/profile_batched.py --batch 128 \
  --out PROFILE_BATCHED.json
echo DONE_STAGE_profbatched

# 7. Config sweep on final code (VERDICT 6: EKF contact model)
timeout 7200 python evals/run_configs.py --duration 60 --platform tpu \
  --out CONFIG_RESULTS.json
echo DONE_STAGE_configs

# 8. Feature-mode headline refresh on final code
timeout 5400 python evals/long_run.py --duration 450 --path street \
  --speed 0.75 --platform tpu --out $OUT --tag street_450s_full_r5
echo DONE_STAGE_feature450

# 9. Multichip scaling curve (VERDICT 7) — CPU, after all TPU work so neither
#    contends for the 2 host cores
timeout 3600 python evals/multichip_scaling.py --devices 1,2,4,8 \
  --batch-per-device 16 --platform cpu --out MULTICHIP_SCALING_r05.json
echo DONE_STAGE_multichip

# 10. Canonical bench preview
timeout 1800 python bench.py 2>/dev/null | tail -1 | tee /tmp/bench_final.json

echo DONE_R05_MASTER
