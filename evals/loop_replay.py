#!/usr/bin/env python
"""Offline loop-back-end replay: re-run the LoopCloser pipeline over a
RECORDED keyframe stream (long_run --loop-record) under different
weighting/gating, scoring corrected vs odometric ATE against ground truth
— a full parameter sweep costs CPU seconds instead of a 10-minute TPU
estimator run each.

Usage:
  python evals/loop_replay.py RECORDS.pkl --duration 470 --path street \
      --speed 0.75 --seed 77 [--sweep] [--out LOOP_SWEEP.json]

The sim args must match the run that produced the records (ground truth is
regenerated from the seed).
"""
import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def run_variant(records, gt_of_t, **kw):
    from cerberus_tpu.data.replay import score
    from cerberus_tpu.loop.closer import LoopCloser

    closer = LoopCloser(**kw)
    for rec in records:
        closer.add_keyframe_precomputed(rec)
    closer.finish()
    kf_t = closer.times()
    gt = gt_of_t(kf_t)
    m_c = score(closer.corrected(), gt)
    m_o = score(closer.odometric(), gt)
    return dict(loops=closer.loops_found, rejected=closer.loops_rejected,
                rollbacks=closer.pg.stats["rollbacks"],
                pruned=closer.pg.stats["pruned_edges"],
                nodes=closer.pg.n,
                corrected_ate=round(m_c["ate_rmse"], 4),
                corrected_drift=round(m_c["drift_pct"], 4),
                odometric_ate=round(m_o["ate_rmse"], 4),
                odometric_drift=round(m_o["drift_pct"], 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("records")
    ap.add_argument("--duration", type=float, required=True)
    ap.add_argument("--path", default="street")
    ap.add_argument("--speed", type=float, default=0.75)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from cerberus_tpu.data import SimConfig, simulate

    with open(args.records, "rb") as f:
        records = pickle.load(f)
    print(f"{len(records)} keyframe records", flush=True)

    sim = simulate(SimConfig(duration=args.duration, speed=args.speed,
                             path=args.path, seed=args.seed))

    def gt_of_t(ts):
        return np.column_stack([np.interp(ts, sim["t"], sim["p"][:, i])
                                for i in range(3)])

    results = {}
    if args.sweep:
        variants = [
            ("default", {}),
            ("loop_w5", dict(loop_weight=5.0)),
            ("loop_w2", dict(loop_weight=2.0)),
            ("loop_w1", dict(loop_weight=1.0)),
            ("seq300_loop5", dict(seq_weight=300.0, loop_weight=5.0)),
            ("seq300_loop2", dict(seq_weight=300.0, loop_weight=2.0)),
            ("huber", dict(robust_kind="huber")),
            ("huber_loop2", dict(robust_kind="huber", loop_weight=2.0)),
            ("min_matches20", dict(min_matches=20)),
            ("min_matches20_loop2", dict(min_matches=20, loop_weight=2.0)),
            ("strongsim", dict(min_sim=0.7)),
        ]
    else:
        variants = [("default", {})]
    for name, kw in variants:
        t0 = time.time()
        r = run_variant(records, gt_of_t, **kw)
        r["wall_s"] = round(time.time() - t0, 1)
        results[name] = r
        print(name, json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
