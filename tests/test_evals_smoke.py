"""Smoke tests for the evaluation harnesses themselves.

The r2 config sweep crashed mid-run on a harness bug (planar-score shape,
fixed in 58d2857) — these guard the CLI entry points end-to-end at tiny
durations so harness bitrot is caught by CI, not by an expensive TPU run.
Marked slow: each spawns a fresh interpreter (jit re-compilation)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           JAX_COMPILATION_CACHE_DIR=os.environ.get(
               "JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))


def _run(args, timeout=900):
    return subprocess.run([sys.executable] + args, cwd=ROOT, env=ENV,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_long_run_cli_smoke(tmp_path):
    out = str(tmp_path / "lr.json")
    r = _run(["evals/long_run.py", "--duration", "6", "--path", "arc",
              "--platform", "cpu", "--out", out, "--tag", "smoke"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))["smoke"]
    assert res["solves"] > 0 and res["drift_pct"] < 10.0


@pytest.mark.slow
def test_run_configs_cli_smoke(tmp_path):
    out = str(tmp_path / "cfg.json")
    r = _run(["evals/run_configs.py", "--duration", "5", "--configs", "1,2",
              "--platform", "cpu", "--out", out])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    assert "1_ekf_only" in res and "2_imu_leg_only" in res
    assert res["1_ekf_only"]["no_slip"]["drift_pct"] < 20.0


@pytest.mark.slow
def test_replay_cli_smoke(tmp_path):
    csv = str(tmp_path / "out.csv")
    r = _run(["-m", "cerberus_tpu.data.replay", "--sim", "6",
              "--path", "arc", "--platform", "cpu", "--csv", csv])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(csv) and len(open(csv).readlines()) > 2
