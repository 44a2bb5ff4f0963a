"""Multi-process jax.distributed smoke test.

SURVEY §5 names jax.distributed + a mesh over ICI/DCN as the framework's
communication backend; parallel/mesh.py wraps jax.distributed.initialize but
(through r3) no test ever executed it. This test launches TWO separate
Python processes with a localhost coordinator, initializes the distributed
runtime in each (CPU backend, 2 virtual devices per process), builds a mesh
spanning both processes' devices, runs a global-sum collective across them,
and executes the production batched window solve sharded over the
cross-process mesh — so multi-host init, global device enumeration, and a
real collective all execute for the first time.

Marked slow: spawns subprocesses and compiles in each.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
repo = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")

from cerberus_tpu.parallel.mesh import init_distributed, make_mesh

init_distributed(coordinator=f"localhost:{port}", num_processes=nproc,
                 process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()   # global view
assert len(jax.local_devices()) == 2

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()          # spans BOTH processes' devices
assert mesh.devices.size == 2 * nproc

# global collective across the mesh: each process contributes pid+1 per row
local = np.full((2, 4), float(pid + 1))
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("batch")), local, (2 * nproc, 4))
total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, P()))(arr)
want = float(sum(2 * 4 * (i + 1) for i in range(nproc)))
got = float(jax.device_get(total))
assert got == want, (got, want)

# production batched window solve sharded across the two processes
from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.window_builder import build_window_from_sim
from cerberus_tpu.ops.solver import SolveOptions, solve_window

dtype = jnp.float32
cfg = EstimatorConfig(dtype="float32")
sim = simulate(SimConfig(duration=6.0, speed=0.5, seed=3))
data, truth, _ = build_window_from_sim(sim, cfg, dtype=dtype)
B = 2 * nproc  # one window per global device

def perturb(i):
    r = np.random.default_rng(i)
    return truth._replace(
        p=truth.p + jnp.asarray(r.normal(size=(11, 3)) * 0.03, dtype),
        v=truth.v + jnp.asarray(r.normal(size=(11, 3)) * 0.05, dtype))

# every process builds the full global batch deterministically, then takes
# its local shard rows — the standard multi-host data layout
states_g = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *[perturb(i) for i in range(B)])
datas_g = jax.tree.map(lambda x: np.broadcast_to(
    np.asarray(x)[None], (B,) + np.asarray(x).shape), data)
sh = NamedSharding(mesh, P("batch"))
rows = slice(2 * pid, 2 * pid + 2)
states = jax.tree.map(lambda x: jax.make_array_from_process_local_data(
    sh, np.ascontiguousarray(x[rows]), x.shape), states_g)
datas = jax.tree.map(lambda x: jax.make_array_from_process_local_data(
    sh, np.ascontiguousarray(x[rows]), x.shape), datas_g)
opts = SolveOptions(max_iters=2)
solve = jax.jit(jax.vmap(lambda s, d: solve_window(s, d, opts)[1].cost),
                out_shardings=NamedSharding(mesh, P()))
cost = jax.device_get(jnp.sum(solve(states, datas)))
assert np.isfinite(float(cost)), cost
print(f"proc {pid}: collective ok ({got}), sharded solve cost "
      f"{float(cost):.3f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_collective_and_solve(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    port = "53517"
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), "2", port,
                          repo],
                         cwd=repo, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert "collective ok" in out
