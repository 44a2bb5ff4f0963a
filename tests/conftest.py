"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths compile
and execute without TPU hardware (SURVEY.md §4: multi-host tests via
xla_force_host_platform_device_count fakes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may point at the TPU
# persistent compilation cache: the suite's wall time is dominated by
# recompiling the same window-solver programs in every test process
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize pre-imports jax with JAX_PLATFORMS baked in, so the env vars
# alone are not enough — override via config too (incl. the compile cache:
# the env var above is read at import time, which already happened).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap process memory: the suite jit-compiles many large programs; without
    this, accumulated executables/buffers eventually segfault CPU XLA."""
    yield
    jax.clear_caches()
