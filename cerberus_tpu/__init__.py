"""cerberus_tpu — a TPU-native visual-inertial-leg odometry (VILO) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ShuoYangRobotics/Cerberus (reference: /root/reference): sliding-window
visual-inertial-leg state estimation for quadruped robots with

  * IMU + leg/contact preintegration (31-dim error state, ICRA 2023),
  * online kinematic calibration (per-leg rho parameters, RA-L 2022),
  * stereo visual reprojection factors with time-offset compensation,
  * Schur-complement marginalization priors,
  * a proprioceptive contact EKF front-end,

re-architected as a pure-functional, fixed-shape, batched estimation engine:
preintegration is a `lax.scan`, factor Jacobians come from AD at the manifold
tangent, the nonlinear solve is a batched Levenberg-Marquardt core with
Schur-on-depth, and everything vmaps/shards over a `jax.sharding.Mesh` batch
axis of independent estimation windows.
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Activate JAX's persistent compilation cache.

    The estimator uses ~6 large programs that are identical across runs;
    remote-TPU compiles take minutes each. Done here via jax.config (not the
    env var) because environments that pre-import jax in sitecustomize have
    already consumed JAX_COMPILATION_CACHE_DIR by the time user code runs.
    Opt out with CERBERUS_NO_COMPILE_CACHE=1."""
    import os
    if os.environ.get("CERBERUS_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax
        d = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/cerberus_tpu/jax"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from cerberus_tpu.config import EstimatorConfig, NoiseConfig, RobotModel  # noqa: F401
