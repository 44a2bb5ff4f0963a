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

from cerberus_tpu.config import EstimatorConfig, NoiseConfig, RobotModel  # noqa: F401
