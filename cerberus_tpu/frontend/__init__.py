from cerberus_tpu.frontend.ekf import EKFParams, EKFState, LeggedEKF, ekf_init, ekf_step  # noqa: F401
