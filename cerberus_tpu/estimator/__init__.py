from cerberus_tpu.estimator.packing import pack_window_data, whiten_chol  # noqa: F401
from cerberus_tpu.estimator.initial_sfm import (  # noqa: F401
    calibrate_ex_rotation,
    global_sfm,
    relative_pose_ransac,
    visual_imu_alignment,
)
