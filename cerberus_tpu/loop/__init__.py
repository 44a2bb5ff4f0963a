from cerberus_tpu.loop.posegraph import PoseGraph, optimize_pose_graph  # noqa: F401
