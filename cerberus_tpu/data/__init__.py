from cerberus_tpu.data.simulator import SimConfig, simulate  # noqa: F401
