from cerberus_tpu.estimator.packing import pack_window_data, whiten_chol  # noqa: F401
