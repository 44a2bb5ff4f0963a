from cerberus_tpu.utils import lie  # noqa: F401
