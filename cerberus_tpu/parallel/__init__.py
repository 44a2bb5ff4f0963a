from cerberus_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
from cerberus_tpu.parallel.batched import (  # noqa: F401
    batched_solve, pooled_calibration_step,
)
