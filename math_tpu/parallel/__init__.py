from math_tpu.parallel.mesh import (  # noqa: F401
    chain_mesh,
    sample_nuts_sharded,
    sharded_data_logdensity,
)
