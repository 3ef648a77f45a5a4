from math_tpu.parallel.mesh import (  # noqa: F401
    chain_mesh,
    initialize_multihost,
    sample_nuts_sharded,
    sharded_data_logdensity,
)
