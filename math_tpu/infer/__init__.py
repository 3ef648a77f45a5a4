from math_tpu.infer.nuts import nuts_kernel, IntegratorState, NutsStats  # noqa: F401
from math_tpu.infer.sample import sample_nuts, ChainResult  # noqa: F401
from math_tpu.infer.pooled import run_pooled_chains, PooledResult  # noqa: F401
from math_tpu.infer.advi import advi, advi_sample, ADVIResult  # noqa: F401
from math_tpu.infer.smc import (  # noqa: F401
    smc_tempered,
    smc_tempered_stagewise,
    SMCResult,
)
from math_tpu.infer.resume import sample_nuts_checkpointed  # noqa: F401
from math_tpu.infer.optimize import (  # noqa: F401
    map_estimate,
    laplace_sample,
    OptimizeResult,
    LaplaceResult,
)
from math_tpu.infer.pathfinder import pathfinder, PathfinderResult  # noqa: F401
from math_tpu.infer import adapt  # noqa: F401
