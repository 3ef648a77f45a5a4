from math_tpu.diagnostics.convergence import (  # noqa: F401
    split_rhat,
    rhat,
    ess,
    ess_bulk,
    ess_tail,
    summary,
)
from math_tpu.diagnostics.psis import psis_smooth, gpd_fit  # noqa: F401
from math_tpu.diagnostics.sbc import (  # noqa: F401
    SbcResult,
    sbc_rank,
    sbc_uniformity,
)
from math_tpu.diagnostics.loo import (  # noqa: F401
    LooComparison,
    LooResult,
    WaicResult,
    loo,
    loo_compare,
    pointwise_log_lik,
    waic,
)
