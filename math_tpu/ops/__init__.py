from math_tpu.ops import gp  # noqa: F401
from math_tpu.ops import linalg  # noqa: F401
from math_tpu.ops.linalg import *  # noqa: F401,F403
from math_tpu.ops.gp import (  # noqa: F401
    gp_dot_prod_cov,
    gp_exp_quad_cov,
    gp_exponential_cov,
    gp_matern32_cov,
    gp_matern52_cov,
    gp_periodic_cov,
)
from math_tpu.ops.cholesky import (  # noqa: F401
    cholesky_blocked,
    cholesky_decompose_tpu,
)
from math_tpu.ops.chol_pallas import (  # noqa: F401
    chol_inv_block,
    cholesky_blocked_pallas,
)
from math_tpu.ops.segment import (  # noqa: F401
    onehot_matrix,
    segment_gather,
    segment_sum,
)
