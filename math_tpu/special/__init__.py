"""Scalar special functions (reference: ``stan/math/prim/scal/fun/``).

Pure jnp implementations; gradients come from JAX tracing rather than
hand-written ``vari`` nodes (ref: ``rev/scal/fun/*``).  Functions that JAX
already provides (``gammaln``, ``digamma``, ``betainc``, ...) are re-exported
under their Stan names so downstream code reads like the reference API.
"""

from math_tpu.special.basic import (  # noqa: F401
    LOG_TWO,
    LOG_PI,
    LOG_SQRT_TWO_PI,
    LOG_TWO_PI,
    SQRT_TWO,
    inv_logit,
    log_inv_logit,
    log1m_inv_logit,
    logit,
    log1m,
    log1p_exp,
    log1m_exp,
    log_diff_exp,
    log_sum_exp,
    log_mix,
    log1m_p,
    multiply_log,
    lmultiply,
    binary_log_loss,
    log_falling_factorial,
    log_rising_factorial,
    lbeta,
    lchoose,
    lgamma,
    lmgamma,
    digamma,
    trigamma,
    Phi,
    log_Phi,
    Phi_approx,
    inv_Phi,
    erf,
    erfc,
    inv_erfc,
    gamma_p,
    gamma_q,
    inv,
    inv_sqrt,
    inv_square,
    square,
    cbrt,
    hypot,
    log_modified_bessel_first_kind,
    log_i0,
    expm1,
    fma,
    logaddexp,
)
from math_tpu.special.basic import (  # noqa: F401
    beta,
    choose,
    falling_factorial,
    rising_factorial,
    inv_cloglog,
    log_inv_logit_diff,
    step,
    int_step,
    sign,
)
from math_tpu.special.owens_t import owens_t  # noqa: F401
from math_tpu.special.incbeta import (  # noqa: F401
    inc_beta,
    inc_beta_dda,
    inc_beta_ddb,
    inc_beta_ddz,
    grad_2F1,
    grad_F32,
)
from math_tpu.special.bessel import (  # noqa: F401
    bessel_first_kind,
    bessel_second_kind,
    modified_bessel_first_kind,
    modified_bessel_second_kind,
)
from math_tpu.special.hyper import (  # noqa: F401
    F32,
    grad_inc_beta,
    grad_reg_inc_beta,
    grad_reg_inc_gamma,
    grad_reg_lower_inc_gamma,
)
