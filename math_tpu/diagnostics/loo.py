"""PSIS-LOO cross-validation and WAIC (downstream `loo` package parity).

Vehtari, Gelman, Gabry (2017): approximate leave-one-out expected log
predictive density from posterior draws by importance sampling with
PSIS-stabilized weights (``diagnostics.psis``), plus WAIC and paired
model comparison.  The reference C++ library has no model-comparison
layer; this fills the role its downstream ecosystem (the `loo` R
package / ArviZ) plays for Stan users, the same way ``infer.pathfinder``
fills the Pathfinder service's.

Inputs are pointwise log-likelihood matrices — ``log_lik[..., s, i] =
log p(y_i | theta_s)`` with draws flattened over chains — produced by
``jax.vmap`` of the model's per-observation log likelihood over draws
(see ``pointwise_log_lik`` for the one-liner).

Host-side numpy like the rest of the diagnostics layer: these run once
per analysis, not per transition.
"""

from __future__ import annotations

import warnings
from typing import Callable, NamedTuple

import numpy as np

from math_tpu.diagnostics.psis import psis_smooth


class LooResult(NamedTuple):
    elpd_loo: float  # expected log pointwise predictive density (sum)
    se_elpd_loo: float
    p_loo: float  # effective number of parameters
    looic: float  # -2 elpd_loo (deviance scale)
    pointwise: np.ndarray  # (n_obs,) elpd_loo_i
    pareto_k: np.ndarray  # (n_obs,) PSIS shape diagnostics
    n_bad_k: int  # observations with k_hat > 0.7 (unreliable)


class WaicResult(NamedTuple):
    elpd_waic: float
    se_elpd_waic: float
    p_waic: float
    waic: float  # -2 elpd_waic
    pointwise: np.ndarray
    n_high_var: int  # observations with posterior log-lik var > 0.4


def _flatten_draws(log_lik):
    ll = np.asarray(log_lik, dtype=np.float64)
    if ll.ndim == 3:  # (chains, draws, n_obs)
        ll = ll.reshape(-1, ll.shape[-1])
    if ll.ndim != 2:
        raise ValueError(
            "log_lik must be (draws, n_obs) or (chains, draws, n_obs); got "
            f"shape {ll.shape}"
        )
    return ll


def _logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    out = m.squeeze(axis) if axis is not None else m.reshape(())
    return out + np.log(np.sum(np.exp(a - m), axis=axis))


def loo(log_lik, *, k_threshold: float = 0.7) -> LooResult:
    """PSIS-LOO elpd from a pointwise log-likelihood matrix.

    Per observation i the leave-one-out importance ratios are
    ``r_s = 1 / p(y_i | theta_s)``; their log weights are PSIS-smoothed
    and the elpd contribution is the self-normalized estimate

        elpd_i = logsumexp(lw_i + ll_i) - logsumexp(lw_i).

    ``pareto_k[i] > 0.7`` flags an unreliable contribution (refit without
    observation i, or use moment matching); the count is surfaced and
    warned on, never silently dropped.
    """
    ll = _flatten_draws(log_lik)
    s, n = ll.shape
    pointwise = np.empty(n)
    ks = np.empty(n)
    for i in range(n):
        lw, k = psis_smooth(-ll[:, i])
        pointwise[i] = _logsumexp(lw + ll[:, i]) - _logsumexp(lw)
        ks[i] = k
    lpd = _logsumexp(ll, axis=0) - np.log(s)  # in-sample pointwise lpd
    p_loo = float(np.sum(lpd - pointwise))
    elpd = float(np.sum(pointwise))
    se = float(np.sqrt(n * np.var(pointwise)))
    n_bad = int(np.sum(ks > k_threshold))
    if n_bad:
        warnings.warn(
            f"PSIS-LOO: {n_bad}/{n} observations have Pareto k_hat > "
            f"{k_threshold}; their elpd contributions are unreliable "
            "(consider refitting without them or moment matching)",
            stacklevel=2,
        )
    return LooResult(elpd, se, p_loo, -2.0 * elpd, pointwise, ks, n_bad)


def waic(log_lik) -> WaicResult:
    """Widely applicable information criterion (Watanabe 2010; the
    variance-based p_waic of Gelman, Hwang, Vehtari 2014 eq. 12)."""
    ll = _flatten_draws(log_lik)
    s, n = ll.shape
    lpd = _logsumexp(ll, axis=0) - np.log(s)
    p_i = np.var(ll, axis=0, ddof=1)
    pointwise = lpd - p_i
    n_high = int(np.sum(p_i > 0.4))
    if n_high:
        warnings.warn(
            f"WAIC: {n_high}/{n} observations have posterior log-lik "
            "variance > 0.4; p_waic is unreliable there — prefer PSIS-LOO",
            stacklevel=2,
        )
    elpd = float(np.sum(pointwise))
    se = float(np.sqrt(n * np.var(pointwise)))
    return WaicResult(elpd, se, float(np.sum(p_i)), -2.0 * elpd, pointwise,
                      n_high)


class LooComparison(NamedTuple):
    elpd_diff: float  # elpd_a - elpd_b (positive favors model a)
    se_diff: float  # paired SE of the pointwise differences
    z: float  # elpd_diff / se_diff


def loo_compare(a: LooResult, b: LooResult) -> LooComparison:
    """Paired comparison of two LOO results on the SAME observations.

    The SE uses the pointwise differences (the `loo` package's
    ``loo_compare``), which is much tighter than differencing the two
    marginal SEs when the models' pointwise elpds are correlated.
    """
    if a.pointwise.shape != b.pointwise.shape:
        raise ValueError(
            "loo_compare needs results on the same observations; got "
            f"{a.pointwise.shape} vs {b.pointwise.shape}"
        )
    d = a.pointwise - b.pointwise
    n = d.size
    diff = float(np.sum(d))
    se = float(np.sqrt(n * np.var(d)))
    return LooComparison(diff, se, diff / se if se > 0 else np.inf)


def pointwise_log_lik(log_lik_fn: Callable, draws, *args) -> np.ndarray:
    """(draws..., n_obs) pointwise log-likelihood matrix from a model's
    per-observation log-lik function, vmapped over the draw axes.

    ``log_lik_fn(theta, *args) -> (n_obs,)``; ``draws`` is (draws, dim)
    or (chains, draws, dim) — the chain axes are vmapped in one jit.
    """
    import jax

    f = log_lik_fn
    draws_arr = draws
    for _ in range(np.ndim(draws_arr) - 1):
        f = jax.vmap(f, in_axes=(0,) + (None,) * len(args))
    return np.asarray(jax.jit(f)(draws_arr, *args))
