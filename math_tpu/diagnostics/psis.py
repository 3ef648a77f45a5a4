"""Pareto-smoothed importance sampling (PSIS).

Vehtari, Simpson, Gelman, Yao, Gabry (2024): fit a generalized Pareto
distribution to the largest importance ratios, replace them by the
expected order statistics of the fit, truncate at the raw maximum, and
report the shape k_hat as a reliability diagnostic (k_hat < 0.7 usable).
The GPD fit is the Zhang & Stephens (2009) quasi-Bayesian profile
estimator, as in Stan's PSIS implementation (downstream: loo /
pathfinder's importance resampling).

Host-side numpy: PSIS runs once per analysis on an (N,) weight vector —
not a device-hot path.
"""

from __future__ import annotations

import numpy as np


def gpd_fit(x):
    """(k, sigma) of a generalized Pareto fit to exceedances ``x`` >= 0.

    Zhang & Stephens (2009) profile posterior-mean estimator; the same
    estimator PSIS prescribes (no location parameter; x are exceedances
    over the cutpoint).
    """
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if n < 5 or x[-1] <= 0:
        return 0.5, float(max(x.mean() if n else 1.0, 1e-300))
    x = np.maximum(x, 1e-300 * x[-1])  # guard exact-tie zeros
    prior_bs = 3.0
    m = 30 + int(np.sqrt(n))
    jj = np.arange(1, m + 1)
    xstar = max(x[int(np.floor(n / 4.0 + 0.5)) - 1], 1e-12 * x[-1])
    bs = 1.0 / x[-1] + (1.0 - np.sqrt(m / (jj - 0.5))) / (prior_bs * xstar)
    # Zhang-Stephens work in the k_ZS = -xi convention: F = 1-(1-bx)^{1/k},
    # b = k/sigma; profile MLE k(b) = -mean(log(1 - b x))
    ks = -np.mean(np.log1p(-bs[:, None] * x[None, :]), axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        L = n * (np.log(bs / ks) + ks - 1.0)
    L = np.where(np.isfinite(L), L, -np.inf)
    w = np.exp(L - L.max())
    w = w / w.sum()
    b = np.sum(bs * w)
    k_zs = -float(np.mean(np.log1p(-b * x)))
    sigma = k_zs / b
    k = -k_zs  # modern xi convention (positive = heavy tail)
    # PSIS regularization toward k=0.5 with 10 pseudo-observations
    k = (n * k + 5.0) / (n + 10.0)
    return float(k), float(sigma)


def psis_smooth(log_weights):
    """(smoothed log weights, k_hat) — the PSIS transform.

    Tail size M = min(0.2 n, 3 sqrt(n)) as prescribed; weights below the
    cutpoint are untouched; smoothed tail weights are truncated at the
    raw maximum.  k_hat > 0.7 signals an unreliable importance
    approximation (report it; do not silently resample).
    """
    lw = np.asarray(log_weights, dtype=np.float64).copy()
    n = lw.size
    if n < 10:
        return lw - lw.max(), float("inf")
    m = int(min(np.ceil(0.2 * n), np.ceil(3.0 * np.sqrt(n))))
    if m < 5:
        return lw - lw.max(), float("inf")
    lw_max = lw.max()
    lw = lw - lw_max  # stabilize; smoothing is shift-invariant
    order = np.argsort(lw)
    tail_idx = order[-m:]
    cut = lw[order[-m - 1]]
    exceed = np.exp(lw[tail_idx]) - np.exp(cut)
    k, sigma = gpd_fit(exceed)
    if np.isfinite(k) and sigma > 0:
        # expected order statistics of the fitted GPD
        p = (np.arange(1, m + 1) - 0.5) / m
        if abs(k) < 1e-12:
            q = -np.log1p(-p) * sigma
        else:
            q = sigma * np.expm1(-k * np.log1p(-p)) / k  # sigma*((1-p)^-k -1)/k
        smoothed = np.log(np.exp(cut) + q)
        # preserve the rank order of the original tail
        rank = np.argsort(lw[tail_idx])
        lw[tail_idx[rank]] = np.minimum(smoothed, 0.0)  # truncate at max
    return lw, float(k)
