"""bernoulli_logit_glm logistic regression (BASELINE.md config 2).

Synthetic 100k x 50 design by default (the reference repo ships no data);
the likelihood is the fused GLM kernel — one MXU matmul per gradient
evaluation (ref semantics: ``bernoulli_logit_glm_lpmf.hpp:112-137``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from math_tpu import dists, transforms
from math_tpu.model import make_log_density


def synthetic_data(n=100_000, k=50, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, k)).astype(dtype)
    beta_true = (rng.normal(size=k) * 0.3).astype(dtype)
    alpha_true = np.float32(0.4)
    eta = X @ beta_true + alpha_true
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))).astype(dtype)
    return X, y, beta_true, alpha_true


def make(k: int):
    """alpha ~ normal(0, 5); beta ~ normal(0, 2); y ~ bernoulli_logit_glm.

    Data (X, y) flows through ``model.logp(theta, X, y)`` / samplers'
    ``args=(X, y)`` so the 100k x 50 design stays an XLA parameter.
    """

    def log_prob(p, X, y):
        alpha, beta = p["alpha"], p["beta"]
        lp = dists.normal_lpdf(alpha, 0.0, 5.0, propto=True)
        lp += dists.normal_lpdf(beta, 0.0, 2.0, propto=True)
        lp += dists.bernoulli_logit_glm_lpmf(y, X, alpha, beta, propto=True)
        return lp

    return make_log_density(
        {
            "alpha": transforms.Identity(shape=()),
            "beta": transforms.Identity(shape=(k,)),
        },
        log_prob,
    )
