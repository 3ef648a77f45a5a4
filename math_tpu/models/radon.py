"""Radon varying-intercept/varying-slope hierarchical model
(BASELINE.md config 3), non-centered parameterization.

    mu_a ~ normal(0, 10); mu_b ~ normal(0, 10)
    sigma_a, sigma_b, sigma_y ~ half-normal(0, 1)
    a_c = mu_a + sigma_a * za_c;  b_c = mu_b + sigma_b * zb_c
    y_i ~ normal(a_{county[i]} + b_{county[i]} * x_i, sigma_y)

Synthetic county-structured data stands in for the classic Minnesota radon
dataset (not shipped with the reference).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from math_tpu import dists, transforms
from math_tpu.model import make_log_density
from math_tpu.ops import segment


def synthetic_data(n_counties=85, n_obs=919, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    county = rng.integers(0, n_counties, n_obs)
    x = rng.integers(0, 2, n_obs).astype(dtype)  # floor indicator
    a_true = 1.5 + 0.3 * rng.normal(size=n_counties)
    b_true = -0.7 + 0.2 * rng.normal(size=n_counties)
    y = (a_true[county] + b_true[county] * x + 0.75 * rng.normal(size=n_obs)).astype(
        dtype
    )
    return county.astype(np.int32), x, y


def make(n_counties: int):
    def log_prob(p, county, x, y):
        mu_a, mu_b = p["mu_a"], p["mu_b"]
        sigma_a, sigma_b, sigma_y = p["sigma_a"], p["sigma_b"], p["sigma_y"]
        za, zb = p["za"], p["zb"]
        lp = dists.normal_lpdf(mu_a, 0.0, 10.0, propto=True)
        lp += dists.normal_lpdf(mu_b, 0.0, 10.0, propto=True)
        lp += dists.normal_lpdf(sigma_a, 0.0, 1.0, propto=True)
        lp += dists.normal_lpdf(sigma_b, 0.0, 1.0, propto=True)
        lp += dists.normal_lpdf(sigma_y, 0.0, 1.0, propto=True)
        lp += dists.std_normal_lpdf(za, propto=True)
        lp += dists.std_normal_lpdf(zb, propto=True)
        a = mu_a + sigma_a * za
        b = mu_b + sigma_b * zb
        # a[county] + b[county] * x as one-hot MXU matmuls: the gather's
        # scatter-add VJP is 1.7-1.9x slower on TPU (v5e, 1024 chains);
        # the one-hot build is loop-invariant and hoisted out of the
        # sampler's scan.  See ops/segment.py.
        M = segment.onehot_matrix(county, n_counties, x.dtype)
        mu = M @ a + (M @ b) * x
        lp += dists.normal_lpdf(y, mu, sigma_y, propto=True)
        return lp

    return make_log_density(
        {
            "mu_a": transforms.Identity(shape=()),
            "mu_b": transforms.Identity(shape=()),
            "sigma_a": transforms.LowerBound(shape=(), lb=0.0),
            "sigma_b": transforms.LowerBound(shape=(), lb=0.0),
            "sigma_y": transforms.LowerBound(shape=(), lb=0.0),
            "za": transforms.Identity(shape=(n_counties,)),
            "zb": transforms.Identity(shape=(n_counties,)),
        },
        log_prob,
    )
