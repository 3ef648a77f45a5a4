"""GP regression with Cholesky-parameterized latent f (BASELINE.md config 5).

    rho ~ inv_gamma(5, 5); alpha ~ std_normal+; sigma ~ std_normal+
    f = cholesky(K_exp_quad(x; alpha, rho) + 1e-8 I) @ eta,  eta ~ std_normal
    y ~ normal(f, sigma)

The K + Cholesky pair dominates cost (O(N^2) + O(N^3) on the MXU);
the reference offloads exactly this to OpenCL above N=1250
(``opencl_context.hpp:168``) — on TPU it is simply the native path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu import dists, transforms
from math_tpu.model import make_log_density
from math_tpu.ops import gp as gp_ops
from math_tpu.ops.cholesky import (
    cholesky_decompose_tpu,
    spd_solve_logdiag_tpu,
)


def synthetic_data(n=2000, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-3, 3, n)).astype(dtype)
    f = np.sin(2 * x) * np.exp(-0.2 * np.abs(x)) * 2.0
    y = (f + rng.normal(size=n) * 0.3).astype(dtype)
    return x, y


def make(n: int, jitter=1e-8):
    def log_prob(p, x, y):
        rho, alpha, sigma, eta = p["rho"], p["alpha"], p["sigma"], p["eta"]
        lp = dists.inv_gamma_lpdf(rho, 5.0, 5.0, propto=True)
        lp += dists.normal_lpdf(alpha, 0.0, 2.0, propto=True)
        lp += dists.normal_lpdf(sigma, 0.0, 1.0, propto=True)
        lp += dists.std_normal_lpdf(eta, propto=True)
        k = gp_ops.add_diag(gp_ops.gp_exp_quad_cov(x, alpha, rho), jitter)
        # scan-blocked above the dispatch threshold: XLA's chol VJP compile
        # blows up / crashes the TPU worker at n ~ 2000 (ops/cholesky.py)
        L = cholesky_decompose_tpu(k)
        with jax.default_matmul_precision("float32"):
            f = L @ eta
        lp += dists.normal_lpdf(y, f, sigma, propto=True)
        return lp

    return make_log_density(
        {
            "rho": transforms.LowerBound(shape=(), lb=0.0),
            "alpha": transforms.LowerBound(shape=(), lb=0.0),
            "sigma": transforms.LowerBound(shape=(), lb=0.0),
            "eta": transforms.Identity(shape=(n,)),
        },
        log_prob,
    )


def make_marginal(n: int, jitter=1e-3):
    """Analytically marginalized GP regression: y ~ MVN(0, K + sigma^2 I).

    The standard Stan formulation when only hyperparameters are inferred
    (the reference's GP docs marginalize the latent f for Gaussian
    likelihoods); the 3-dim posterior mixes orders of magnitude faster than
    the 2003-dim latent-f parameterization while the per-leapfrog cost is
    the same O(n^3) blocked Cholesky.
    """

    def log_prob(p, x, y):
        rho, alpha, sigma = p["rho"], p["alpha"], p["sigma"]
        lp = dists.inv_gamma_lpdf(rho, 5.0, 5.0, propto=True)
        lp += dists.normal_lpdf(alpha, 0.0, 2.0, propto=True)
        lp += dists.normal_lpdf(sigma, 0.0, 1.0, propto=True)
        k = gp_ops.add_diag(
            gp_ops.gp_exp_quad_cov(x, alpha, rho),
            jnp.square(sigma) + jitter,
        )
        # one fused blocked factorization: solve + log-det share the
        # Pallas block inverses (XLA's chol / triangular_solve compile
        # pathologically at n ~ 2000 through the remote relay)
        z, slogdiag = spd_solve_logdiag_tpu(k, y)
        lp += -0.5 * jnp.sum(jnp.square(z)) - slogdiag
        return lp

    return make_log_density(
        {
            "rho": transforms.LowerBound(shape=(), lb=0.0),
            "alpha": transforms.LowerBound(shape=(), lb=0.0),
            "sigma": transforms.LowerBound(shape=(), lb=0.0),
        },
        log_prob,
    )
