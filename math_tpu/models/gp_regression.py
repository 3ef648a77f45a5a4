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
    mdivide_left_tri_low_tpu,
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


def _mdivide_upper_from_lower(L, b):
    """(L^T)^{-1} b through the blocked LOWER solve: with P the index
    reversal, P L^T P is lower-triangular, so the upper solve is a flip,
    a lower solve, and a flip back (keeps the n~2000 path off XLA's
    pathologically-compiling triangular_solve lowering)."""
    Lf = jnp.flip(jnp.swapaxes(L, -1, -2), (-2, -1))
    return jnp.flip(mdivide_left_tri_low_tpu(Lf, jnp.flip(b, -1)), -1)


def sample_latent_conditional(key, hyper_draws, x, y, *, jitter=1e-3,
                              batch=16):
    """Exact draws of the latent f given hyperparameter draws: f | y, theta.

    For the Gaussian likelihood the latent field is conditionally
    Gaussian, so the latent-f posterior factorizes as
    p(theta | y) p(f | y, theta) and f can be recovered EXACTLY from
    marginal-NUTS hyperparameter draws — the same posterior as NUTS on
    the 2003-dim Cholesky-parameterized latent model, at marginal-model
    mixing speed.  (Stan's GP docs do exactly this: marginalize f,
    redraw it in generated quantities; ref: gp_exp_quad_cov.hpp users +
    multi_normal_rng.hpp.)

    Sampling uses Matheron's rule (pathwise conditioning) to avoid the
    f32-catastrophic cancellation of forming K - K A^{-1} K directly:

        f0 ~ N(0, K);  y0 = f0 + sigma z;  A = K + sigma^2 I
        f  = f0 + K A^{-1} (y - y0)   ~  N(K A^{-1} y, K - K A^{-1} K)

    ``hyper_draws``: (M, 3) CONSTRAINED (rho, alpha, sigma) draws.
    Returns (M, n) draws of f.  ``batch`` bounds HBM (each lane holds two
    n x n factorizations); draws stream through ``lax.map`` in batches.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    hyper_draws = jnp.asarray(hyper_draws)
    m = hyper_draws.shape[0]

    def one(k, th):
        rho, alpha, sigma = th[0], th[1], th[2]
        # dtype-aware stabilization: the f32 factorization of K alone
        # (lambda_max ~ n alpha^2) needs jitter >= ~3 eps n alpha^2 or
        # tail hyperparameter draws (large alpha) produce NaN factors
        # (measured on-chip, r5).  For the bulk of the posterior this
        # leaves ``jitter`` untouched; the affected tail draws deviate
        # from the K + jitter*I target by O(eps n alpha^2) — the f32
        # representation floor itself.  In f64 the max() never binds.
        eps = jnp.finfo(x.dtype).eps
        jit_eff = jnp.maximum(jitter, 3.0 * eps * n * jnp.square(alpha))
        kmat = gp_ops.add_diag(gp_ops.gp_exp_quad_cov(x, alpha, rho), jit_eff)
        amat = gp_ops.add_diag(kmat, jnp.square(sigma))
        k1, k2 = jax.random.split(k)
        z1 = jax.random.normal(k1, (n,), x.dtype)
        z2 = jax.random.normal(k2, (n,), x.dtype)
        lk = cholesky_decompose_tpu(kmat)
        la = cholesky_decompose_tpu(amat)
        with jax.default_matmul_precision("float32"):
            f0 = lk @ z1
            resid = y - f0 - sigma * z2
            w = _mdivide_upper_from_lower(
                la, mdivide_left_tri_low_tpu(la, resid)
            )
            # kmat (with its jitter) IS the latent model's prior
            # covariance — make(n, jitter) factors K + jitter*I too, so
            # using it throughout matches that posterior exactly
            return f0 + kmat @ w

    def run_batch(inp):
        ks, ths = inp
        return jax.vmap(one)(ks, ths)

    mpad = -(-m // batch) * batch
    keys = jax.random.split(key, mpad)
    ths = jnp.concatenate(
        [hyper_draws, jnp.broadcast_to(hyper_draws[-1:],
                                       (mpad - m, 3))], axis=0
    )
    fs = jax.lax.map(
        run_batch,
        (keys.reshape(mpad // batch, batch, *keys.shape[1:]),
         ths.reshape(mpad // batch, batch, 3)),
    )
    return fs.reshape(mpad, n)[:m]


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
