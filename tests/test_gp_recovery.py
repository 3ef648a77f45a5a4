"""Exact latent-f recovery from the marginal GP (Matheron pathwise draws).

Validates that ``gp_regression.sample_latent_conditional`` draws from the
analytic conditional N(K A^{-1} y, K - K A^{-1} K) — which makes
marginal-NUTS + recovery sample the SAME joint posterior as direct NUTS on
the Cholesky-parameterized latent model (ref: Stan GP docs' marginalize +
generated-quantities-redraw pattern; multi_normal_rng.hpp).
"""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.models import gp_regression


def _exact_conditional(x, y, rho, alpha, sigma, jitter):
    """f64 reference: mean and covariance of f | y, theta."""
    d2 = (x[:, None] - x[None, :]) ** 2
    k = alpha**2 * np.exp(-0.5 * d2 / rho**2) + jitter * np.eye(len(x))
    a = k + sigma**2 * np.eye(len(x))
    aik = np.linalg.solve(a, k)
    mean = k @ np.linalg.solve(a, y)
    cov = k - k @ aik
    return mean, cov


def test_matheron_matches_analytic_conditional():
    n, m = 64, 4000
    jitter = 1e-8
    x, y = gp_regression.synthetic_data(n, seed=3)
    rho, alpha, sigma = 0.8, 1.2, 0.4
    mean, cov = _exact_conditional(x, y, rho, alpha, sigma, jitter)

    ths = jnp.tile(jnp.asarray([rho, alpha, sigma]), (m, 1))
    fs = np.asarray(
        gp_regression.sample_latent_conditional(
            jax.random.PRNGKey(0), ths, x, y, jitter=jitter, batch=200
        )
    )
    assert fs.shape == (m, n)
    sd = np.sqrt(np.diag(cov))
    # MC error on the mean is sd/sqrt(m); allow 5 sigma
    assert np.all(np.abs(fs.mean(0) - mean) < 5.0 * sd / np.sqrt(m) + 1e-12)
    # per-coordinate variance within 15% (chi^2 MC error at m=4000 ~ 2.2%)
    ratio = fs.var(0) / np.diag(cov)
    assert np.all(ratio > 0.85) and np.all(ratio < 1.15)
    # off-diagonal structure: correlation of two nearby coords
    c_ref = cov[10, 11] / np.sqrt(cov[10, 10] * cov[11, 11])
    c_mc = np.corrcoef(fs[:, 10], fs[:, 11])[0, 1]
    assert abs(c_mc - c_ref) < 0.1


def test_marginal_plus_recovery_matches_latent_nuts():
    """End-to-end: marginal NUTS + recovery vs direct latent NUTS (small n).

    Loose tolerances: the latent chain mixes slowly over hyperparameters
    (that is exactly why the recovery path exists); the latent field's
    posterior mean is data-dominated and comparable.
    """
    from math_tpu.infer.sample import sample_nuts

    n = 48
    jitter = 1e-8
    x, y = gp_regression.synthetic_data(n, seed=1)
    args = (jnp.asarray(x), jnp.asarray(y))

    marg = gp_regression.make_marginal(n, jitter=jitter)
    res_m = sample_nuts(
        lambda z, xx, yy: marg.logp(z, xx, yy),
        jax.random.PRNGKey(0), marg.dim, args=args,
        num_warmup=300, num_samples=300, num_chains=4, max_depth=8,
    )
    hyp = marg.transform_draws(res_m.position)
    ths = jnp.stack(
        [jnp.ravel(hyp["rho"]), jnp.ravel(hyp["alpha"]),
         jnp.ravel(hyp["sigma"])], axis=-1
    )[::4]
    fs = np.asarray(
        gp_regression.sample_latent_conditional(
            jax.random.PRNGKey(7), ths, x, y, jitter=jitter, batch=100
        )
    )

    lat = gp_regression.make(n, jitter=jitter)
    res_l = sample_nuts(
        lambda z, xx, yy: lat.logp(z, xx, yy),
        jax.random.PRNGKey(5), lat.dim, args=args,
        num_warmup=400, num_samples=400, num_chains=4, max_depth=9,
    )
    cons = lat.transform_draws(res_l.position)
    # latent model's f = chol(K) @ eta at each draw
    def f_of(z):
        p = lat.constrain(z)
        d2 = (args[0][:, None] - args[0][None, :]) ** 2
        k = p["alpha"] ** 2 * jnp.exp(-0.5 * d2 / p["rho"] ** 2)
        L = jnp.linalg.cholesky(k + jitter * jnp.eye(n))
        return L @ p["eta"]

    f_lat = np.asarray(
        jax.vmap(f_of)(res_l.position.reshape(-1, lat.dim)[::4])
    )

    # posterior mean of f agrees within a generous combined-MC budget
    diff = np.abs(fs.mean(0) - f_lat.mean(0))
    scale = np.maximum(fs.std(0), f_lat.std(0))
    assert np.all(diff < 0.6 * scale + 0.05)
    # posterior sd of f in the same ballpark
    ratio = fs.std(0) / np.maximum(f_lat.std(0), 1e-6)
    assert np.median(ratio) > 0.6 and np.median(ratio) < 1.6
    # hyperparameter locations agree loosely (latent chain mixes slowly)
    for name in ("rho", "alpha", "sigma"):
        a = float(np.mean(np.asarray(hyp[name])))
        b = float(np.mean(np.asarray(cons[name])))
        s = float(np.std(np.asarray(cons[name]))) + 1e-6
        assert abs(a - b) < 4.0 * s, (name, a, b, s)
