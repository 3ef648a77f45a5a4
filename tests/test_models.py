"""Fast posterior-recovery tests for the remaining BASELINE models.

(eight-schools has its own test in test_nuts.py; these are the CPU-sized
versions of configs 2-5.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu.infer import sample_nuts
from math_tpu.models import glm_logistic, gp_regression, lotka_volterra, radon


def test_glm_logistic_recovers_beta():
    Xn, yn, beta_true, alpha_true = glm_logistic.synthetic_data(2000, 5, seed=1)
    model = glm_logistic.make(5)
    res = sample_nuts(
        model.logp,
        jax.random.PRNGKey(0),
        dim=model.dim,
        args=(jnp.asarray(Xn, jnp.float64), jnp.asarray(yn, jnp.float64)),
        num_warmup=300,
        num_samples=300,
        num_chains=4,
    )
    pos = np.asarray(res.position).reshape(-1, model.dim)
    alpha_hat = pos[:, 0].mean()
    beta_hat = pos[:, 1:].mean(0)
    # MLE standard error at n=2000 is ~0.05-0.1
    assert abs(alpha_hat - alpha_true) < 0.2
    assert np.abs(beta_hat - beta_true).max() < 0.25
    assert np.asarray(res.stats.diverging).mean() < 0.02


def test_radon_recovers_hierarchy():
    county, x, y = radon.synthetic_data(15, 300, seed=2)
    model = radon.make(15)
    res = sample_nuts(
        model.logp,
        jax.random.PRNGKey(1),
        dim=model.dim,
        args=(jnp.asarray(county), jnp.asarray(x), jnp.asarray(y)),
        num_warmup=400,
        num_samples=400,
        num_chains=4,
        target_accept=0.9,
    )
    cons = model.constrain(
        jnp.asarray(np.asarray(res.position).reshape(-1, model.dim))
    )
    assert abs(float(np.mean(np.asarray(cons["mu_a"]))) - 1.5) < 0.4
    assert abs(float(np.mean(np.asarray(cons["mu_b"]))) - (-0.7)) < 0.4
    assert float(np.mean(np.asarray(cons["sigma_y"]))) == pytest.approx(0.75, abs=0.2)


def test_lotka_volterra_rk4_solver_runs_nuts():
    ts, yobs, theta_true, z0_true = lotka_volterra.synthetic_data(12, seed=3)
    model = lotka_volterra.make(ts, solver="rk4")
    res = sample_nuts(
        model.logp,
        jax.random.PRNGKey(2),
        dim=model.dim,
        args=(jnp.asarray(yobs),),
        num_warmup=250,
        num_samples=250,
        num_chains=2,
        max_depth=8,
    )
    cons = model.constrain(
        jnp.asarray(np.asarray(res.position).reshape(-1, model.dim))
    )
    th = np.asarray(cons["theta"]).mean(0)
    # loose: 12 noisy observations
    assert np.abs(np.log(th) - np.log(theta_true)).max() < 0.8, th
    z0 = np.asarray(cons["z0"]).mean(0)
    assert np.abs(np.log(z0) - np.log(z0_true)).max() < 0.5, z0


def test_gp_regression_small():
    xg, yg = gp_regression.synthetic_data(80, seed=4)
    model = gp_regression.make(80)
    res = sample_nuts(
        model.logp,
        jax.random.PRNGKey(3),
        dim=model.dim,
        args=(jnp.asarray(xg), jnp.asarray(yg)),
        num_warmup=250,
        num_samples=200,
        num_chains=2,
        max_depth=8,
    )
    cons = model.constrain(
        jnp.asarray(np.asarray(res.position).reshape(-1, model.dim))
    )
    sigma = float(np.mean(np.asarray(cons["sigma"])))
    assert abs(sigma - 0.3) < 0.12, sigma
    # posterior mean latent f should track the true function
    alpha = np.asarray(cons["alpha"]).mean()
    assert 0.5 < alpha < 5.0


def test_standalone_generated_quantities():
    """Standalone GQ service (ref: Stan services standalone_gqs): re-run a
    generated-quantities block over saved draws, with and without per-draw
    RNG, data passed as operands."""
    from math_tpu.models import eight_schools

    model = eight_schools.make()
    pos = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 50, model.dim))
    )
    sigma = jnp.asarray(eight_schools.SIGMA, jnp.float64)

    # deterministic GQ: pytree out, draw axes prepended
    out = model.generate_quantities(
        lambda p, s: {
            "mean_theta": jnp.mean(p["mu"] + p["tau"] * p["theta_tilde"]),
            "snr": p["tau"] / s[0],
        },
        pos, sigma,
    )
    assert out["mean_theta"].shape == (3, 50)
    cons = model.transform_draws(pos)
    theta = (
        np.asarray(cons["mu"])[..., None]
        + np.asarray(cons["tau"])[..., None] * np.asarray(cons["theta_tilde"])
    )
    np.testing.assert_allclose(
        np.asarray(out["mean_theta"]), theta.mean(-1), rtol=1e-6,
    )

    # RNG GQ: posterior-predictive replicates, reproducible per draw
    def ppc(p, k, s):
        th = p["mu"] + p["tau"] * p["theta_tilde"]
        return th + s * jax.random.normal(k, s.shape)

    y1 = model.generate_quantities(ppc, pos, sigma, key=jax.random.PRNGKey(3))
    y2 = model.generate_quantities(ppc, pos, sigma, key=jax.random.PRNGKey(3))
    y3 = model.generate_quantities(ppc, pos, sigma, key=jax.random.PRNGKey(4))
    assert y1.shape == (3, 50, 8)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.abs(np.asarray(y1) - np.asarray(y3)).max() > 0
