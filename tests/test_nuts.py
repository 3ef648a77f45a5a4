"""NUTS correctness: exact targets + eight-schools posterior parity.

Analog of the reference's role for downstream samplers: the math substrate
must make gradient-based inference *correct*; here we close the loop by
checking posterior moments against analytic/Stan-established values.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu.diagnostics import ess_bulk, split_rhat
from math_tpu.infer import sample_nuts
from math_tpu.models import eight_schools


def test_std_normal_exact():
    res = sample_nuts(
        lambda z: -0.5 * jnp.sum(z**2),
        jax.random.PRNGKey(0),
        dim=5,
        num_warmup=400,
        num_samples=600,
        num_chains=8,
    )
    pos = np.asarray(res.position)
    flat = pos.reshape(-1, 5)
    assert np.abs(flat.mean(0)).max() < 0.08
    assert np.abs(flat.var(0) - 1.0).max() < 0.15
    assert np.asarray(res.stats.diverging).mean() < 0.01
    assert np.max(split_rhat(pos)) < 1.02


def test_correlated_gaussian_mass_adaptation():
    A = np.array([[3.0, 0.0], [0.9, 0.4]])
    cov = A @ A.T
    prec = np.linalg.inv(cov)

    def logp(z):
        return -0.5 * z @ prec @ z

    res = sample_nuts(
        logp,
        jax.random.PRNGKey(1),
        dim=2,
        num_warmup=600,
        num_samples=800,
        num_chains=8,
    )
    flat = np.asarray(res.position).reshape(-1, 2)
    got_cov = np.cov(flat.T)
    assert np.abs(got_cov - cov).max() / np.abs(cov).max() < 0.12
    # inv mass should approximate the marginal variances
    im = np.asarray(res.inv_mass).mean(0)
    assert np.abs(im - np.diag(cov)).max() / np.diag(cov).max() < 0.3


def test_eight_schools_posterior():
    """Reference posterior (Stan, non-centered, long runs): E[mu]≈4.4,
    sd[mu]≈3.3, E[tau]≈3.6."""
    model = eight_schools.make()
    res = sample_nuts(
        model.logp,
        jax.random.PRNGKey(2),
        dim=model.dim,
        num_warmup=800,
        num_samples=1000,
        num_chains=16,
        target_accept=0.9,
    )
    pos = np.asarray(res.position)  # (chains, n, dim)
    flat = pos.reshape(-1, model.dim)
    cons = model.constrain(jnp.asarray(flat))
    mu = np.asarray(cons["mu"])
    tau = np.asarray(cons["tau"])
    assert abs(mu.mean() - 4.4) < 0.5, mu.mean()
    assert abs(mu.std() - 3.3) < 0.5, mu.std()
    assert abs(tau.mean() - 3.6) < 0.7, tau.mean()
    assert np.asarray(res.stats.diverging).mean() < 0.03
    assert np.max(split_rhat(pos[:, :, :2])) < 1.05
    # healthy sampling efficiency
    e = ess_bulk(pos[:, :, 0])
    assert e > 1000, e


def test_reproducible():
    model = eight_schools.make()
    r1 = sample_nuts(
        model.logp, jax.random.PRNGKey(3), dim=model.dim,
        num_warmup=100, num_samples=50, num_chains=2,
    )
    r2 = sample_nuts(
        model.logp, jax.random.PRNGKey(3), dim=model.dim,
        num_warmup=100, num_samples=50, num_chains=2,
    )
    assert np.array_equal(np.asarray(r1.position), np.asarray(r2.position))


def test_max_depth_respected():
    # nearly-flat target forces deep trees; depth must cap at max_depth
    res = sample_nuts(
        lambda z: -0.5 * jnp.sum((z / 50.0) ** 2),
        jax.random.PRNGKey(4),
        dim=2,
        num_warmup=50,
        num_samples=50,
        num_chains=2,
        max_depth=6,
    )
    assert np.asarray(res.stats.tree_depth).max() <= 6
    assert np.asarray(res.stats.n_leapfrog).max() <= 2**6
