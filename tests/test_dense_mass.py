"""Dense metric (Stan dense_e): adaptation must learn full covariance."""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.infer import sample_nuts


def test_dense_mass_on_correlated_gaussian():
    # strongly correlated target: dense metric should learn the covariance
    rho = 0.95
    cov = np.array([[1.0, rho * 2.0], [rho * 2.0, 4.0 + 0.2]])
    prec = np.linalg.inv(cov)

    def logp(z):
        return -0.5 * z @ prec @ z

    res = sample_nuts(
        logp,
        jax.random.PRNGKey(0),
        dim=2,
        num_warmup=600,
        num_samples=800,
        num_chains=4,
        dense_mass=True,
    )
    assert res.inv_mass.shape == (4, 2, 2)
    # learned metric approximates the target covariance
    im = np.asarray(res.inv_mass).mean(0)
    assert np.abs(im - cov).max() / np.abs(cov).max() < 0.35, im
    flat = np.asarray(res.position).reshape(-1, 2)
    got = np.cov(flat.T)
    assert np.abs(got - cov).max() / np.abs(cov).max() < 0.15
    # sampling efficiency: dense metric should give near-unit-Gaussian
    # behavior -> shallow trees
    assert np.asarray(res.stats.tree_depth)[:, 100:].mean() < 4.0


def test_dense_matches_diag_on_isotropic():
    def logp(z):
        return -0.5 * jnp.sum(z**2)

    r_diag = sample_nuts(
        logp, jax.random.PRNGKey(1), dim=3, num_warmup=300, num_samples=300,
        num_chains=2, dense_mass=False,
    )
    r_dense = sample_nuts(
        logp, jax.random.PRNGKey(1), dim=3, num_warmup=300, num_samples=300,
        num_chains=2, dense_mass=True,
    )
    m1 = np.asarray(r_diag.position).reshape(-1, 3).mean(0)
    m2 = np.asarray(r_dense.position).reshape(-1, 3).mean(0)
    assert np.abs(m1).max() < 0.15 and np.abs(m2).max() < 0.15
