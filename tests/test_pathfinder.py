"""Pathfinder + PSIS (the downstream-Stan pathfinder service method).

ref: Zhang, Carpenter, Gelman, Vehtari (2022); Stan's pathfinder since
2.33; PSIS per Vehtari et al. (2024) with the Zhang-Stephens GPD fit.
"""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.diagnostics.psis import gpd_fit, psis_smooth
from math_tpu.infer.pathfinder import pathfinder
from math_tpu.models import eight_schools

MU = np.array([1.0, -2.0, 0.5, 2.0])
A = np.array(
    [[1.2, 0.0, 0.0, 0.0],
     [0.4, 0.8, 0.0, 0.0],
     [-0.2, 0.1, 1.0, 0.0],
     [0.0, 0.3, -0.4, 0.6]]
)
COV = A @ A.T
PREC = np.linalg.inv(COV)


def _gauss(z, *args):
    d = z - jnp.asarray(MU)
    return -0.5 * d @ jnp.asarray(PREC) @ d


def test_gpd_fit_recovers_shape():
    rng = np.random.default_rng(0)
    for k_true in (0.2, 0.5):
        u = rng.uniform(size=4000)
        x = ((1.0 - u) ** (-k_true) - 1.0) / k_true  # GPD(k, sigma=1)
        k, sigma = gpd_fit(x)
        assert abs(k - k_true) < 0.08, (k_true, k)
        assert abs(sigma - 1.0) < 0.12


def test_psis_smooth_basics():
    rng = np.random.default_rng(1)
    lw = rng.standard_t(df=5, size=2000)  # heavy-ish importance weights
    sm, k_hat = psis_smooth(lw)
    assert np.isfinite(sm).all() and np.isfinite(k_hat)
    # shift-invariant up to the common max-shift; bulk order preserved
    assert sm.max() <= 0.0 + 1e-12
    order_raw = np.argsort(lw)
    order_sm = np.argsort(sm)
    assert (order_raw == order_sm).mean() > 0.99
    # constant weights: smoothing is a no-op shift
    sm2, _ = psis_smooth(np.zeros(500))
    np.testing.assert_allclose(sm2, 0.0, atol=1e-12)


def test_pathfinder_gaussian_exact():
    """On a Gaussian target the L-BFGS inverse Hessian converges to the
    true covariance, so pathfinder's approximation is (near-)exact."""
    res = pathfinder(
        _gauss, jax.random.PRNGKey(0), 4, num_paths=4, num_draws=8000,
        num_draws_per_path=4000,
    )
    d = np.asarray(res.draws)
    assert res.k_hat < 0.7
    np.testing.assert_allclose(d.mean(0), MU, atol=0.1)
    np.testing.assert_allclose(np.cov(d.T), COV, atol=0.25)
    # log_p - log_q tight (the L-BFGS curvature pairs near convergence
    # are small/collinear, so Sigma is close-but-not-machine-exact; the
    # moment checks above are the real oracle, k_hat the reliability bar)
    w = np.asarray(res.log_p) - np.asarray(res.log_q)
    assert w.std() < 1.5


def test_pathfinder_eight_schools_smoke():
    model = eight_schools.make()
    res = pathfinder(
        model.logp, jax.random.PRNGKey(2), model.dim,
        num_paths=4, num_draws=2000, num_draws_per_path=1000,
    )
    d = np.asarray(res.draws)
    assert np.isfinite(d).all()
    assert np.isfinite(res.k_hat)
    cons = model.transform_draws(jnp.asarray(d))
    mu = float(np.mean(np.asarray(cons["mu"])))
    # production role: NUTS inits / rough posterior location
    assert -3.0 < mu < 12.0, mu
    assert (np.asarray(res.path_elbos) > -np.inf).sum() >= 2
