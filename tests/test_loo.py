"""PSIS-LOO / WAIC / loo_compare (diagnostics.loo).

Validation against the EXACT leave-one-out predictive density of the
conjugate normal-normal model: with y_i ~ N(mu, s2), mu ~ N(0, t2), the
LOO posterior p(mu | y_{-i}) is analytic, so elpd_loo_i =
log p(y_i | y_{-i}) has a closed form the PSIS estimate must approach.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu.diagnostics import (
    loo,
    loo_compare,
    pointwise_log_lik,
    waic,
)

S2, T2 = 1.0, 4.0  # likelihood and prior variances
N_OBS = 40
N_DRAWS = 8000


def _data():
    rng = np.random.default_rng(7)
    return rng.normal(1.2, np.sqrt(S2), N_OBS)


def _posterior_draws(y, rng):
    """Exact posterior draws of mu given all of y (conjugate)."""
    n = y.size
    prec = n / S2 + 1.0 / T2
    mean = (y.sum() / S2) / prec
    return rng.normal(mean, np.sqrt(1.0 / prec), N_DRAWS)


def _exact_elpd_loo(y):
    """Sum_i log p(y_i | y_{-i}) in closed form."""
    out = 0.0
    for i in range(y.size):
        rest = np.delete(y, i)
        prec = rest.size / S2 + 1.0 / T2
        mean = (rest.sum() / S2) / prec
        var = 1.0 / prec + S2  # predictive variance
        out += -0.5 * np.log(2 * np.pi * var) - 0.5 * (y[i] - mean) ** 2 / var
    return out


def _log_lik_matrix(mu_draws, y, s2=S2):
    return (
        -0.5 * np.log(2 * np.pi * s2)
        - 0.5 * (y[None, :] - mu_draws[:, None]) ** 2 / s2
    )


def test_psis_loo_matches_exact_conjugate_loo():
    y = _data()
    mu = _posterior_draws(y, np.random.default_rng(0))
    res = loo(_log_lik_matrix(mu, y))
    exact = _exact_elpd_loo(y)
    # Monte Carlo error at 8k draws is well under 0.1 nats total here
    assert abs(res.elpd_loo - exact) < 0.1
    assert res.n_bad_k == 0
    assert np.all(res.pareto_k < 0.7)
    # one well-identified location parameter
    assert 0.5 < res.p_loo < 2.0
    assert res.looic == pytest.approx(-2.0 * res.elpd_loo)
    assert res.se_elpd_loo > 0


def test_waic_close_to_loo_for_regular_model():
    y = _data()
    mu = _posterior_draws(y, np.random.default_rng(1))
    ll = _log_lik_matrix(mu, y)
    w = waic(ll)
    l = loo(ll)
    assert abs(w.elpd_waic - l.elpd_loo) < 0.1
    assert w.n_high_var == 0
    assert 0.5 < w.p_waic < 2.0


def test_loo_compare_prefers_true_model():
    y = _data()
    mu = _posterior_draws(y, np.random.default_rng(2))
    good = loo(_log_lik_matrix(mu, y))
    bad = loo(_log_lik_matrix(mu, y, s2=25.0))  # badly over-dispersed lik
    cmp = loo_compare(good, bad)
    assert cmp.elpd_diff > 0
    assert cmp.z > 4.0  # decisive
    with pytest.raises(ValueError):
        loo_compare(good, loo(_log_lik_matrix(mu, y[:10])))


def test_chain_axis_flattening_and_vmap_helper():
    y = _data()
    mu = _posterior_draws(y, np.random.default_rng(3))
    ll2 = _log_lik_matrix(mu, y)
    ll3 = ll2.reshape(4, -1, N_OBS)
    r2, r3 = loo(ll2), loo(ll3)
    assert r2.elpd_loo == pytest.approx(r3.elpd_loo)

    yj = jnp.asarray(y)

    def ll_fn(theta, yv):
        return -0.5 * jnp.log(2 * jnp.pi * S2) - 0.5 * (yv - theta[0]) ** 2 / S2

    draws = jnp.asarray(mu[: 4 * 100].reshape(4, 100, 1))
    mat = pointwise_log_lik(ll_fn, draws, yj)
    assert mat.shape == (4, 100, N_OBS)
    np.testing.assert_allclose(
        mat.reshape(-1, N_OBS), ll2[: 4 * 100], rtol=1e-5
    )


def test_pathological_weights_flagged():
    # exactly-Pareto importance weights: lw = k E with E ~ Exp(1) gives
    # P(w > t) = t^{-1/k}, i.e. GPD tail shape k = 1.0 — far past 0.7
    rng = np.random.default_rng(5)
    lw = 1.0 * rng.exponential(size=4000)
    ll = -lw[:, None]  # loo smooths -log_lik
    with pytest.warns(UserWarning, match="Pareto k_hat"):
        res = loo(ll)
    assert res.n_bad_k == 1
    assert res.pareto_k[0] > 0.7
