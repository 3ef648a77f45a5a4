"""MAP optimization + Laplace sampling (Stan's optimize / laplace methods).

ref: stan-dev/stan services/optimize/bfgs.hpp (LBFGS point estimation,
jacobian=false default) and services/laplace_sample.hpp (Gaussian
expansion at the jacobian-adjusted mode, log_p/log_q per draw).
"""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.infer.optimize import laplace_sample, map_estimate
from math_tpu.models import eight_schools

MU = np.array([1.0, -2.0, 0.5])
COV = np.array([[2.0, 0.4, 0.0], [0.4, 0.5, -0.1], [0.0, -0.1, 1.0]])
PREC = np.linalg.inv(COV)


def _gauss(z, *args):
    d = z - jnp.asarray(MU)
    return -0.5 * d @ jnp.asarray(PREC) @ d


def test_map_gaussian_exact():
    res = map_estimate(_gauss, 3)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.theta), MU, atol=1e-6)
    assert abs(float(res.value)) < 1e-10


def test_laplace_gaussian_is_exact():
    res = laplace_sample(_gauss, jax.random.PRNGKey(0), 3, num_samples=20000)
    np.testing.assert_allclose(np.asarray(res.mode), MU, atol=1e-6)
    # Hessian of a Gaussian log density == -precision
    np.testing.assert_allclose(np.asarray(res.hessian), -PREC, atol=1e-8)
    d = np.asarray(res.draws)
    np.testing.assert_allclose(d.mean(0), MU, atol=0.05)
    np.testing.assert_allclose(np.cov(d.T), COV, atol=0.08)
    # exact target: log_p - log_q constant (up to the dropped normalizer)
    w = np.asarray(res.log_p) - np.asarray(res.log_q)
    assert w.std() < 1e-6


def test_map_jacobian_semantics():
    """jacobian=False (Stan optimize default) finds the CONSTRAINED-space
    MAP: for p(sigma) = lognormal-like with lower bound, the adjusted and
    unadjusted optima differ by exactly the Jacobian term."""
    from math_tpu import dists, transforms
    from math_tpu.model import make_log_density

    m = make_log_density(
        {"sigma": transforms.LowerBound(shape=(), lb=0.0)},
        lambda p: dists.lognormal_lpdf(p["sigma"], 0.0, 0.5),
    )
    unadj = map_estimate(
        m.logp, m.dim, jacobian=False, unadjusted_fn=m.logp_unadjusted
    )
    adj = map_estimate(m.logp, m.dim, jacobian=True)
    sig_unadj = float(np.asarray(m.constrain(unadj.theta)["sigma"]))
    sig_adj = float(np.asarray(m.constrain(adj.theta)["sigma"]))
    # lognormal(0, s): constrained mode exp(-s^2); with the log-Jacobian
    # the unconstrained-space mode maps to exp(0) = 1 (median)
    assert abs(sig_unadj - np.exp(-0.25)) < 1e-4
    assert abs(sig_adj - 1.0) < 1e-4


def test_laplace_eight_schools_smoke():
    model = eight_schools.make()
    res = laplace_sample(
        model.logp, jax.random.PRNGKey(1), model.dim, num_samples=4000,
    )
    assert res.opt.converged
    d = np.asarray(res.draws)
    assert np.isfinite(d).all()
    cons = model.transform_draws(jnp.asarray(d))
    mu = np.asarray(cons["mu"])
    mode_mu = float(np.asarray(model.constrain(res.mode)["mu"]))
    # Gaussian self-consistency: draws center on the mode (the
    # approximation's own location — NOT the NUTS mean; Laplace on a
    # hierarchical posterior is diffuse and mode-shifted, as Stan's is)
    assert abs(mu.mean() - mode_mu) < 4.0 * mu.std() / np.sqrt(len(mu))
    # ...and wide enough that the NUTS mean (4.4) is within ~1 sd
    assert abs(4.4 - mu.mean()) < 1.5 * mu.std()
    # importance weights usable (finite, not degenerate)
    w = np.asarray(res.log_p) - np.asarray(res.log_q)
    assert np.isfinite(w).all()
