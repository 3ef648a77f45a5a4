"""Lotka-Volterra ODE inverse problem (BASELINE.md config 4).

Stan case-study parameterization:

    theta = (alpha, beta, gamma, delta) > 0, lognormal-ish priors
    z0 > 0 initial populations
    y_obs[t, s] ~ lognormal(log z[t, s], sigma_s)

Gradient path: adaptive DP5 + continuous adjoint (``math_tpu.ops.ode``),
replacing CVODES forward sensitivities (SURVEY.md §3.4).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from math_tpu import dists, transforms
from math_tpu.model import make_log_density
from math_tpu.ops.ode import integrate_ode_rk45, ode_rk4_fixed


def dz_dt(t, z, theta):
    u, v = z[0], z[1]
    alpha, beta, gamma, delta = theta[0], theta[1], theta[2], theta[3]
    return jnp.stack(
        [alpha * u - beta * u * v, -gamma * v + delta * u * v]
    )


def synthetic_data(n_times=20, seed=0, dtype=np.float64):
    from scipy.integrate import solve_ivp

    theta_true = np.array([0.55, 0.028, 0.80, 0.024])
    z0_true = np.array([33.0, 6.0])
    ts = np.arange(1, n_times + 1, dtype=np.float64)
    sol = solve_ivp(
        lambda t, y: [
            theta_true[0] * y[0] - theta_true[1] * y[0] * y[1],
            -theta_true[2] * y[1] + theta_true[3] * y[0] * y[1],
        ],
        (0, float(ts[-1])),
        z0_true,
        t_eval=ts,
        rtol=1e-10,
        atol=1e-12,
    )
    z = sol.y.T
    rng = np.random.default_rng(seed)
    y = np.exp(np.log(z) + 0.25 * rng.normal(size=z.shape))
    return ts.astype(dtype), y.astype(dtype), theta_true, z0_true


def make(ts, rtol=1e-6, atol=1e-8, solver="rk45"):
    """``solver``: "rk45" (adaptive DP5 + continuous adjoint, the CVODES
    analog) or "rk4" (fixed-grid scan — much smaller XLA program, exact
    discretize-then-optimize gradients; the right choice for smooth
    non-stiff dynamics on TPU)."""
    ts = jnp.asarray(ts)

    def log_prob(p, y_obs):
        theta, z0, sigma = p["theta"], p["z0"], p["sigma"]
        lp = dists.normal_lpdf(jnp.log(theta[jnp.array([0, 2])]), -1.0, 0.5, propto=True)
        lp += dists.normal_lpdf(jnp.log(theta[jnp.array([1, 3])]), -3.5, 0.5, propto=True)
        lp += dists.lognormal_lpdf(z0, jnp.log(10.0), 1.0, propto=True)
        lp += dists.lognormal_lpdf(sigma, -1.0, 1.0, propto=True)
        if solver == "rk4":
            z = ode_rk4_fixed(dz_dt, z0, 0.0, ts, theta, steps_per_interval=24)
        else:
            z = integrate_ode_rk45(dz_dt, z0, 0.0, ts, theta, rtol=rtol, atol=atol)
        z = jnp.maximum(z, 1e-6)
        lp += dists.lognormal_lpdf(y_obs, jnp.log(z), sigma, propto=True)
        return lp

    return make_log_density(
        {
            "theta": transforms.LowerBound(shape=(4,), lb=0.0),
            "z0": transforms.LowerBound(shape=(2,), lb=0.0),
            "sigma": transforms.LowerBound(shape=(2,), lb=0.0),
        },
        log_prob,
    )
