"""MAP optimization (L-BFGS) and Laplace-approximation sampling.

The downstream-Stan service methods ``optimize`` and ``laplace``
(stan-dev/stan: ``services/optimize/bfgs.hpp``,
``services/laplace_sample.hpp``), TPU-native: the optimizer is an
``optax.lbfgs`` loop inside one jitted ``lax.while_loop``; the Laplace
step uses the framework's second-order AD (``jax.hessian`` works through
every fused kernel path as of r5) to build the Gaussian approximation at
the mode.

Stan semantics mirrored:

* ``map_estimate(..., jacobian=False)`` (Stan's ``optimize`` default)
  maximizes the CONSTRAINED-space density — the change-of-variables
  adjustment is dropped, so the returned point is the constrained MAP;
  ``jacobian=True`` maximizes the unconstrained-space posterior density
  (the mode the ``laplace`` method expands around).
* ``laplace_sample`` draws theta ~ N(mode, (-H)^-1) in the unconstrained
  space and reports per-draw ``log_q`` (approximation) and ``log_p``
  (target), enabling the same importance-resampling diagnostics Stan's
  laplace_sample feeds to PSIS.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax


class OptimizeResult(NamedTuple):
    theta: jnp.ndarray  # (dim,) unconstrained optimum
    value: jnp.ndarray  # objective log density at the optimum
    grad_norm: jnp.ndarray  # inf-norm of the gradient at the optimum
    iterations: int
    converged: bool


class LaplaceResult(NamedTuple):
    draws: jnp.ndarray  # (num_samples, dim) unconstrained draws
    mode: jnp.ndarray  # (dim,)
    log_p: jnp.ndarray  # (num_samples,) target log density (jacobian=True)
    log_q: jnp.ndarray  # (num_samples,) Gaussian approximation log density
    hessian: jnp.ndarray  # (dim, dim) of the expanded log density at mode
    opt: OptimizeResult


def map_estimate(
    logdensity_fn: Callable,
    dim: int,
    *,
    args=(),
    init: Optional[jnp.ndarray] = None,
    jacobian: bool = False,
    unadjusted_fn: Optional[Callable] = None,
    max_iters: int = 1000,
    tol: float = 1e-8,
    memory_size: int = 10,
    dtype=jnp.float64,
) -> OptimizeResult:
    """L-BFGS maximization of the log density (Stan's ``optimize``).

    ``logdensity_fn(theta, *args)`` must be the JACOBIAN-ADJUSTED
    unconstrained density (what the samplers consume).  With
    ``jacobian=False`` (Stan's default) pass ``unadjusted_fn`` — e.g.
    ``LogDensity.logp_unadjusted`` — so the constrained-space MAP is
    found; when omitted, ``logdensity_fn`` itself is maximized.
    """
    target = unadjusted_fn if (not jacobian and unadjusted_fn is not None) \
        else logdensity_fn

    def neg(z):
        return -target(z, *args)

    if init is None:
        init = jnp.zeros((dim,), dtype)
    init = jnp.asarray(init, dtype)

    opt = optax.lbfgs(memory_size=memory_size)
    vg = jax.value_and_grad(neg)

    def cond(carry):
        _, _, g, it, _ = carry
        return (jnp.max(jnp.abs(g)) > tol) & (it < max_iters)

    def body(carry):
        z, state, _, it, _ = carry
        v, g = vg(z)
        updates, state = opt.update(
            g, state, z, value=v, grad=g, value_fn=neg
        )
        z_new = optax.apply_updates(z, updates)
        v_new, g_new = vg(z_new)
        # reject a non-finite step (linesearch failure): report stalled
        ok = jnp.isfinite(v_new) & jnp.all(jnp.isfinite(z_new))
        z_new = jnp.where(ok, z_new, z)
        g_new = jnp.where(ok, g_new, jnp.zeros_like(g_new))
        return z_new, state, g_new, it + 1, ok

    @jax.jit
    def run(z0, args_op):
        v0, g0 = vg(z0)
        state = opt.init(z0)
        z, _, g, it, ok = jax.lax.while_loop(
            cond, body, (z0, state, g0, jnp.asarray(0, jnp.int32), True)
        )
        return z, -neg(z), jnp.max(jnp.abs(g)), it, ok

    # args flow through the closure of `neg`; jit makes them traced only
    # if they are jnp arrays closed over — callers pass data via args=(),
    # which is captured below trace like the samplers' operand rule.
    z, val, gn, it, ok = run(init, args)
    it = int(np.asarray(it))
    gn_f = float(np.asarray(gn))
    return OptimizeResult(
        theta=z, value=val, grad_norm=gn,
        iterations=it,
        converged=bool(ok) and gn_f <= tol,
    )


def laplace_sample(
    logdensity_fn: Callable,
    key,
    dim: int,
    num_samples: int = 1000,
    *,
    args=(),
    init: Optional[jnp.ndarray] = None,
    max_iters: int = 1000,
    tol: float = 1e-8,
    jitter: float = 0.0,
    dtype=jnp.float64,
) -> LaplaceResult:
    """Draws from the Laplace approximation at the posterior mode
    (Stan's ``laplace`` method): find the mode of the jacobian-adjusted
    unconstrained density, expand with the exact Hessian (second-order
    AD through every kernel path), and sample
    theta ~ N(mode, (-H + jitter I)^-1).

    Returns per-draw ``log_p`` (target) and ``log_q`` (approximation) for
    importance diagnostics (Stan feeds these to PSIS).
    """
    opt = map_estimate(
        logdensity_fn, dim, args=args, init=init, jacobian=True,
        max_iters=max_iters, tol=tol, dtype=dtype,
    )
    mode = opt.theta

    @jax.jit
    def expand(mode, key):
        h = jax.hessian(lambda z: logdensity_fn(z, *args))(mode)
        h = 0.5 * (h + h.T)
        prec = -h + jitter * jnp.eye(dim, dtype=h.dtype)
        # -H = L L^T  =>  cov = L^-T L^-1; draws = mode + L^-T z
        L = jnp.linalg.cholesky(prec)
        z = jax.random.normal(key, (num_samples, dim), dtype)
        delta = jax.scipy.linalg.solve_triangular(
            L.T, z.T, lower=False
        ).T
        draws = mode[None, :] + delta
        half_logdet_prec = jnp.sum(jnp.log(jnp.diagonal(L)))
        log_q = (
            -0.5 * jnp.sum(z * z, axis=-1)
            + half_logdet_prec
            - 0.5 * dim * jnp.log(2.0 * jnp.pi)
        )
        log_p = jax.vmap(lambda zz: logdensity_fn(zz, *args))(draws)
        return draws, log_p, log_q, h

    draws, log_p, log_q, h = expand(mode, key)
    return LaplaceResult(
        draws=draws, mode=mode, log_p=log_p, log_q=log_q, hessian=h,
        opt=opt,
    )
