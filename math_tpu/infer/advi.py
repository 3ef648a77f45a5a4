"""ADVI: automatic differentiation variational inference.

Scope extension over the reference (Stan ships ADVI downstream in
stan-dev/stan, ``stan/variational/advi.hpp``): mean-field and full-rank
Gaussian families in the unconstrained space, reparameterized ELBO
gradients, and the FULL Stan optimization protocol (r5):

* step-size schedule: ``eta * k^(-1/2+eps) / (tau + sqrt(s_k))`` with the
  windowed adagrad accumulator ``s_k = alpha g^2 + (1-alpha) s_{k-1}``
  (alpha=0.1, tau=1.0 — advi.hpp's stochastic_gradient_ascent);
* eta adaptation: trial runs over candidates, best ELBO wins
  (advi.hpp::adapt_eta);
* termination: every ``eval_elbo`` steps the ELBO is re-estimated and the
  RELATIVE change enters a circular buffer; the fit stops when the mean
  OR median of the buffer drops below ``tol_rel_obj`` (advi.hpp's
  circ_buff convergence rule) — the fix for r4's 8x-overdispersed
  not-converged radon coordinate.

    ELBO = E_{z~q}[ logp(mu + sigma o z) ] + H[q]
    H[meanfield] = sum(omega) + D/2 log(2 pi e)
    H[fullrank]  = sum(log diag L) + D/2 log(2 pi e)

Each ``eval_elbo``-step segment is one jit-compiled ``lax.scan``; the
convergence test runs on host between segments.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp


class ADVIResult(NamedTuple):
    mu: jnp.ndarray  # (dim,)
    omega: jnp.ndarray  # (dim,) log-sd (meanfield) — or None-like zeros
    L: jnp.ndarray  # (dim, dim) scale factor (fullrank) or diag(exp(omega))
    elbo_trace: jnp.ndarray  # (num_evals,) ELBO at each eval point
    final_elbo: jnp.ndarray
    converged: bool = False  # hit the tol_rel_obj rule (vs max steps)
    num_steps_run: int = 0


def _entropy_meanfield(omega):
    d = omega.shape[-1]
    return jnp.sum(omega) + 0.5 * d * (1.0 + math.log(2.0 * math.pi))


def _entropy_fullrank(L):
    d = L.shape[-1]
    return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L)))) + 0.5 * d * (
        1.0 + math.log(2.0 * math.pi)
    )


def _sample_q(key, mu, scale_fn, num_mc, dim, dtype):
    z = jax.random.normal(key, (num_mc, dim), dtype)
    return jax.vmap(lambda zz: mu + scale_fn(zz))(z)


def advi(
    logdensity_fn: Callable,
    key,
    dim: int,
    *,
    args=(),
    method: str = "meanfield",
    num_steps: int = 10000,
    num_mc: int = 8,
    learning_rate: Optional[float] = None,
    eta_candidates=(100.0, 10.0, 1.0, 0.1, 0.01),
    eta_trial_steps: int = 50,
    num_elbo_mc: int = 100,
    eval_elbo: int = 100,
    tol_rel_obj: Optional[float] = 0.01,
    dtype=jnp.float64,
) -> ADVIResult:
    """Fit q to exp(logdensity) and return variational parameters.

    ``method``: "meanfield" (diagonal) or "fullrank" (dense Cholesky scale).
    When ``learning_rate`` is None, runs Stan-style trial optimizations over
    ``eta_candidates`` and keeps the best-ELBO eta.  ``num_steps`` is the
    MAXIMUM; with ``tol_rel_obj`` set (Stan default 0.01) the fit stops at
    the Stan convergence rule (mean OR median of the relative-ELBO-change
    circular buffer below tol).  ``tol_rel_obj=None`` runs exactly
    ``num_steps`` steps (the pre-r5 behavior).
    """
    if method not in ("meanfield", "fullrank"):
        raise ValueError(f"unknown ADVI method {method!r}")
    fullrank = method == "fullrank"

    def ld(z, args):
        return logdensity_fn(z, *args)

    def unpack(params):
        if fullrank:
            mu, lflat = params
            L = jnp.zeros((dim, dim), dtype).at[jnp.tril_indices(dim)].set(lflat)
            # keep the diagonal positive via exp
            d = jnp.diagonal(L)
            L = L.at[jnp.arange(dim), jnp.arange(dim)].set(jnp.exp(d))
            return mu, L
        mu, omega = params
        return mu, omega

    def neg_elbo(params, key, args, n_mc):
        if fullrank:
            mu, L = unpack(params)
            scale = lambda z: L @ z
            ent = _entropy_fullrank(L)
        else:
            mu, omega = unpack(params)
            scale = lambda z: jnp.exp(omega) * z
            ent = _entropy_meanfield(omega)
        zs = _sample_q(key, mu, scale, n_mc, dim, dtype)
        lps = jax.vmap(lambda z: ld(z, args))(zs)
        return -(jnp.mean(lps) + ent)

    def init_params():
        mu0 = jnp.zeros((dim,), dtype)
        if fullrank:
            lflat = jnp.zeros((dim * (dim + 1) // 2,), dtype)
            return (mu0, lflat)
        return (mu0, jnp.zeros((dim,), dtype))

    def init_opt_state(params):
        # windowed adagrad accumulator; -1 count marks "first step seeds s"
        return (jax.tree.map(jnp.zeros_like, params), jnp.zeros((), dtype))

    def sga_segment(eta, params, opt_state, key, args, t0, steps):
        """``steps`` iterations of Stan's stochastic gradient ascent
        (advi.hpp: eta * k^(-1/2+eps) / (tau + sqrt(s_k)) with windowed
        adagrad s; alpha=0.1, tau=1.0)."""
        alpha, tau, eps_pow = 0.1, 1.0, 1e-16

        def step(carry, k):
            params, (s, t) = carry
            t = t + 1.0
            loss, g = jax.value_and_grad(neg_elbo)(params, k, args, num_mc)
            s = jax.tree.map(
                lambda sv, gv: jnp.where(
                    t <= 1.0, jnp.square(gv),
                    alpha * jnp.square(gv) + (1.0 - alpha) * sv,
                ),
                s, g,
            )
            lr = eta * jnp.power(t, -0.5 + eps_pow)
            params = jax.tree.map(
                lambda p, gv, sv: p - lr * gv / (tau + jnp.sqrt(sv)),
                params, g, s,
            )
            return (params, (s, t)), -loss

        ks = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            t0 + jnp.arange(steps)
        )
        (params, opt_state), elbos = jax.lax.scan(
            step, (params, opt_state), ks
        )
        return params, opt_state, elbos

    seg_cache = {}

    def seg_jit(steps):
        if steps not in seg_cache:
            seg_cache[steps] = jax.jit(
                lambda eta, p, o, k, a, t0: sga_segment(
                    eta, p, o, k, a, t0, steps
                )
            )
        return seg_cache[steps]

    elbo_jit = jax.jit(
        lambda p, k, a: -neg_elbo(p, k, a, num_elbo_mc)
    )

    args = tuple(args)
    if learning_rate is None:
        key, k_trial = jax.random.split(key)
        best, best_lr = -np.inf, eta_candidates[0]
        for lr in eta_candidates:
            p, o, _ = seg_jit(eta_trial_steps)(
                jnp.asarray(lr, dtype), init_params(),
                init_opt_state(init_params()), k_trial, args,
                jnp.asarray(0, jnp.int32),
            )
            e = float(elbo_jit(p, jax.random.fold_in(k_trial, 999), args))
            if np.isfinite(e) and e > best:
                best, best_lr = e, lr
        learning_rate = best_lr

    key, k_opt, k_eval = jax.random.split(key, 3)
    eta = jnp.asarray(learning_rate, dtype)
    params = init_params()
    opt_state = init_opt_state(params)

    # Stan's convergence machinery: relative ELBO change circular buffer
    cb_size = max(int(round(max(0.1 * num_steps / eval_elbo, 2.0))), 2)
    rel_changes: list = []
    elbo_prev = None
    elbo_trace = []
    converged = False
    steps_run = 0
    while steps_run < num_steps:
        n = min(eval_elbo, num_steps - steps_run)
        params, opt_state, _ = seg_jit(n)(
            eta, params, opt_state, k_opt, args,
            jnp.asarray(steps_run, jnp.int32),
        )
        steps_run += n
        e = float(elbo_jit(params, jax.random.fold_in(k_eval, steps_run), args))
        elbo_trace.append(e)
        if tol_rel_obj is None:
            continue
        if elbo_prev is not None:
            denom = abs(elbo_prev) if elbo_prev != 0 else 1.0
            rel_changes.append(abs(e - elbo_prev) / denom)
            if len(rel_changes) > cb_size:
                rel_changes.pop(0)
            if len(rel_changes) >= cb_size:
                m = float(np.mean(rel_changes))
                med = float(np.median(rel_changes))
                if min(m, med) < tol_rel_obj:
                    converged = True
                    break
        elbo_prev = e

    if fullrank:
        mu, L = unpack(params)
        omega = jnp.log(jnp.abs(jnp.diagonal(L)))
    else:
        mu, omega = unpack(params)
        L = jnp.diag(jnp.exp(omega))
    final = elbo_jit(params, jax.random.fold_in(k_eval, 10**8), args)
    return ADVIResult(
        mu=mu, omega=omega, L=L,
        elbo_trace=jnp.asarray(elbo_trace, dtype),
        final_elbo=final, converged=converged, num_steps_run=steps_run,
    )


def advi_sample(key, result: ADVIResult, num_samples: int):
    """Draw from the fitted q."""
    dim = result.mu.shape[-1]
    z = jax.random.normal(key, (num_samples, dim), result.mu.dtype)
    return result.mu + z @ result.L.T
