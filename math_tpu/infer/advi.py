"""ADVI: automatic differentiation variational inference.

Scope extension over the reference (Stan ships ADVI downstream): mean-field
and full-rank Gaussian families in the unconstrained space, reparameterized
ELBO gradients, optax optimizers, and Stan-style eta (learning-rate) search.

    ELBO = E_{z~q}[ logp(mu + sigma o z) ] + H[q]
    H[meanfield] = sum(omega) + D/2 log(2 pi e)
    H[fullrank]  = sum(log diag L) + D/2 log(2 pi e)

Everything is jit-compiled with a `lax.scan` over optimization steps.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ADVIResult(NamedTuple):
    mu: jnp.ndarray  # (dim,)
    omega: jnp.ndarray  # (dim,) log-sd (meanfield) — or None-like zeros
    L: jnp.ndarray  # (dim, dim) scale factor (fullrank) or diag(exp(omega))
    elbo_trace: jnp.ndarray  # (num_steps,)
    final_elbo: jnp.ndarray


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
    num_steps: int = 2000,
    num_mc: int = 8,
    learning_rate: Optional[float] = None,
    eta_candidates=(1.0, 0.1, 0.01),
    eta_trial_steps: int = 50,
    num_elbo_mc: int = 32,
    dtype=jnp.float64,
) -> ADVIResult:
    """Fit q to exp(logdensity) and return variational parameters.

    ``method``: "meanfield" (diagonal) or "fullrank" (dense Cholesky scale).
    When ``learning_rate`` is None, runs Stan-style trial optimizations over
    ``eta_candidates`` and keeps the best-ELBO eta.
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

    def neg_elbo(params, key, args):
        if fullrank:
            mu, L = unpack(params)
            scale = lambda z: L @ z
            ent = _entropy_fullrank(L)
        else:
            mu, omega = unpack(params)
            scale = lambda z: jnp.exp(omega) * z
            ent = _entropy_meanfield(omega)
        zs = _sample_q(key, mu, scale, num_mc, dim, dtype)
        lps = jax.vmap(lambda z: ld(z, args))(zs)
        return -(jnp.mean(lps) + ent)

    def init_params():
        mu0 = jnp.zeros((dim,), dtype)
        if fullrank:
            lflat = jnp.zeros((dim * (dim + 1) // 2,), dtype)
            return (mu0, lflat)
        return (mu0, jnp.zeros((dim,), dtype))

    def optimize(lr, steps, key, args):
        opt = optax.adam(lr)
        params = init_params()
        state = opt.init(params)

        def step(carry, k):
            params, state = carry
            loss, g = jax.value_and_grad(neg_elbo)(params, k, args)
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
            return (params, state), -loss

        ks = jax.random.split(key, steps)
        (params, _), elbos = jax.lax.scan(step, (params, state), ks)
        return params, elbos

    if learning_rate is None:
        key, k_trial = jax.random.split(key)

        @jax.jit
        def trial(lr, key, args):
            params, elbos = optimize(lr, eta_trial_steps, key, args)
            k_eval = jax.random.fold_in(key, 999)
            return -neg_elbo(params, k_eval, args)

        best, best_lr = -jnp.inf, eta_candidates[0]
        for lr in eta_candidates:
            e = trial(jnp.asarray(lr, dtype), k_trial, args)
            e = float(jnp.where(jnp.isnan(e), -jnp.inf, e))
            if e > best:
                best, best_lr = e, lr
        learning_rate = best_lr

    key, k_opt, k_eval = jax.random.split(key, 3)
    params, elbos = jax.jit(
        lambda key, args: optimize(learning_rate, num_steps, key, args)
    )(k_opt, args)

    if fullrank:
        mu, L = unpack(params)
        omega = jnp.log(jnp.abs(jnp.diagonal(L)))
    else:
        mu, omega = unpack(params)
        L = jnp.diag(jnp.exp(omega))
    final = -jax.jit(neg_elbo)(params, k_eval, args)
    return ADVIResult(mu=mu, omega=omega, L=L, elbo_trace=elbos, final_elbo=final)


def advi_sample(key, result: ADVIResult, num_samples: int):
    """Draw from the fitted q."""
    dim = result.mu.shape[-1]
    z = jax.random.normal(key, (num_samples, dim), result.mu.dtype)
    return result.mu + z @ result.L.T
