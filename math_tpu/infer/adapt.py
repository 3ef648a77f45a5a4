"""Warmup adaptation: dual-averaging step size + windowed Welford metric.

Reference behavior: Stan's stepsize_adaptation (Nesterov dual averaging,
gamma=0.05, t0=10, kappa=0.75, delta=0.8) and windowed covariance adaptation
(init buffer 75, doubling slow windows from 25, terminal buffer 50), with
the Welford accumulator from ``prim/mat/fun/welford_var_estimator.hpp`` and
the same ``(n/(n+5)) var + 1e-3 (5/(n+5))`` regularization.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.infer.nuts import (
    IntegratorState,
    kinetic_energy,
    leapfrog,
    sample_momentum,
)


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def da_init(eps0, dtype=jnp.float32):
    eps0 = jnp.asarray(eps0, dtype)
    return DualAveragingState(
        log_eps=jnp.log(eps0),
        log_eps_bar=jnp.zeros((), dtype),
        h_bar=jnp.zeros((), dtype),
        mu=jnp.log(10.0 * eps0),
        count=jnp.zeros((), jnp.int32),
    )


def da_update(s: DualAveragingState, accept_prob, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75):
    count = s.count + 1
    t = count.astype(s.log_eps.dtype)
    eta = 1.0 / (t + t0)
    h_bar = (1.0 - eta) * s.h_bar + eta * (target - accept_prob)
    log_eps = s.mu - jnp.sqrt(t) / gamma * h_bar
    w = jnp.power(t, -kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * s.log_eps_bar
    return DualAveragingState(log_eps, log_eps_bar, h_bar, s.mu, count)


class WelfordState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


def welford_init(dim, dtype=jnp.float32):
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
    )


def welford_update(s: WelfordState, x):
    """Ref: welford_var_estimator.hpp:19-27."""
    count = s.count + 1.0
    delta = x - s.mean
    mean = s.mean + delta / count
    m2 = s.m2 + delta * (x - mean)
    return WelfordState(count, mean, m2)


def welford_variance_regularized(s: WelfordState):
    """Stan's shrunk sample variance (downstream var_adaptation)."""
    n = jnp.maximum(s.count, 2.0)
    var = s.m2 / (n - 1.0)
    return (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))


class WelfordCovState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray  # (dim,)
    m2: jnp.ndarray  # (dim, dim)


def welford_cov_init(dim, dtype=jnp.float32):
    """Dense-metric accumulator (ref: welford_covar_estimator.hpp)."""
    return WelfordCovState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim, dim), dtype),
    )


def welford_cov_update(s: WelfordCovState, x):
    count = s.count + 1.0
    delta = x - s.mean
    mean = s.mean + delta / count
    m2 = s.m2 + jnp.outer(delta, x - mean)
    return WelfordCovState(count, mean, m2)


def welford_cov_regularized(s: WelfordCovState):
    """Stan's shrunk covariance (downstream covar_adaptation):
    (n/(n+5)) Sigma + 1e-3 (5/(n+5)) I."""
    n = jnp.maximum(s.count, 2.0)
    cov = s.m2 / (n - 1.0)
    cov = 0.5 * (cov + cov.T)
    dim = cov.shape[-1]
    return (n / (n + 5.0)) * cov + 1e-3 * (5.0 / (n + 5.0)) * jnp.eye(
        dim, dtype=cov.dtype
    )


def warmup_schedule(num_warmup, init_buffer=75, term_buffer=50, base_window=25):
    """Static schedule arrays: in_slow[t], window_end[t] (numpy, trace-time).

    Follows Stan's windowed adaptation: fast(75) | 25,50,100,... | fast(50),
    with proportional shrinking when num_warmup is small and the final slow
    window extended to abut the terminal buffer.
    """
    in_slow = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    if num_warmup < 20:
        return in_slow, window_end
    if init_buffer + term_buffer + base_window > num_warmup:
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.10 * num_warmup)
        base_window = num_warmup - init_buffer - term_buffer
    slow_end = num_warmup - term_buffer
    in_slow[init_buffer:slow_end] = True
    start, size = init_buffer, base_window
    while start < slow_end:
        end = start + size
        if end + 2 * size > slow_end:
            end = slow_end
        window_end[end - 1] = True
        start, size = end, size * 2
    return in_slow, window_end


def choose_depth_cap(depths, user_cap, margin=2, sat_tol=0.05):
    """Auto-size the NUTS tree-depth cap from observed tree depths.

    The transition's cost scales with the PROGRAM's ``max_depth``
    (checkpoint-stack sizes and, under ``vmap``, the worst-lane tree
    budget) — not the adapted depth: capping 10 -> 6 on eight-schools cut
    wall 4.8x at identical ESS, while a cap at/below the adapted depth
    truncates real trajectories (radon: cap 5 collapsed min-ESS 138k ->
    49k).  Rule (measured, BENCHMARKS.md r4/r5): the cap must clear the
    adapted mean depth by ~``margin`` AND keep the expected saturation
    rate at or under ``sat_tol``, so

        cap = min(user_cap,
                  max(round(mean + margin),
                      smallest c with P(depth >= c) <= sat_tol))

    ``P(depth >= c)`` estimated from the observed distribution IS the
    expected cap-hit rate at cap ``c``, so the chosen cap is
    self-consistent with ``warn_on_treedepth_saturation``'s default
    threshold (a cap chosen here never warns on the data that chose it).
    r5 measured the failure of the earlier raw-q98 tail rule: on
    eight-schools it picked cap 5 with a 7.4% hit rate, which both fired
    the saturation warning and ran SLOWER than cap 6 (1.80 s vs 1.50 s
    monolithic — saturated lanes burn their full tree budget every
    transition under vmap), so the tail rule must bound the hit rate,
    not the quantile.

    ``depths``: any array of observed tree depths (host numpy ok).
    Returns an int in [2, user_cap].
    """
    d = np.asarray(depths).reshape(-1)
    if d.size == 0:
        return int(user_cap)
    mean = float(d.mean())
    # smallest c with P(d >= c) <= sat_tol; observed depths are themselves
    # truncated at the cap they ran under, so a heavy lump AT the current
    # cap pushes c past it (the caller's ratchet then re-observes)
    dmax = int(d.max())
    tail = dmax + 1
    for c in range(2, dmax + 2):
        if float(np.mean(d >= c)) <= sat_tol:
            tail = c
            break
    cap = max(int(np.floor(mean + margin + 0.5)), tail)
    return int(np.clip(cap, 2, user_cap))


def depth_probe_window(window_end, num_warmup, override=None, tail=50):
    """(probe_end, tail_len) for auto depth sizing.

    The probe runs at the ``max_depth`` ceiling until ~``tail`` steps past
    the FIRST metric-window close, and the cap is read from those last
    ``tail`` steps only: before the first metric update the depth
    distribution reflects the IDENTITY metric and reads too deep
    (measured on radon: a pre-metric probe reads q98~8 and picks cap 9
    where the adapted distribution gives 6).  ``override`` forces a fixed
    probe length (cap read from its second half).
    """
    if override is not None:
        probe = max(1, min(int(override), num_warmup))
        return probe, max(1, probe // 2)
    we = np.nonzero(np.asarray(window_end))[0]
    first_close = int(we[0]) + 1 if len(we) else num_warmup
    probe = min(first_close + tail, num_warmup)
    tail_len = probe - first_close
    if tail_len < 1:
        tail_len = max(1, probe // 2)
    return probe, tail_len


def treedepth_saturation(tree_depth, cap):
    """Fraction of transitions whose tree hit the depth cap (the Stan
    max-treedepth-warning analog; report it whenever a cap is set)."""
    return float(np.mean(np.asarray(tree_depth) >= cap))


def warn_on_treedepth_saturation(tree_depth, cap, threshold=0.05):
    """Warn when the sampling-phase saturation rate exceeds ``threshold``
    (trajectories are being truncated — raise the cap or re-run with
    ``auto_depth`` and a larger ``max_depth`` ceiling)."""
    import warnings

    rate = treedepth_saturation(tree_depth, cap)
    if rate > threshold:
        warnings.warn(
            f"NUTS tree-depth cap {cap} was hit on {100.0 * rate:.1f}% of "
            f"transitions (> {100.0 * threshold:.0f}%); trajectories are "
            "being truncated — raise max_depth (or the auto_depth ceiling)",
            stacklevel=2,
        )
    return rate


def find_reasonable_step_size(key, logp_grad_fn, state: IntegratorState,
                              inv_mass, eps0=1.0, max_iter=100):
    """Stan/NUTS-paper init heuristic: double/halve eps until the one-step
    acceptance probability crosses 1/2."""
    dt = state.z.dtype
    dim = state.z.shape[-1]
    r0 = sample_momentum(key, inv_mass, dim, dt)
    start = IntegratorState(state.z, r0, state.logp, state.grad)
    h0 = -start.logp + kinetic_energy(inv_mass, r0)

    def accept_log_prob(eps):
        s = leapfrog(logp_grad_fn, start, eps, inv_mass)
        h = -s.logp + kinetic_energy(inv_mass, s.r)
        h = jnp.where(jnp.isnan(h), jnp.inf, h)
        return h0 - h  # log accept prob

    # tie eps0's varying-axes type to the state so the while_loop carry is
    # consistent under shard_map (vma propagation)
    eps0 = jnp.asarray(eps0, dt) * jnp.ones_like(state.logp)
    direction = jnp.where(accept_log_prob(eps0) > jnp.log(0.5), 1.0, -1.0)

    def cond(carry):
        eps, it = carry
        crossed = jnp.where(
            direction > 0,
            accept_log_prob(eps) <= jnp.log(0.5),
            accept_log_prob(eps) > jnp.log(0.5),
        )
        return (~crossed) & (it < max_iter)

    def body(carry):
        eps, it = carry
        return eps * jnp.power(jnp.asarray(2.0, dt), direction), it + 1

    eps, _ = jax.lax.while_loop(cond, body, (eps0, jnp.asarray(0, jnp.int32)))
    # step back once on the shrinking side so we end on the acceptable side
    eps = jnp.where(direction < 0, eps, eps * 0.5)
    return jnp.clip(eps, 1e-8, 1e3)
