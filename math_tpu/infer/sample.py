"""Sampling driver: warmup + sampling, vmapped over chains, one jit.

The TPU-native successor of Stan's (downstream) sample service: thousands of
chains ride ``vmap`` inside a single XLA program (SURVEY.md §2.5's thread-DP
analog); sharding the chain axis over a device mesh lives in
``math_tpu.parallel``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.infer import adapt
from math_tpu.infer.nuts import IntegratorState, NutsStats, nuts_kernel


def _init_bad_mask(logdensity_fn, init, args=()):
    """Per-chain bool mask: chain starts at non-finite logp or gradient.

    Data flows in as jit *operands* (never closure constants — constants
    bake into the program and blow up compile time) and the probe runs on
    the host CPU backend when one is available, so the guard itself never
    dispatches to the fragile TPU worker.
    """

    def probe(z, a):
        return jax.vmap(
            jax.value_and_grad(lambda zz: logdensity_fn(zz, *a))
        )(z)

    init = jnp.asarray(init)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None  # platform pinned (e.g. JAX_PLATFORMS=axon); probe on it
    if cpu is not None:
        # plain-XLA paths only: the TPU Pallas kernels behind the
        # threshold dispatchers cannot compile on the CPU probe backend,
        # and one finiteness evaluation doesn't need them
        import dataclasses

        from math_tpu.config import get_config, update_config

        th0 = get_config().thresholds
        update_config(
            thresholds=dataclasses.replace(
                th0,
                glm_pallas_min_rows=1 << 60,
                cholesky_blocked_min_dim=1 << 60,
            )
        )
        try:
            with jax.default_device(cpu):
                args_h = jax.tree.map(
                    lambda x: jax.device_put(jnp.asarray(x), cpu), tuple(args)
                )
                lp, grad = jax.jit(probe)(jax.device_put(init, cpu), args_h)
        finally:
            update_config(thresholds=th0)
    else:
        lp, grad = jax.jit(probe)(init, tuple(args))
    lp = np.asarray(lp)
    gbad = ~np.all(np.isfinite(np.asarray(grad)), axis=-1)
    return (~np.isfinite(lp) | gbad), lp


def check_init_logdensity(logdensity_fn, init, args=()):
    """Host-side guard: raise if any chain starts at non-finite logp/grad.

    Stan's services retry/throw on a non-finite initial log density
    (util::initialize); here the stakes are higher — dispatching a NUTS
    program whose very first logp is nan/-inf can crash the remote TPU
    worker outright (see CLAUDE.md), so the cheap host-side check runs
    BEFORE the big program is launched.
    """
    bad, lp = _init_bad_mask(logdensity_fn, init, args)
    if bad.any():
        idx = np.nonzero(bad)[0].tolist()
        raise ValueError(
            f"non-finite initial log density or gradient for chains {idx} "
            f"(logp={lp[bad]}); fix the init (init=/init_radius=) or the "
            "model's support before sampling"
        )


def draw_init_positions(
    logdensity_fn, key, num_chains, dim, *, args=(), init_radius=2.0,
    dtype=jnp.float64, max_retries=100,
):
    """Uniform(-r, r) inits, re-drawing non-finite chains like Stan does.

    Stan's util::initialize re-draws a failing random init up to 100 times
    before giving up (services layer); user-SUPPLIED inits never retry —
    those go straight to ``check_init_logdensity``.
    """
    init = jax.random.uniform(
        key, (num_chains, dim), minval=-init_radius, maxval=init_radius,
        dtype=dtype,
    )
    bad, _ = _init_bad_mask(logdensity_fn, init, args)
    init_np = np.asarray(init)
    tries = 0
    while bad.any() and tries < max_retries:
        tries += 1
        k = jax.random.fold_in(key, tries)
        redraw = jax.random.uniform(
            k, (num_chains, dim), minval=-init_radius, maxval=init_radius,
            dtype=dtype,
        )
        init_np = np.where(bad[:, None], np.asarray(redraw), init_np)
        bad, _ = _init_bad_mask(logdensity_fn, init_np, args)
    return jnp.asarray(init_np, dtype)


class ChainResult(NamedTuple):
    position: jnp.ndarray  # (chains, num_samples, dim)
    stats: NutsStats  # leaves shaped (chains, num_samples)
    step_size: jnp.ndarray  # (chains,)
    inv_mass: jnp.ndarray  # (chains, dim)
    warmup_accept: jnp.ndarray  # (chains,) mean accept during warmup
    max_depth: int = 10  # sampling-phase tree-depth cap actually used


def _warmup_chain_factory(
    logdensity_fn: Callable,
    num_warmup: int,
    max_depth: int,
    target_accept: float,
    dense_mass: bool = False,
):
    """One chain's Stan-window warmup; returns the post-warmup sampler
    state PLUS the per-step tree-depth trace (``adapt.choose_depth_cap``
    input for the auto-sized sampling cap)."""
    logp_grad = jax.value_and_grad(logdensity_fn)

    if dense_mass:
        wf_init = adapt.welford_cov_init
        wf_update = adapt.welford_cov_update
        wf_final = adapt.welford_cov_regularized
    else:
        wf_init = adapt.welford_init
        wf_update = adapt.welford_update
        wf_final = adapt.welford_variance_regularized

    in_slow_np, window_end_np = adapt.warmup_schedule(num_warmup)

    def one_warm(key, z0):
        dt = z0.dtype
        dim = z0.shape[-1]
        logp0, grad0 = logp_grad(z0)
        state = IntegratorState(z0, jnp.zeros_like(z0), logp0, grad0)
        inv_mass = jnp.eye(dim, dtype=dt) if dense_mass else jnp.ones((dim,), dt)

        key, k_eps = jax.random.split(key)
        eps0 = adapt.find_reasonable_step_size(k_eps, logp_grad, state, inv_mass)
        da = adapt.da_init(eps0, dt)
        wf = wf_init(dim, dt)

        def warmup_step(carry, xs):
            state, da, wf, inv_mass, key, acc_sum = carry
            in_slow, win_end = xs
            key, k = jax.random.split(key)
            eps = jnp.exp(da.log_eps)
            state, stats = nuts_kernel(
                k, state, logp_grad, eps, inv_mass, max_depth
            )
            da = adapt.da_update(da, stats.accept_prob, target=target_accept)
            wf = jax.tree.map(
                lambda new, old: jnp.where(in_slow, new, old),
                wf_update(wf, state.z),
                wf,
            )

            def finish_window(args):
                da, wf, inv_mass = args
                inv_mass_new = wf_final(wf)
                wf_new = wf_init(dim, dt)
                # Re-center dual averaging on the current step size; the
                # metric just changed so the old averaged iterates are stale.
                da_new = adapt.da_init(jnp.exp(da.log_eps), dt)
                return da_new, wf_new, inv_mass_new

            da, wf, inv_mass = jax.lax.cond(
                win_end, finish_window, lambda a: a, (da, wf, inv_mass)
            )
            carry = (state, da, wf, inv_mass, key, acc_sum + stats.accept_prob)
            return carry, stats.tree_depth

        (state, da, wf, inv_mass, key, acc_sum), depths = jax.lax.scan(
            warmup_step,
            (state, da, wf, inv_mass, key, jnp.zeros((), dt)),
            (jnp.asarray(in_slow_np), jnp.asarray(window_end_np)),
        )
        eps_final = jnp.where(
            num_warmup > 0, jnp.exp(da.log_eps_bar), jnp.exp(da.log_eps)
        )
        warmup_accept = acc_sum / jnp.maximum(num_warmup, 1)
        return state, eps_final, inv_mass, warmup_accept, key, depths

    return one_warm


def _sample_chain_factory(
    logdensity_fn: Callable,
    num_samples: int,
    max_depth: int,
    thin: int = 1,
):
    """One chain's sampling phase from a warmed-up state (the cap here may
    be smaller than the warmup cap — see ``adapt.choose_depth_cap``)."""
    logp_grad = jax.value_and_grad(logdensity_fn)

    def one_samp(key, state, eps_final, inv_mass):
        def sample_step(carry, _):
            state, key = carry
            key, k = jax.random.split(key)

            def inner(carry2, _):
                state, key2 = carry2
                key2, kk = jax.random.split(key2)
                state, stats = nuts_kernel(
                    kk, state, logp_grad, eps_final, inv_mass, max_depth
                )
                return (state, key2), stats

            (state, _), stats_all = jax.lax.scan(
                inner, (state, k), None, length=thin
            )
            stats = jax.tree.map(lambda x: x[-1], stats_all)
            return (state, key), (state.z, stats)

        (state, key), (zs, stats) = jax.lax.scan(
            sample_step, (state, key), None, length=num_samples
        )
        return zs, stats

    return one_samp


def _one_chain_factory(
    logdensity_fn: Callable,
    num_warmup: int,
    num_samples: int,
    max_depth: int,
    target_accept: float,
    thin: int = 1,
    dense_mass: bool = False,
):
    """Fused warmup+sampling chain (one trace; the auto-depth path runs
    the two factories as separate dispatches instead — same key chain,
    so the draws match when the caps match)."""
    one_warm = _warmup_chain_factory(
        logdensity_fn, num_warmup, max_depth, target_accept, dense_mass
    )
    one_samp = _sample_chain_factory(logdensity_fn, num_samples, max_depth, thin)

    def one_chain(key, z0):
        state, eps_final, inv_mass, warmup_accept, key, _ = one_warm(key, z0)
        zs, stats = one_samp(key, state, eps_final, inv_mass)
        return zs, stats, eps_final, inv_mass, warmup_accept

    return one_chain


def sample_nuts(
    logdensity_fn: Callable,
    key,
    dim: Optional[int] = None,
    *,
    args=(),
    num_warmup: int = 1000,
    num_samples: int = 1000,
    num_chains: int = 4,
    init: Optional[jnp.ndarray] = None,
    max_depth: int = 10,
    target_accept: float = 0.8,
    init_radius: float = 2.0,
    thin: int = 1,
    dense_mass: bool = False,
    dtype=jnp.float64,
    auto_depth: bool = False,
    depth_margin: int = 2,
    treedepth_warn_threshold: float = 0.05,
) -> ChainResult:
    """Run NUTS with Stan-style windowed warmup; all chains vmapped + jitted.

    ``logdensity_fn``: flat unconstrained theta (+ ``*args``) -> scalar log
    density.  Pass large data through ``args`` rather than closing over it:
    closure constants get baked into the traced program and inflate compile
    time badly (observed 17x on a 100k x 50 GLM); ``args`` stay XLA
    parameters.  Returns positions of shape (chains, num_samples, dim).

    ``auto_depth=True``: warmup runs at the ``max_depth`` ceiling as its
    own dispatch; the SAMPLING phase is then recompiled with a cap
    auto-sized from the adapted tree-depth distribution of the second half
    of warmup (``adapt.choose_depth_cap`` — the transition's cost scales
    with the program's cap, measured 4.8x on eight-schools).  A warning
    fires if sampling saturates the chosen cap on more than
    ``treedepth_warn_threshold`` of transitions.
    """
    if init is None:
        if dim is None:
            raise ValueError("pass dim= or init=")
        key, k_init = jax.random.split(key)
        init = draw_init_positions(
            logdensity_fn, k_init, num_chains, dim, args=args,
            init_radius=init_radius, dtype=dtype,
        )
    init = jnp.asarray(init, dtype)
    num_chains = init.shape[0]
    check_init_logdensity(logdensity_fn, init, args)
    keys = jax.random.split(key, num_chains)

    if not auto_depth:
        def runner(keys, init, args):
            one_chain = _one_chain_factory(
                lambda z: logdensity_fn(z, *args),
                num_warmup,
                num_samples,
                max_depth,
                target_accept,
                thin,
                dense_mass,
            )
            return jax.vmap(one_chain)(keys, init)

        zs, stats, eps, inv_mass, warmup_accept = jax.jit(runner)(
            keys, init, args
        )
        return ChainResult(
            position=zs,
            stats=stats,
            step_size=eps,
            inv_mass=inv_mass,
            warmup_accept=warmup_accept,
            max_depth=max_depth,
        )

    def warm_runner(keys, init, args):
        one_warm = _warmup_chain_factory(
            lambda z: logdensity_fn(z, *args),
            num_warmup, max_depth, target_accept, dense_mass,
        )
        return jax.vmap(one_warm)(keys, init)

    states, eps, inv_mass, warmup_accept, keys2, depths = jax.jit(
        warm_runner
    )(keys, init, args)
    cap = adapt.choose_depth_cap(
        np.asarray(depths)[:, num_warmup // 2 :], max_depth, depth_margin
    )

    def samp_runner(keys, states, eps, inv_mass, args):
        one_samp = _sample_chain_factory(
            lambda z: logdensity_fn(z, *args), num_samples, cap, thin
        )
        return jax.vmap(one_samp)(keys, states, eps, inv_mass)

    zs, stats = jax.jit(samp_runner)(keys2, states, eps, inv_mass, args)
    adapt.warn_on_treedepth_saturation(
        np.asarray(stats.tree_depth), cap, treedepth_warn_threshold
    )
    return ChainResult(
        position=zs,
        stats=stats,
        step_size=eps,
        inv_mass=inv_mass,
        warmup_accept=warmup_accept,
        max_depth=cap,
    )
