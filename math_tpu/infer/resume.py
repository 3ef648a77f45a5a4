"""Resumable, checkpointed NUTS driver.

Runs warmup once, then samples in fixed-size chunks; after each chunk the
full sampler state (positions, cached logp/grad, adapted step size/metric,
RNG key, draw counter) is persisted via ``math_tpu.io.checkpoint``.  A
killed run restarted with the same arguments continues from the last chunk
bit-compatibly (RNG is counter-based, so the draw stream is reproducible).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.infer import adapt
from math_tpu.infer.nuts import IntegratorState, nuts_kernel
from math_tpu.io.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)


def _warmup_chains(logdensity_fn, keys, z0s, num_warmup, max_depth, target_accept):
    """Per-chain Stan-window warmup; returns final states + eps + inv_mass."""
    logp_grad = jax.value_and_grad(logdensity_fn)
    in_slow_np, window_end_np = adapt.warmup_schedule(num_warmup)

    def one(key, z0):
        dt = z0.dtype
        dim = z0.shape[-1]
        logp0, grad0 = logp_grad(z0)
        state = IntegratorState(z0, jnp.zeros_like(z0), logp0, grad0)
        inv_mass = jnp.ones((dim,), dt)
        key, k_eps = jax.random.split(key)
        eps0 = adapt.find_reasonable_step_size(k_eps, logp_grad, state, inv_mass)
        da = adapt.da_init(eps0, dt)
        wf = adapt.welford_init(dim, dt)

        def step(carry, xs):
            state, da, wf, inv_mass, key = carry
            in_slow, win_end = xs
            key, k = jax.random.split(key)
            state, stats = nuts_kernel(
                k, state, logp_grad, jnp.exp(da.log_eps), inv_mass, max_depth
            )
            da = adapt.da_update(da, stats.accept_prob, target=target_accept)
            wf = jax.tree.map(
                lambda new, old: jnp.where(in_slow, new, old),
                adapt.welford_update(wf, state.z),
                wf,
            )

            def finish(a):
                da, wf, inv_mass = a
                return (
                    adapt.da_init(jnp.exp(da.log_eps), dt),
                    adapt.welford_init(dim, dt),
                    adapt.welford_variance_regularized(wf),
                )

            da, wf, inv_mass = jax.lax.cond(
                win_end, finish, lambda a: a, (da, wf, inv_mass)
            )
            return (state, da, wf, inv_mass, key), stats.tree_depth

        (state, da, wf, inv_mass, key), depths = jax.lax.scan(
            step,
            (state, da, wf, inv_mass, key),
            (jnp.asarray(in_slow_np), jnp.asarray(window_end_np)),
        )
        eps = jnp.where(num_warmup > 0, jnp.exp(da.log_eps_bar), jnp.exp(da.log_eps))
        return state, eps, inv_mass, key, depths

    return jax.vmap(one)(keys, z0s)


def _warmup_init(logdensity_fn, keys, z0s):
    """Initial integrator + adaptation state for segmented warmup."""
    logp_grad = jax.value_and_grad(logdensity_fn)

    def one(key, z0):
        dt = z0.dtype
        dim = z0.shape[-1]
        logp0, grad0 = logp_grad(z0)
        state = IntegratorState(z0, jnp.zeros_like(z0), logp0, grad0)
        inv_mass = jnp.ones((dim,), dt)
        key, k_eps = jax.random.split(key)
        eps0 = adapt.find_reasonable_step_size(k_eps, logp_grad, state, inv_mass)
        return state, adapt.da_init(eps0, dt), adapt.welford_init(dim, dt), inv_mass, key

    return jax.vmap(one)(keys, z0s)


def _warmup_segment(
    logdensity_fn, carry, in_slow_seg, window_end_seg, max_depth, target_accept
):
    """Run one slice of the Stan warmup schedule; same body as
    ``_warmup_chains`` but resumable — the (state, da, wf, inv_mass, key)
    carry crosses dispatch boundaries so each segment is a short device
    program (the remote TPU worker kills very long dispatches)."""
    logp_grad = jax.value_and_grad(logdensity_fn)

    def one(state, da, wf, inv_mass, key):
        dt = state.z.dtype
        dim = state.z.shape[-1]

        def step(c, xs):
            state, da, wf, inv_mass, key = c
            in_slow, win_end = xs
            key, k = jax.random.split(key)
            state, stats = nuts_kernel(
                k, state, logp_grad, jnp.exp(da.log_eps), inv_mass, max_depth
            )
            da = adapt.da_update(da, stats.accept_prob, target=target_accept)
            wf = jax.tree.map(
                lambda new, old: jnp.where(in_slow, new, old),
                adapt.welford_update(wf, state.z),
                wf,
            )

            def finish(a):
                da, wf, inv_mass = a
                return (
                    adapt.da_init(jnp.exp(da.log_eps), dt),
                    adapt.welford_init(dim, dt),
                    adapt.welford_variance_regularized(wf),
                )

            da, wf, inv_mass = jax.lax.cond(
                win_end, finish, lambda a: a, (da, wf, inv_mass)
            )
            return (state, da, wf, inv_mass, key), stats.tree_depth

        (state, da, wf, inv_mass, key), depths = jax.lax.scan(
            step, (state, da, wf, inv_mass, key), (in_slow_seg, window_end_seg)
        )
        return (state, da, wf, inv_mass, key), depths

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(*carry)


def _sample_chunk(logdensity_fn, states, eps, inv_mass, keys, chunk, max_depth):
    logp_grad = jax.value_and_grad(logdensity_fn)

    def one(state, e, im, key):
        def step(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            state, stats = nuts_kernel(k, state, logp_grad, e, im, max_depth)
            return (state, key), (
                state.z, stats.diverging, stats.n_leapfrog, stats.tree_depth
            )

        (state, key), (zs, div, nlf, td) = jax.lax.scan(
            step, (state, key), None, length=chunk
        )
        return state, key, zs, div, nlf, td

    return jax.vmap(one)(states, eps, inv_mass, keys)


def sample_nuts_checkpointed(
    logdensity_fn: Callable,
    key,
    dim: int,
    *,
    checkpoint_path: str,
    num_warmup: int = 1000,
    num_samples: int = 1000,
    num_chains: int = 4,
    chunk_size: int = 200,
    warmup_chunk_size: Optional[int] = None,
    max_depth: int = 10,
    target_accept: float = 0.8,
    init_radius: float = 2.0,
    dtype=jnp.float64,
    draw_store_path: Optional[str] = None,
    auto_depth: bool = False,
    depth_probe: Optional[int] = None,
    depth_margin: int = 2,
    treedepth_warn_threshold: float = 0.05,
):
    """NUTS with periodic checkpointing; restarts resume automatically.

    ``draw_store_path``: also stream each chunk to the native append-only
    draw log (``math_tpu.io.draw_store``) — crash-safe output that survives
    even if the orbax checkpoint directory is lost.

    ``auto_depth=True``: the first ``depth_probe`` warmup steps run at the
    ``max_depth`` ceiling; the cap for the rest of warmup (segmented path)
    and all of sampling is auto-sized from the probe tail's tree-depth
    distribution (``adapt.choose_depth_cap`` — transition cost scales with
    the PROGRAM's cap, measured 4.8x).  The chosen cap persists in the
    checkpoint so a resumed run continues bit-identically; the sampling
    saturation rate is reported in ``info`` and warned on above
    ``treedepth_warn_threshold``.

    Returns (positions (chains, num_samples, dim), diverging, info dict).
    """
    warm = jax.jit(
        lambda keys, z0: _warmup_chains(
            logdensity_fn, keys, z0, num_warmup, max_depth, target_accept
        )
    )
    cap = max_depth

    if checkpoint_exists(checkpoint_path):
        ck = load_checkpoint(checkpoint_path)
        required = (
            "z", "r", "logp", "grad", "eps", "inv_mass", "keys",
            "draws", "divs", "done",
        )
        missing = [k for k in required if k not in ck]
        if missing:
            raise ValueError(
                f"checkpoint at {checkpoint_path} is incomplete (missing "
                f"{missing}); delete it to restart from scratch"
            )
        if np.asarray(ck["draws"]).shape[1] != int(ck["done"]):
            raise ValueError(
                f"checkpoint at {checkpoint_path} is corrupt: 'done'="
                f"{int(ck['done'])} but draws hold "
                f"{np.asarray(ck['draws']).shape[1]} samples; delete it to "
                "restart from scratch"
            )
        states = IntegratorState(
            jnp.asarray(ck["z"]), jnp.asarray(ck["r"]),
            jnp.asarray(ck["logp"]), jnp.asarray(ck["grad"]),
        )
        eps = jnp.asarray(ck["eps"])
        inv_mass = jnp.asarray(ck["inv_mass"])
        keys = jnp.asarray(ck["keys"])
        draws = [np.asarray(ck["draws"])]
        divs = [np.asarray(ck["divs"])]
        done = int(ck["done"])
        cap = int(ck.get("max_depth_used", max_depth))
    else:
        key, k_init = jax.random.split(key)
        from math_tpu.infer.sample import (
            check_init_logdensity,
            draw_init_positions,
        )

        z0 = draw_init_positions(
            logdensity_fn, k_init, num_chains, dim,
            init_radius=init_radius, dtype=dtype,
        )
        keys = jax.random.split(key, num_chains)
        check_init_logdensity(logdensity_fn, z0)
        if warmup_chunk_size is None:
            states, eps, inv_mass, keys, wdepths = warm(keys, z0)
            if auto_depth:
                # monolithic warmup runs whole at the ceiling; the cap
                # applies to the sampling program only
                cap = adapt.choose_depth_cap(
                    np.asarray(wdepths)[:, num_warmup // 2 :],
                    max_depth, depth_margin,
                )
        else:
            # segmented warmup: each schedule slice is its own dispatch,
            # bounding device-program runtime (expensive models on the
            # remote TPU worker) while reproducing _warmup_chains exactly
            in_slow_np, window_end_np = adapt.warmup_schedule(num_warmup)
            init_fn = jax.jit(partial(_warmup_init, logdensity_fn))
            seg_fn = jax.jit(
                partial(
                    _warmup_segment,
                    logdensity_fn,
                    max_depth=max_depth,
                    target_accept=target_accept,
                )
            )
            carry = init_fn(keys, z0)
            probe, probe_tail = (
                adapt.depth_probe_window(window_end_np, num_warmup, depth_probe)
                if auto_depth else (0, 0)
            )
            probe_depths = []
            s = 0
            while s < num_warmup:
                e = min(s + warmup_chunk_size, num_warmup)
                if auto_depth and s < probe < e:
                    e = probe  # split the chunk at the probe boundary
                carry, seg_depths = seg_fn(
                    carry,
                    in_slow_seg=jnp.asarray(in_slow_np[s:e]),
                    window_end_seg=jnp.asarray(window_end_np[s:e]),
                )
                # Host-sync each segment so a killed dispatch surfaces at
                # the segment that died (async dispatch would otherwise
                # enqueue all segments and report the failure at the first
                # draw transfer).  device_get of a scalar —
                # block_until_ready can return early through the relay.
                # NOTE the binding constraint (measured, v5e relay): the
                # worker kills any SINGLE dispatch running ~90 s+; a
                # 16-minute host loop of 123 ms dispatches survives.  Size
                # warmup_chunk_size so worst-case trees (2^max_depth - 1
                # leapfrogs x per-leapfrog wall x chunk) stay under ~40 s.
                jax.device_get(carry[1].log_eps.reshape(-1)[0])
                if auto_depth and s < probe:
                    probe_depths.append(np.asarray(seg_depths))
                s = e
                if auto_depth and s == probe:
                    d = np.concatenate(probe_depths, axis=1)
                    # tail only: pre-first-metric-window depths reflect
                    # the identity metric and read too deep (see
                    # adapt.depth_probe_window)
                    cap = adapt.choose_depth_cap(
                        d[:, -probe_tail:], max_depth, depth_margin
                    )
                    if cap != max_depth:
                        seg_fn = jax.jit(
                            partial(
                                _warmup_segment,
                                logdensity_fn,
                                max_depth=cap,
                                target_accept=target_accept,
                            )
                        )
            states, da, _, inv_mass, keys = carry
            eps = jnp.where(
                num_warmup > 0, jnp.exp(da.log_eps_bar), jnp.exp(da.log_eps)
            )
        draws, divs, done = [], [], 0

    chunk_fn = jax.jit(
        partial(_sample_chunk, logdensity_fn, chunk=chunk_size, max_depth=cap)
    )
    store = None
    if draw_store_path is not None:
        from math_tpu.io.draw_store import DrawStore

        store = DrawStore(draw_store_path, num_chains, dim,
                          np.dtype(np.float64) if dtype == jnp.float64 else np.float32)

    n_leapfrog = 0
    sat_hits, sat_total = 0, 0
    pilot_pending = auto_depth and done == 0 and num_samples > chunk_size
    while done < num_samples:
        n = min(chunk_size, num_samples - done)
        states, keys, zs, div, nlf, td = chunk_fn(states, eps, inv_mass, keys)
        zs = np.asarray(zs)[:, :n]
        div = np.asarray(div)[:, :n]
        n_leapfrog += int(np.asarray(nlf)[:, :n].sum())
        td_np = np.asarray(td)[:, :n]
        sat_hits += int((td_np >= cap).sum())
        sat_total += td_np.size
        if pilot_pending:
            # sampling-phase pilot re-size: warmup depths over-read the
            # sampling distribution (warmup integrates at the noisy
            # exp(log_eps), sampling at the averaged eps_bar); but if the
            # pilot SATURATES its own cap past the warn threshold, the
            # cap escalates and the next chunk re-checks (bounded by the
            # max_depth ceiling) — a cap that saturates is both
            # statistically truncating and, measured r5, SLOWER (the
            # saturated worst lane burns its full budget every
            # transition)
            sat = float((td_np >= cap).mean())
            if sat > treedepth_warn_threshold and cap < max_depth:
                new_cap = max(
                    cap + 1,
                    adapt.choose_depth_cap(td_np, max_depth, depth_margin),
                )
            else:
                new_cap = min(
                    cap, adapt.choose_depth_cap(td_np, cap, depth_margin)
                )
                pilot_pending = False
            if new_cap != cap:
                cap = new_cap
                chunk_fn = jax.jit(
                    partial(_sample_chunk, logdensity_fn,
                            chunk=chunk_size, max_depth=cap)
                )
        draws.append(zs)
        divs.append(div)
        done += n
        if store is not None:
            store.append(zs.transpose(1, 0, 2))  # (n, chains, dim)
        save_checkpoint(
            checkpoint_path,
            {
                "z": np.asarray(states.z),
                "r": np.asarray(states.r),
                "logp": np.asarray(states.logp),
                "grad": np.asarray(states.grad),
                "eps": np.asarray(eps),
                "inv_mass": np.asarray(inv_mass),
                "keys": np.asarray(keys),
                "draws": np.concatenate(draws, axis=1),
                "divs": np.concatenate(divs, axis=1),
                "done": np.asarray(done),
                "max_depth_used": np.asarray(cap),
            },
        )

    if store is not None:
        store.close()
    positions = np.concatenate(draws, axis=1)[:, :num_samples]
    diverging = np.concatenate(divs, axis=1)[:, :num_samples]
    info = {
        "step_size": np.asarray(eps),
        "inv_mass": np.asarray(inv_mass),
        # sampling-phase leapfrogs executed THIS process (telemetry only;
        # not checkpointed, so a resumed run counts from its restart)
        "n_leapfrog": n_leapfrog,
        "resumed": checkpoint_exists(checkpoint_path),
        "max_depth_used": cap,
        "treedepth_hit_rate": (
            sat_hits / sat_total if sat_total else 0.0
        ),
    }
    if auto_depth and sat_total:
        import warnings as _w

        rate = sat_hits / sat_total
        if rate > treedepth_warn_threshold:
            _w.warn(
                f"NUTS tree-depth cap {cap} hit on {100.0 * rate:.1f}% of "
                "transitions; trajectories truncated — raise max_depth",
                stacklevel=2,
            )
    return positions, diverging, info
