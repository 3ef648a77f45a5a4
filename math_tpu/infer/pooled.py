"""Chain-batched NUTS with cross-chain pooled warmup.

Design note (SURVEY.md §5.7/§5.8): the reference's distributed backend is a
command/serialize/scatter MPI machine; the TPU-native replacement is SPMD —
all chains advance in lock-step under ``vmap``; warmup statistics (mean
acceptance for dual averaging, Welford moments for the metric) are pooled
across every chain on every device with ``psum``/``pmean`` over a named mesh
axis.  Pooling has no reference analog (Stan adapts per-chain); sharing the
metric across chains is strictly more statistically efficient when running
hundreds of chains.

This module is mesh-agnostic: pass ``axis_name`` when running under
``shard_map`` (see ``math_tpu.parallel``); with ``axis_name=None`` it pools
over the local vmap batch only.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from math_tpu.infer import adapt
from math_tpu.infer.nuts import IntegratorState, nuts_kernel


class PooledResult(NamedTuple):
    position: jnp.ndarray  # (local_chains, num_samples, dim)
    accept_prob: jnp.ndarray
    diverging: jnp.ndarray
    tree_depth: jnp.ndarray
    n_leapfrog: jnp.ndarray
    energy: jnp.ndarray
    step_size: jnp.ndarray  # scalar (shared)
    inv_mass: jnp.ndarray  # (dim,) shared
    max_depth: int = 10  # sampling-phase cap actually used (auto or user)


def _pmean(x, axis_name):
    x = jnp.mean(x, axis=0)
    if axis_name is not None:
        x = jax.lax.pmean(x, axis_name)
    return x


def _psum(x, axis_name):
    x = jnp.sum(x, axis=0)
    if axis_name is not None:
        x = jax.lax.psum(x, axis_name)
    return x


def _welford_merge_batch(wf: adapt.WelfordState, zs, axis_name):
    """Chan-style parallel merge of a cross-chain batch into the accumulator."""
    cg = zs.shape[0]
    if axis_name is not None:
        cg = jax.lax.psum(cg, axis_name)
    mb = _pmean(zs, axis_name)
    m2b = _psum(jnp.square(zs - mb), axis_name)
    n = wf.count
    n_new = n + cg
    delta = mb - wf.mean
    mean_new = wf.mean + delta * (cg / n_new)
    m2_new = wf.m2 + m2b + jnp.square(delta) * (n * cg / n_new)
    return adapt.WelfordState(n_new, mean_new, m2_new)


def _make_pooled_machine(
    keys, logdensity_fn, args, max_depth, target_accept, axis_name, dt, dim
):
    """(init, warmup_seg, sample_seg): the pooled-warmup NUTS machine as
    three pure segment functions sharing one key-folding scheme (fold_in
    by the GLOBAL step counter ``t`` carried across segments), so a run
    split across any segment boundaries is bit-identical to one trace."""
    logp_grad = jax.value_and_grad(lambda z: logdensity_fn(z, *args))

    kernel = jax.vmap(
        partial(nuts_kernel, max_depth=max_depth),
        in_axes=(0, 0, None, None, None),
    )

    def split_keys(key_batch, t):
        return jax.vmap(lambda k: jax.random.fold_in(k, t))(key_batch)

    def init(z0s):
        logp0, grad0 = jax.vmap(logp_grad)(z0s)
        states = IntegratorState(z0s, jnp.zeros_like(z0s), logp0, grad0)
        inv_mass = jnp.ones((dim,), dt)
        # shared initial step size: geometric mean of per-chain heuristics
        eps_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        single = jax.vmap(
            lambda k, s: adapt.find_reasonable_step_size(
                k, logp_grad, s, inv_mass
            )
        )(eps_keys, states)
        eps0 = jnp.exp(_pmean(jnp.log(single), axis_name))
        da = adapt.da_init(eps0, dt)
        wf = adapt.welford_init(dim, dt)
        return (states, da, wf, inv_mass, jnp.asarray(1, jnp.int32))

    def warmup_step(carry, xs):
        states, da, wf, inv_mass, t = carry
        in_slow, win_end = xs
        step_keys = split_keys(keys, t)
        eps = jnp.exp(da.log_eps)
        states, stats = kernel(step_keys, states, logp_grad, eps, inv_mass)
        acc = _pmean(stats.accept_prob, axis_name)
        da = adapt.da_update(da, acc, target=target_accept)
        wf_updated = _welford_merge_batch(wf, states.z, axis_name)
        wf = jax.tree.map(
            lambda new, old: jnp.where(in_slow, new, old), wf_updated, wf
        )

        def finish(args):
            da, wf, inv_mass = args
            return (
                adapt.da_init(jnp.exp(da.log_eps), dt),
                adapt.welford_init(dim, dt),
                adapt.welford_variance_regularized(wf),
            )

        da, wf, inv_mass = jax.lax.cond(
            win_end, finish, lambda a: a, (da, wf, inv_mass)
        )
        # pooled per-step tree-depth histogram (cross-chain, cross-device):
        # the auto-depth driver sizes the sampling-phase cap from the tail
        # of these (adapt.choose_depth_cap)
        hist = _psum(
            jax.nn.one_hot(stats.tree_depth, max_depth + 1, dtype=jnp.int32),
            axis_name,
        )
        return (states, da, wf, inv_mass, t + 1), hist

    def warmup_seg(carry, in_slow_seg, window_end_seg):
        carry, hists = jax.lax.scan(
            warmup_step, carry, (in_slow_seg, window_end_seg)
        )
        return carry, hists

    def sample_seg(states, t, eps_final, inv_mass, n):
        def sample_step(carry, _):
            states, t = carry
            step_keys = split_keys(keys, t)
            states, stats = kernel(
                step_keys, states, logp_grad, eps_final, inv_mass
            )
            return (states, t + 1), (states.z, stats)

        (states, t), (zs, stats) = jax.lax.scan(
            sample_step, (states, t), None, length=n
        )
        # pooled depth histogram (device-side reduce): the pilot decision
        # needs only (max_depth+1,) ints, not the (n, chains) depth array
        # — pulling the full array through the relay put ~100 ms of
        # transfer on the critical path (measured r5)
        hist = _psum(
            jnp.sum(
                jax.nn.one_hot(
                    stats.tree_depth, max_depth + 1, dtype=jnp.int32
                ),
                axis=0,
            ),
            axis_name,
        )
        return states, t, zs, stats, hist

    return init, warmup_seg, sample_seg


# Dispatch-function memo: re-creating the jax.jit wrappers on every driver
# call would RETRACE the whole NUTS machine each time (measured: ~7 s per
# eight-schools call on the relay backend — dwarfing the 1.5 s sample run).
# Keyed on the exact staging inputs; the logdensity_fn object is held
# strongly, which both keys correctly and keeps its jit caches alive.
_dispatch_memo: dict = {}


def _segment_dispatch_fns_cached(
    logdensity_fn, max_depth, target_accept, dt, dim, *, mesh=None,
    axis="chain"
):
    key = (logdensity_fn, max_depth, target_accept,
           jnp.dtype(dt).name, dim, mesh, axis)
    try:
        hit = _dispatch_memo.get(key)
    except TypeError:  # unhashable logdensity_fn: fall through uncached
        return _segment_dispatch_fns(
            logdensity_fn, max_depth, target_accept, dt, dim,
            mesh=mesh, axis=axis,
        )
    if hit is None:
        hit = _segment_dispatch_fns(
            logdensity_fn, max_depth, target_accept, dt, dim,
            mesh=mesh, axis=axis,
        )
        _dispatch_memo[key] = hit
    return hit


def _segment_dispatch_fns(
    logdensity_fn, max_depth, target_accept, dt, dim, *, mesh=None,
    axis="chain"
):
    """Jitted per-segment dispatch functions for the chunked driver.

    Uniform signatures (``args`` and the global ``keys`` batch are
    explicit operands on every call — traced, never baked as constants):

      init_j(keys, z0s, args) -> carry
      warm_j(carry, in_slow_seg, window_end_seg, keys, args) -> carry
      samp_j(states, t, eps_final, inv_mass, keys, args, n) -> ...

    With ``mesh=`` each dispatch is ``shard_map``-ped over ``axis``:
    chains shard, pooled warmup statistics pool with ``pmean``/``psum``
    across devices, pooled scalars come back replicated.
    """
    from jax.sharding import PartitionSpec as P

    def init_local(keys_l, z0_l, args_r):
        init, _, _ = _make_pooled_machine(
            keys_l, logdensity_fn, args_r, max_depth, target_accept,
            axis if mesh is not None else None, dt, dim,
        )
        return init(z0_l)

    def warm_local(carry, in_slow, win_end, keys_l, args_r):
        _, warmup_seg, _ = _make_pooled_machine(
            keys_l, logdensity_fn, args_r, max_depth, target_accept,
            axis if mesh is not None else None, dt, dim,
        )
        return warmup_seg(carry, in_slow, win_end)  # -> (carry, hists)

    def samp_local_factory(n):
        def samp_local(states, t, eps_final, inv_mass, keys_l, args_r):
            _, _, sample_seg = _make_pooled_machine(
                keys_l, logdensity_fn, args_r, max_depth, target_accept,
                axis if mesh is not None else None, dt, dim,
            )
            return sample_seg(states, t, eps_final, inv_mass, n)

        return samp_local

    if mesh is None:
        init_j = jax.jit(init_local)
        warm_j = jax.jit(warm_local)
        samp_cache = {}

        def samp_j(states, t, eps_final, inv_mass, keys_g, args_r, n):
            if n not in samp_cache:
                samp_cache[n] = jax.jit(samp_local_factory(n))
            return samp_cache[n](states, t, eps_final, inv_mass, keys_g,
                                 args_r)

        return init_j, warm_j, samp_j

    carry_spec = (P(axis), P(), P(), P(), P())
    init_j = jax.jit(
        jax.shard_map(
            init_local, mesh=mesh,
            in_specs=(P(axis), P(axis), P()), out_specs=carry_spec,
        )
    )
    warm_j = jax.jit(
        jax.shard_map(
            warm_local, mesh=mesh,
            in_specs=(carry_spec, P(), P(), P(axis), P()),
            out_specs=(carry_spec, P()),
        )
    )
    samp_cache = {}

    def samp_j(states, t, eps_final, inv_mass, keys_g, args_r, n):
        if n not in samp_cache:
            samp_cache[n] = jax.jit(
                jax.shard_map(
                    samp_local_factory(n), mesh=mesh,
                    in_specs=(P(axis), P(), P(), P(), P(axis), P()),
                    # zs/stats come out (n, local_chains, ...): the chain
                    # axis is second; the depth histogram is pooled
                    # (replicated)
                    out_specs=(P(axis), P(), P(None, axis), P(None, axis),
                               P()),
                )
            )
        return samp_cache[n](states, t, eps_final, inv_mass, keys_g, args_r)

    return init_j, warm_j, samp_j


def _pooled_result(zs, stats, eps_final, inv_mass, max_depth=10):
    # (num_samples, local_chains, dim) -> (local_chains, num_samples, dim)
    zs = jnp.swapaxes(zs, 0, 1)
    stats = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), stats)
    return PooledResult(
        position=zs,
        accept_prob=stats.accept_prob,
        diverging=stats.diverging,
        tree_depth=stats.tree_depth,
        n_leapfrog=stats.n_leapfrog,
        energy=stats.energy,
        step_size=eps_final,
        inv_mass=inv_mass,
        max_depth=max_depth,
    )


def run_pooled_chains(
    keys,
    z0s,
    logdensity_fn: Callable,
    *,
    args=(),
    num_warmup: int,
    num_samples: int,
    max_depth: int = 10,
    target_accept: float = 0.8,
    axis_name: Optional[str] = None,
) -> PooledResult:
    """Advance a batch of chains with shared (pooled) step size and metric.

    Shapes: ``keys`` (local_chains,) PRNG keys; ``z0s`` (local_chains, dim).
    Call directly for single-host, or wrap in ``shard_map`` with
    ``axis_name`` matching the mesh chain axis.  Pass large data via
    ``args`` (kept as traced operands, not baked constants).
    """
    dt = z0s.dtype
    _, dim = z0s.shape
    init, warmup_seg, sample_seg = _make_pooled_machine(
        keys, logdensity_fn, args, max_depth, target_accept, axis_name, dt, dim
    )
    in_slow_np, window_end_np = adapt.warmup_schedule(num_warmup)
    (states, da, wf, inv_mass, t), _ = warmup_seg(
        init(z0s), jnp.asarray(in_slow_np), jnp.asarray(window_end_np)
    )
    eps_final = jnp.where(
        num_warmup > 0, jnp.exp(da.log_eps_bar), jnp.exp(da.log_eps)
    )
    states, _, zs, stats, _ = sample_seg(
        states, t, eps_final, inv_mass, num_samples
    )
    return _pooled_result(zs, stats, eps_final, inv_mass, max_depth)


def run_pooled_chains_chunked(
    keys,
    z0s,
    logdensity_fn: Callable,
    *,
    args=(),
    num_warmup: int,
    num_samples: int,
    max_depth: int = 10,
    target_accept: float = 0.8,
    warmup_chunk: int = 100,
    sample_chunk: int = 100,
    mesh=None,
    axis: str = "chain",
    auto_depth: bool = False,
    depth_probe: Optional[int] = None,
    depth_margin: int = 2,
    warmup_start_cap: int = 6,
    treedepth_warn_threshold: float = 0.05,
) -> PooledResult:
    """``run_pooled_chains`` executed as bounded device dispatches.

    Bit-identical draws (the segment machine folds keys by the global step
    counter carried across segments), but each warmup/sampling chunk is
    its own jitted dispatch with a host sync in between — required on
    remote TPU workers that kill any single dispatch running ~90 s+
    (measured; see BENCHMARKS.md env notes).  Size chunks so worst-case
    trees ((2^max_depth - 1) leapfrogs x per-leapfrog wall x chunk) stay
    under ~40 s.  Not jittable (host loop).

    With ``mesh=`` each segment dispatch is additionally ``shard_map``-ped
    over the mesh's ``axis``: chains (``keys``/``z0s`` leading axis, must
    divide the mesh size) are sharded, pooled warmup statistics ride
    ``pmean``/``psum`` over ICI, and the returned draws carry the global
    chain axis — the multi-chip production path for long runs.

    ``auto_depth=True``: CONTINUOUS, SELF-CORRECTING cap auto-sizing.
    Warmup starts at ``min(max_depth, warmup_start_cap)`` and after every
    warmup chunk the cap is RE-CHOSEN (up or down, capped by
    ``max_depth``) from that chunk's tail tree-depth histogram via
    ``adapt.choose_depth_cap``; the sampling phase then re-sizes once
    more from a 100-draw pilot at the adapted (eps_bar) step size, and
    if the pilot's own cap-hit rate exceeds ``treedepth_warn_threshold``
    the cap is pushed UP and another 100-draw pilot re-checks (draws are
    kept; the escalation is bounded by ``max_depth``) — so the final cap
    never saturates above the warn threshold on the evidence that chose
    it.  Rationale (all measured, BENCHMARKS.md):

    * the transition's cost scales with the PROGRAM's cap (4.8x on
      eight-schools), so running warmup at the ceiling to "observe" the
      distribution costs more than the whole sampling phase (radon:
      one 100-step chunk at ceiling 10 costs ~6 s vs 4 s total at 6);
    * WARMUP truncation is statistically harmless — r4 ran radon's whole
      warmup at cap 6 with identical min-ESS — only the SAMPLING cap
      collapses ESS when set below the adapted depth (radon cap 5:
      138k -> 49k), and a too-low cap is self-evident in the very chunk
      it truncates: the distribution saturates, mean -> cap, and
      ``choose_depth_cap`` pushes the next chunk's cap UP (to the
      ceiling within ~2 chunks);
    * warmup depths at the noisy exp(log_eps) over-read the sampling
      distribution (which integrates at the averaged eps_bar) — hence
      the sampling-phase pilot re-size.

    The final cap is returned as ``PooledResult.max_depth`` and a
    warning fires if the sampling-phase saturation rate exceeds
    ``treedepth_warn_threshold``.  Draws are NOT bit-identical to a
    fixed-cap run (a different — still valid — sampler config).
    ``depth_probe`` forces a chunk split (and hence a re-size read) at
    that step instead of the first chunk boundary; under the lag-1 sync
    pipeline (below) the re-sized program takes effect one dispatch
    later.
    """
    import numpy as np

    dt = z0s.dtype
    _, dim = z0s.shape
    args = tuple(args)
    init_j, warm_j, samp_j = _segment_dispatch_fns_cached(
        logdensity_fn, max_depth, target_accept, dt, dim,
        mesh=mesh, axis=axis,
    )

    in_slow_np, window_end_np = adapt.warmup_schedule(num_warmup)
    cap = max_depth
    if auto_depth and warmup_start_cap < max_depth:
        cap = max(2, warmup_start_cap)
        init_j, warm_j, samp_j = _segment_dispatch_fns_cached(
            logdensity_fn, cap, target_accept, dt, dim,
            mesh=mesh, axis=axis,
        )
    carry = init_j(keys, z0s, args)
    probe = min(depth_probe, num_warmup) if (
        auto_depth and depth_probe is not None
    ) else 0

    def resize_from_hists(hists):
        # re-size (up OR down) from the chunk's tail distribution; the
        # LAST chunk's fully-adapted distribution seeds the sampling cap
        nonlocal cap, init_j, warm_j, samp_j
        h = np.asarray(hists)[-50:].sum(axis=0)
        depths = np.repeat(np.arange(h.shape[0]), h)
        new_cap = adapt.choose_depth_cap(depths, max_depth, depth_margin)
        if new_cap != cap:
            cap = new_cap
            init_j, warm_j, samp_j = _segment_dispatch_fns_cached(
                logdensity_fn, cap, target_accept, dt, dim,
                mesh=mesh, axis=axis,
            )

    # LAG-1 sync pipelining: the host sync per chunk (scalar device_get /
    # histogram pull) costs a full relay round trip (~32 ms measured), so
    # each chunk's sync object is consumed only AFTER the next chunk has
    # been dispatched — the transfer overlaps device compute and the sync
    # stall all but vanishes.  Consequences: a cap re-size takes effect
    # one chunk later (the self-correction ratchet is unchanged, one
    # chunk delayed), and a killed dispatch surfaces at the following
    # segment's sync instead of its own.
    pending = None  # un-consumed sync object from the previous chunk
    s = 0
    while s < num_warmup:
        e = min(s + warmup_chunk, num_warmup)
        if auto_depth and s < probe < e:
            e = probe  # split a chunk at the forced probe boundary
        carry, hists = warm_j(
            carry,
            jnp.asarray(in_slow_np[s:e]),
            jnp.asarray(window_end_np[s:e]),
            keys,
            args,
        )
        s = e
        if pending is not None:
            if auto_depth:
                resize_from_hists(pending)
            else:
                jax.device_get(pending)  # bound the dispatch stream
        pending = hists if auto_depth else carry[1].log_eps
    # the FINAL warmup sync object is NOT consumed before sampling starts:
    # in auto mode the sampling pilot's own histogram supersedes the
    # warmup-tail seed (warmup depths over-read the eps_bar distribution
    # anyway), so the pilot dispatches speculatively at the current cap
    # and the warmup->sampling relay bubble disappears; in fixed mode the
    # sampling chunks' own syncs bound the stream
    states, da, wf, inv_mass, t = carry
    eps_final = jnp.where(
        num_warmup > 0, jnp.exp(da.log_eps_bar), jnp.exp(da.log_eps)
    )
    zs_parts, stats_parts = [], []
    done = 0
    # sampling-phase pilot: warmup depths over-read the sampling
    # distribution (warmup integrates at the noisy exp(log_eps), sampling
    # at the averaged eps_bar — radon: warmup tail reads q98 6 -> cap 7
    # where sampling itself runs at 6), so the first draws re-size the
    # cap at the TRUE sampling step size; if the pilot saturates its own
    # cap past the warn threshold the cap escalates and another pilot
    # re-checks (bounded by the max_depth ceiling)
    pilot_end = min(100, num_samples) if auto_depth else 0
    piloting = auto_depth
    pending_t = None
    while done < num_samples:
        n = min(sample_chunk, num_samples - done)
        if piloting and done < pilot_end:
            n = min(n, pilot_end - done)
        states, t, zs, stats, hist = samp_j(
            states, t, eps_final, inv_mass, keys, args, n
        )
        zs_parts.append(zs)
        stats_parts.append(stats)
        done += n
        if piloting and done == pilot_end and done < num_samples:
            # decision point: must sync now — but only the pooled
            # (max_depth+1,) histogram crosses the relay, not the
            # (n, chains) depth array
            h = np.asarray(hist)
            depths = np.repeat(np.arange(h.shape[0]), h)
            new_cap = adapt.choose_depth_cap(depths, max_depth, depth_margin)
            sat = float(h[cap:].sum()) / max(1.0, float(h.sum()))
            if sat > treedepth_warn_threshold and cap < max_depth:
                new_cap = max(new_cap, cap + 1)
                pilot_end = min(done + 100, num_samples)  # re-pilot
            else:
                piloting = False
            if new_cap != cap:
                cap = new_cap
                _, _, samp_j = _segment_dispatch_fns_cached(
                    logdensity_fn, cap, target_accept, dt, dim,
                    mesh=mesh, axis=axis,
                )
            pending_t = None
        else:
            if pending_t is not None:
                jax.device_get(pending_t)  # lag-1 stream bound
            pending_t = t
    zs = jnp.concatenate(zs_parts, axis=0)
    stats = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0), *stats_parts
    )
    if auto_depth:
        adapt.warn_on_treedepth_saturation(
            np.asarray(stats.tree_depth), cap, treedepth_warn_threshold
        )
    return _pooled_result(zs, stats, eps_final, inv_mass, cap)
