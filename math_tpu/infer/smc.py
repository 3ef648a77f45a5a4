"""SMC with adaptive likelihood tempering and systematic resampling.

Scope extension over the reference (BASELINE.md config 5 demands SMC
tempering).  Design:

- particles live in the unconstrained space; the tempered target is
      pi_t(z) ∝ p0(z) * exp(t * (logp(z) - p0(z)))     t: 0 -> 1
  with p0 a standard-normal reference (importance init) — equivalently
  tempering the full posterior against the reference.
- the next temperature is chosen by bisection so the incremental weights'
  relative ESS hits a target (adaptive tempering),
- resampling is systematic (vectorized cumsum + stratified uniform),
- mutation is a few NUTS transitions at the current tempered density with
  a step size tuned from the previous round's acceptance.

Distributed: weights/moments pool over an optional ``axis_name`` via
``psum``; resampling indices are computed against the *global* weight
vector gathered with ``all_gather`` (tiny: one scalar per particle).
Particles themselves are NEVER all-gathered: ancestors are fetched with
``ppermute`` block rotations, and a rotation is only executed when some
shard actually has an ancestor at that shard offset (systematic-resample
indices are sorted, so each shard's ancestors span a narrow contiguous
shard range — near-equal weights need offsets {-1, 0, +1} only).  This is
the SURVEY.md §5.8 collective-resampling design.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from math_tpu.infer.nuts import IntegratorState, _vary_like, nuts_kernel


class SMCResult(NamedTuple):
    particles: jnp.ndarray  # (n, dim) final (unweighted after resample)
    log_evidence: jnp.ndarray  # log Z estimate
    num_stages: jnp.ndarray
    final_step_size: jnp.ndarray


def systematic_resample(key, log_weights):
    """Systematic resampling indices for normalized log weights."""
    n = log_weights.shape[0]
    w = jnp.exp(log_weights - jax.scipy.special.logsumexp(log_weights))
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), dtype=w.dtype)
    pts = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    idx = jnp.searchsorted(cum, pts, side="left").astype(jnp.int32)
    # float cumsum can top out below 1.0, letting searchsorted return n for
    # the last stratified points; clamp so every id is a valid particle (the
    # unclamped id would silently map to no ppermute offset downstream).
    return jnp.minimum(idx, n - 1)


def ancestor_exchange(z, idx, axis_name):
    """Fetch global ancestor particles into local slots without all_gather.

    ``z`` is this shard's ``(n, dim)`` particle block; ``idx`` the global
    ancestor ids (in ``[0, n*num_shards)``) this shard must receive.  For
    each shard offset ``d`` the local block is rotated by ``d`` with
    ``ppermute`` — but only when some shard on the mesh needs an ancestor at
    that offset (``pmax`` of local demand; the predicate is replicated, so
    every shard takes the same branch and the collective stays legal).

    Transfer bound: bytes moved = (#distinct needed offsets) x block size,
    vs. ``all_gather``'s (num_shards - 1) x block size; systematic-resample
    ids are sorted, so the needed offsets are a contiguous band around 0.
    """
    n = z.shape[0]
    num_shards = jax.lax.psum(1, axis_name)
    shard = jax.lax.axis_index(axis_name)
    src_shard = (idx // n).astype(jnp.int32)
    src_pos = (idx % n).astype(jnp.int32)

    # offset 0: ancestors already resident — no communication.  Slots whose
    # ancestor lives elsewhere also start from z[src_pos] (a valid local
    # particle) rather than zeros, so an id that matches no rotation offset
    # degrades to a real particle instead of an injected all-zeros one.
    out = z[src_pos]
    for d in range(1, num_shards):
        # rotating by d delivers shard (p + d) % D's block to shard p
        perm = [((p + d) % num_shards, p) for p in range(num_shards)]
        sel = src_shard == (shard + d) % num_shards
        need = jax.lax.pmax(jnp.any(sel).astype(jnp.int32), axis_name)

        def fetch(out, sel=sel, perm=perm):
            zr = jax.lax.ppermute(z, axis_name, perm)
            return jnp.where(sel[:, None], zr[src_pos], out)

        out = jax.lax.cond(need > 0, fetch, lambda o: o, out)
    return out


def _rel_ess(log_w):
    lw = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw)) / log_w.shape[0]


def _next_temperature(t, log_like, target_ess, max_bisect=30):
    """Bisect dt so rel-ESS of exp(dt * log_like) hits target_ess."""

    def ess_at(dt):
        return _rel_ess(dt * log_like)

    hi_ok = ess_at(1.0 - t) >= target_ess

    def body(carry):
        lo, hi, it = carry
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target_ess
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
        return lo, hi, it + 1

    def cond(carry):
        lo, hi, it = carry
        return it < max_bisect

    init = _vary_like(
        (jnp.zeros_like(t), 1.0 - t, jnp.asarray(0, jnp.int32)), log_like
    )
    lo, hi, _ = jax.lax.while_loop(cond, body, init)
    dt = jnp.where(hi_ok, 1.0 - t, lo)
    return jnp.minimum(t + dt, 1.0)


def _pbatch_map(fn, tree, batch):
    """Apply ``fn`` to leading-axis sub-batches of ``tree`` via ``lax.map``.

    ``fn`` maps a ``(batch, ...)`` pytree to ``(batch, ...)`` outputs; with
    ``batch=None`` this is just ``fn(tree)``.  Bounds peak memory for
    per-particle programs with large intermediates (e.g. a (n, n) kernel
    matrix per particle): only ``batch`` particles' buffers live at once.
    """
    if batch is None:
        return fn(tree)
    n = jax.tree.leaves(tree)[0].shape[0]
    if n % batch:
        raise ValueError(f"num_particles={n} not divisible by particle_batch={batch}")
    nb = n // batch
    chunked = jax.tree.map(
        lambda x: x.reshape((nb, batch) + x.shape[1:]), tree
    )
    out = jax.lax.map(fn, chunked)
    return jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), out)


def _make_smc_stage(
    logdensity_fn, dim, args, num_particles, mutation_steps, max_depth,
    target_rel_ess, init_scale, axis_name, particle_batch,
):
    """The per-stage transition shared by the monolithic and the
    host-driven (stagewise) SMC drivers — one body, so dispatch boundaries
    cannot change the stream."""

    def ld(z):
        return logdensity_fn(z, *args)

    def ref_lp(z):
        return -0.5 * jnp.sum(jnp.square(z / init_scale)) - dim * jnp.log(
            init_scale
        )

    def tempered(z, t):
        return ref_lp(z) + t * (ld(z) - ref_lp(z))

    def gather(x):
        if axis_name is None:
            return x
        return jax.lax.all_gather(x, axis_name, tiled=True)

    def stage(carry):
        z, t, logz, stage_idx, eps, key, key_local = carry
        log_like = _pbatch_map(
            jax.vmap(lambda zz: ld(zz) - ref_lp(zz)), z, particle_batch
        )
        log_like = jnp.where(jnp.isnan(log_like), -jnp.inf, log_like)
        log_like_g = gather(log_like)
        t_new = _next_temperature(t, log_like_g, target_rel_ess)
        dt = t_new - t
        log_w_g = dt * log_like_g
        logz = logz + jax.scipy.special.logsumexp(log_w_g) - jnp.log(
            log_w_g.shape[0]
        )

        key, k_res = jax.random.split(key)
        idx = systematic_resample(k_res, log_w_g)
        if axis_name is None:
            z = z[idx]
        else:
            shard = jax.lax.axis_index(axis_name)
            idx_local = jax.lax.dynamic_slice_in_dim(
                idx, shard * num_particles, num_particles
            )
            z = ancestor_exchange(z, idx_local, axis_name)

        # mutation: NUTS at the new tempered target
        lg = jax.value_and_grad(lambda zz: tempered(zz, t_new))
        lp0, g0 = _pbatch_map(jax.vmap(lg), z, particle_batch)
        states = IntegratorState(z, jnp.zeros_like(z), lp0, g0)
        kernel = jax.vmap(
            partial(nuts_kernel, max_depth=max_depth),
            in_axes=(0, 0, None, None, None),
        )
        # cross-shard pooled moment for the mutation metric
        mean_g = jnp.mean(z, axis=0)
        var_g = jnp.mean(jnp.square(z - mean_g), axis=0)
        if axis_name is not None:
            mean_g = jax.lax.pmean(jnp.mean(z, axis=0), axis_name)
            var_g = jax.lax.pmean(
                jnp.mean(jnp.square(z - mean_g), axis=0), axis_name
            )
        inv_mass = jnp.maximum(var_g, 1e-6)

        def mstep(carry2, i):
            states, key2 = carry2
            key2, k = jax.random.split(key2)
            ks = jax.random.split(k, num_particles)
            states, stats = _pbatch_map(
                lambda ops: kernel(ops[0], ops[1], lg, eps, inv_mass),
                (ks, states),
                particle_batch,
            )
            acc = jnp.mean(stats.accept_prob)
            if axis_name is not None:
                acc = jax.lax.pmean(acc, axis_name)
            return (states, key2), acc

        (states, key_local), accs = jax.lax.scan(
            (lambda c, i: mstep(c, i)),
            (states, key_local),
            jnp.arange(mutation_steps),
        )
        acc = accs[-1]
        # crude Robbins-Monro step-size tune toward 0.65 acceptance
        eps = eps * jnp.exp(1.0 * (acc - 0.65))
        return states.z, t_new, logz, stage_idx + 1, eps, key, key_local

    return stage


def _smc_init(key, dim, num_particles, init_scale, dtype, axis_name):
    """Initial carry for the SMC stage machine.

    Two PRNG streams: ``key`` (shared — identical on every shard, drives
    temperature/resampling so all shards agree on global ancestry) and
    ``key_local`` (per-shard — drives particle init and mutation noise).
    """
    key, k_init = jax.random.split(key)
    if axis_name is not None:
        key_local = jax.random.fold_in(key, 1 + jax.lax.axis_index(axis_name))
        k_init = jax.random.fold_in(k_init, jax.lax.axis_index(axis_name))
    else:
        key_local = jax.random.fold_in(key, 1)
    z = init_scale * jax.random.normal(k_init, (num_particles, dim), dtype)
    return _vary_like(
        (
            z,
            jnp.zeros((), dtype),
            jnp.zeros((), dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0.2, dtype),
            key,
            key_local,
        ),
        z,
    )


def smc_tempered(
    logdensity_fn: Callable,
    key,
    dim: int,
    *,
    args=(),
    num_particles: int = 1024,
    mutation_steps: int = 3,
    max_depth: int = 6,
    target_rel_ess: float = 0.5,
    max_stages: int = 100,
    init_scale: float = 1.0,
    dtype=jnp.float64,
    axis_name: Optional[str] = None,
    particle_batch: Optional[int] = None,
) -> SMCResult:
    """Adaptive tempered SMC from N(0, init_scale^2 I) to the posterior.

    Under ``shard_map`` pass ``axis_name``: ``num_particles`` is then the
    *local* count; temperature selection and resampling operate on the
    globally gathered weight vector (``all_gather`` — SURVEY.md §5.8), and
    cross-shard ancestors are fetched with ``ppermute`` rotations.

    ``particle_batch``: evaluate per-particle programs in sub-batches via
    ``lax.map`` to bound peak memory (needed when each particle's log
    density holds large intermediates, e.g. an (n, n) GP kernel matrix);
    must divide ``num_particles``.

    One ``while_loop`` over stages — a single device dispatch.  On remote
    workers that kill long dispatches use ``smc_tempered_stagewise``.
    """
    stage = _make_smc_stage(
        logdensity_fn, dim, args, num_particles, mutation_steps, max_depth,
        target_rel_ess, init_scale, axis_name, particle_batch,
    )

    def cond(carry):
        _, t, _, stage_idx, _, _, _ = carry
        return (t < 1.0) & (stage_idx < max_stages)

    init = _smc_init(key, dim, num_particles, init_scale, dtype, axis_name)
    z, t, logz, stages, eps, key, key_local = jax.lax.while_loop(
        cond, stage, init
    )
    if axis_name is not None:
        # scalars are logically replicated (driven by the shared key and
        # gathered weights); make that explicit for the vma type system
        logz = jax.lax.pmean(logz, axis_name)
        eps = jax.lax.pmean(eps, axis_name)
        stages = jax.lax.pmax(stages, axis_name)
    return SMCResult(
        particles=z, log_evidence=logz, num_stages=stages, final_step_size=eps
    )


def smc_tempered_stagewise(
    logdensity_fn: Callable,
    key,
    dim: int,
    *,
    args=(),
    num_particles: int = 1024,
    mutation_steps: int = 3,
    max_depth: int = 6,
    target_rel_ess: float = 0.5,
    max_stages: int = 100,
    init_scale: float = 1.0,
    dtype=jnp.float64,
    particle_batch: Optional[int] = None,
    progress_fn: Optional[Callable] = None,
) -> SMCResult:
    """``smc_tempered`` with each stage as its own bounded device dispatch.

    The host drives the temperature ladder: one jitted stage transition per
    dispatch, with a scalar sync in between — required on remote TPU
    workers that kill any single dispatch running ~90 s+ (the SMC analog of
    the chunked NUTS drivers).  Same stage body and key folding as the
    monolithic driver, so the particle stream is bit-identical.  Not
    jittable (host loop); single-host (use the shard_map path of
    ``smc_tempered`` for meshes).

    ``progress_fn(stage_idx, t, logz)`` if given is called after each stage
    (e.g. for logging the temperature ladder).
    """
    stage_j = jax.jit(
        _make_smc_stage(
            logdensity_fn, dim, args, num_particles, mutation_steps,
            max_depth, target_rel_ess, init_scale, None, particle_batch,
        )
    )
    carry = jax.jit(
        lambda k: _smc_init(k, dim, num_particles, init_scale, dtype, None)
    )(key)
    t = 0.0
    stages = 0
    while t < 1.0 and stages < max_stages:
        carry = stage_j(carry)
        # scalar host sync: bounds the dispatch stream, drives the ladder
        t = float(jax.device_get(carry[1]))
        stages = int(jax.device_get(carry[3]))
        if progress_fn is not None:
            progress_fn(stages, t, float(jax.device_get(carry[2])))
    z, t_dev, logz, stages_dev, eps, _, _ = carry
    return SMCResult(
        particles=z, log_evidence=logz, num_stages=stages_dev,
        final_step_size=eps,
    )
