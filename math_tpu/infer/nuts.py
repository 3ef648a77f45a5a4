"""NUTS with multinomial tree doubling, formulated for SIMD/TPU execution.

The reference (Stan Math) contains no samplers — NUTS lives downstream in
stan-dev/stan — but BASELINE.json extends our scope to include it.  This is
the standard iterative/accelerator formulation of multinomial NUTS
(Hoffman & Gelman 2011; Betancourt's multinomial variant as in Stan;
iterative U-turn checkpointing as popularized by NumPyro's iterative NUTS):

- tree doubling via ``lax.while_loop`` up to ``max_depth``
- each subtree built leaf-by-leaf with a ``while_loop`` (early exit on
  turning/divergence) instead of recursion
- sub-U-turn checks via a checkpoint stack indexed by the bit pattern of
  the leaf index (store at even leaves, check at odd leaves)
- biased-progressive sampling across doublings, multinomial within subtrees

Everything is pure and ``vmap``-able over chains; divergent tree depths
across vmapped chains just mask out finished lanes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class IntegratorState(NamedTuple):
    z: jnp.ndarray
    r: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


class Tree(NamedTuple):
    z_left: jnp.ndarray
    r_left: jnp.ndarray
    grad_left: jnp.ndarray
    logp_left: jnp.ndarray
    z_right: jnp.ndarray
    r_right: jnp.ndarray
    grad_right: jnp.ndarray
    logp_right: jnp.ndarray
    z_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    energy_prop: jnp.ndarray
    log_sum_w: jnp.ndarray
    rho: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray
    depth: jnp.ndarray


class NutsStats(NamedTuple):
    accept_prob: jnp.ndarray
    step_size: jnp.ndarray
    tree_depth: jnp.ndarray
    n_leapfrog: jnp.ndarray
    diverging: jnp.ndarray
    energy: jnp.ndarray


def _vary_like(x, ref):
    """Align x's varying-manual-axes with ref's (no-op outside shard_map).

    while_loop carries must have matching vma types on input and output;
    constants folded into initial carries start "unvarying" and would
    otherwise clash once the body mixes in sharded state.
    """
    ref_vma = getattr(jax.typeof(ref), "vma", frozenset())

    def one(v):
        v = jnp.asarray(v)
        missing = ref_vma - getattr(jax.typeof(v), "vma", frozenset())
        if missing:
            v = jax.lax.pcast(v, tuple(missing), to="varying")
        return v

    return jax.tree.map(one, x)


def velocity(inv_mass, r):
    """M^-1 r; ``inv_mass`` is (D,) diagonal or (D, D) dense (Stan's
    diag_e / dense_e metrics)."""
    if inv_mass.ndim == 2:
        return inv_mass @ r
    return inv_mass * r


def kinetic_energy(inv_mass, r):
    if inv_mass.ndim == 2:
        return 0.5 * jnp.dot(r, inv_mass @ r)
    return 0.5 * jnp.sum(inv_mass * jnp.square(r), axis=-1)


def sample_momentum(key, inv_mass, dim, dtype):
    """r ~ N(0, M) with M = inv_mass^-1: diag -> z/sqrt(im); dense ->
    L^-T z with L = chol(inv_mass) (so cov(r) = L^-T L^-1 = M)."""
    z = jax.random.normal(key, (dim,), dtype)
    if inv_mass.ndim == 2:
        L = jnp.linalg.cholesky(inv_mass)
        return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
    return z / jnp.sqrt(inv_mass)


def leapfrog(logp_grad_fn: Callable, state: IntegratorState, eps, inv_mass):
    """One velocity-Verlet step (ref: the integrator inside downstream Stan;
    the gradient call is the analog of SURVEY §3.1's reverse sweep)."""
    r_half = state.r + 0.5 * eps * state.grad
    z_new = state.z + eps * velocity(inv_mass, r_half)
    logp, grad = logp_grad_fn(z_new)
    r_new = r_half + 0.5 * eps * grad
    return IntegratorState(z_new, r_new, logp, grad)


def _is_turning(inv_mass, r_left, r_right, rho):
    """Generalized-NUTS termination criterion (Stan's compute_criterion)."""
    v_left = velocity(inv_mass, r_left)
    v_right = velocity(inv_mass, r_right)
    return (jnp.dot(v_left, rho) <= 0) | (jnp.dot(v_right, rho) <= 0)


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _leaf_ckpt_idx(leaf):
    """Checkpoint bookkeeping for iterative sub-U-turn checks.

    For leaf index l (0-based within the subtree): store at
    ``idx_max = popcount(l >> 1)`` when l is even; when l is odd, check the
    spans ending at l, whose checkpoints live at idx_min..idx_max with
    ``idx_min = idx_max - trailing_ones(l) + 1``.
    """
    idx_max = _popcount(leaf >> 1)
    trailing_ones = _popcount(leaf ^ (leaf + 1)) - 1
    idx_min = idx_max - trailing_ones + 1
    return idx_min, idx_max


def _iterative_turning(inv_mass, r_new, rho_cum, r_ckpts, rho_ckpts, idx_min, idx_max):
    """Check U-turn of every subtree span ending at the current (odd) leaf.

    All ``max_depth`` checkpoint slots are checked in one masked vectorized
    pass: under ``vmap`` over chains a data-dependent while_loop serializes
    every lane to the worst case, while this is a handful of (K, D) x (D,)
    contractions on the VPU.
    """
    k = r_ckpts.shape[0]
    slots = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]
    mask = (slots >= idx_min) & (slots <= idx_max)
    rho_span = rho_cum[None, :] - rho_ckpts + r_ckpts  # (K, D)
    turn_left = jnp.sum(velocity_batch(inv_mass, r_ckpts) * rho_span, axis=-1) <= 0
    turn_right = (jnp.sum(velocity(inv_mass, r_new) * rho_span, axis=-1)) <= 0
    return jnp.any(mask & (turn_left | turn_right))


def velocity_batch(inv_mass, r):
    """M^-1 r for a batch of momenta (K, D)."""
    if inv_mass.ndim == 2:
        return r @ inv_mass.T
    return r * inv_mass[None, :]


def _build_subtree(
    key,
    logp_grad_fn,
    edge: IntegratorState,
    direction,
    depth,
    eps,
    inv_mass,
    energy0,
    max_depth: int,
    max_delta_energy: float,
):
    """Build a balanced subtree of 2^depth leaves from ``edge`` going in
    ``direction``, iteratively, with early exit on turning/divergence."""
    dim = edge.z.shape[-1]
    dt = edge.z.dtype
    num_leaves = jnp.asarray(1, jnp.int32) << depth
    signed_eps = direction * eps

    r_ckpts = jnp.zeros((max_depth, dim), dt)
    rho_ckpts = jnp.zeros((max_depth, dim), dt)

    neg_inf = jnp.asarray(-jnp.inf, dt)
    init_tree = Tree(
        z_left=edge.z,
        r_left=edge.r,
        grad_left=edge.grad,
        logp_left=edge.logp,
        z_right=edge.z,
        r_right=edge.r,
        grad_right=edge.grad,
        logp_right=edge.logp,
        z_prop=edge.z,
        logp_prop=edge.logp,
        grad_prop=edge.grad,
        energy_prop=energy0,
        log_sum_w=neg_inf,
        rho=jnp.zeros((dim,), dt),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        sum_accept=jnp.zeros((), dt),
        n_leaves=jnp.zeros((), jnp.int32),
        depth=depth,
    )

    def body(carry):
        tree, state, r_ckpts, rho_ckpts, key = carry
        leaf = tree.n_leaves
        state = leapfrog(logp_grad_fn, state, signed_eps, inv_mass)
        energy = -state.logp + kinetic_energy(inv_mass, state.r)
        energy = jnp.where(jnp.isnan(energy), jnp.inf, energy)
        delta = energy - energy0
        diverging = delta > max_delta_energy
        log_w = -delta
        accept_prob = jnp.minimum(1.0, jnp.exp(-delta))

        # progressive multinomial proposal within the subtree
        new_lsw = jnp.logaddexp(tree.log_sum_w, log_w)
        key, sub = jax.random.split(key)
        take = jnp.log(jax.random.uniform(sub, dtype=dt)) < (log_w - new_lsw)
        z_prop = jnp.where(take, state.z, tree.z_prop)
        logp_prop = jnp.where(take, state.logp, tree.logp_prop)
        grad_prop = jnp.where(take, state.grad, tree.grad_prop)
        energy_prop = jnp.where(take, energy, tree.energy_prop)

        rho = tree.rho + state.r

        # checkpoint store (even leaves) / check (odd leaves)
        idx_min, idx_max = _leaf_ckpt_idx(leaf)
        is_even = (leaf % 2) == 0
        r_ckpts = jnp.where(
            is_even, r_ckpts.at[idx_max].set(state.r), r_ckpts
        )
        rho_ckpts = jnp.where(
            is_even, rho_ckpts.at[idx_max].set(rho), rho_ckpts
        )
        turning = jnp.where(
            is_even,
            False,
            _iterative_turning(
                inv_mass, state.r, rho, r_ckpts, rho_ckpts, idx_min, idx_max
            ),
        )
        # a 1-leaf "span" cannot u-turn; guard depth==0 trees
        turning = turning & (depth > 0)

        new_tree = Tree(
            z_left=jnp.where(leaf == 0, state.z, tree.z_left),
            r_left=jnp.where(leaf == 0, state.r, tree.r_left),
            grad_left=jnp.where(leaf == 0, state.grad, tree.grad_left),
            logp_left=jnp.where(leaf == 0, state.logp, tree.logp_left),
            z_right=state.z,
            r_right=state.r,
            grad_right=state.grad,
            logp_right=state.logp,
            z_prop=z_prop,
            logp_prop=logp_prop,
            grad_prop=grad_prop,
            energy_prop=energy_prop,
            log_sum_w=new_lsw,
            rho=rho,
            turning=turning,
            diverging=diverging,
            sum_accept=tree.sum_accept + accept_prob,
            n_leaves=leaf + 1,
            depth=depth,
        )
        return new_tree, state, r_ckpts, rho_ckpts, key

    def cond(carry):
        tree, *_ = carry
        return (tree.n_leaves < num_leaves) & ~tree.turning & ~tree.diverging

    init = _vary_like((init_tree, edge, r_ckpts, rho_ckpts, key), edge.z)
    tree, state, _, _, _ = jax.lax.while_loop(cond, body, init)
    return tree


def nuts_kernel(
    key,
    state: IntegratorState,
    logp_grad_fn: Callable,
    eps,
    inv_mass,
    max_depth: int = 10,
    max_delta_energy: float = 1000.0,
):
    """One NUTS transition.  Returns (new IntegratorState, NutsStats)."""
    dim = state.z.shape[-1]
    dt = state.z.dtype
    key_mom, key_loop = jax.random.split(key)

    r0 = sample_momentum(key_mom, inv_mass, dim, dt)
    start = IntegratorState(state.z, r0, state.logp, state.grad)
    energy0 = -start.logp + kinetic_energy(inv_mass, r0)

    tree0 = Tree(
        z_left=start.z,
        r_left=r0,
        grad_left=start.grad,
        logp_left=start.logp,
        z_right=start.z,
        r_right=r0,
        grad_right=start.grad,
        logp_right=start.logp,
        z_prop=start.z,
        logp_prop=start.logp,
        grad_prop=start.grad,
        energy_prop=energy0,
        log_sum_w=jnp.zeros((), dt),
        rho=r0,
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        sum_accept=jnp.zeros((), dt),
        n_leaves=jnp.zeros((), jnp.int32),
        depth=jnp.zeros((), jnp.int32),
    )

    def body(carry):
        tree, key, depth = carry
        key, key_dir, key_sub, key_sel = jax.random.split(key, 4)
        direction = jnp.where(
            jax.random.bernoulli(key_dir), jnp.asarray(1.0, dt), jnp.asarray(-1.0, dt)
        )
        edge = IntegratorState(
            jnp.where(direction > 0, tree.z_right, tree.z_left),
            jnp.where(direction > 0, tree.r_right, tree.r_left),
            jnp.where(direction > 0, tree.logp_right, tree.logp_left),
            jnp.where(direction > 0, tree.grad_right, tree.grad_left),
        )
        edge = IntegratorState(edge.z, edge.r, edge.logp, edge.grad)
        sub = _build_subtree(
            key_sub,
            logp_grad_fn,
            edge,
            direction,
            depth,
            eps,
            inv_mass,
            energy0,
            max_depth,
            max_delta_energy,
        )
        sub_invalid = sub.turning | sub.diverging

        # biased progressive sampling across the doubling
        take_new = (
            jnp.log(jax.random.uniform(key_sel, dtype=dt))
            < (sub.log_sum_w - tree.log_sum_w)
        ) & ~sub_invalid

        new_left = direction < 0
        keep = sub_invalid  # invalid subtree: tree state frozen, stats counted
        merged = Tree(
            z_left=jnp.where(keep | ~new_left, tree.z_left, sub.z_right),
            r_left=jnp.where(keep | ~new_left, tree.r_left, sub.r_right),
            grad_left=jnp.where(keep | ~new_left, tree.grad_left, sub.grad_right),
            logp_left=jnp.where(keep | ~new_left, tree.logp_left, sub.logp_right),
            z_right=jnp.where(keep | new_left, tree.z_right, sub.z_right),
            r_right=jnp.where(keep | new_left, tree.r_right, sub.r_right),
            grad_right=jnp.where(keep | new_left, tree.grad_right, sub.grad_right),
            logp_right=jnp.where(keep | new_left, tree.logp_right, sub.logp_right),
            z_prop=jnp.where(take_new, sub.z_prop, tree.z_prop),
            logp_prop=jnp.where(take_new, sub.logp_prop, tree.logp_prop),
            grad_prop=jnp.where(take_new, sub.grad_prop, tree.grad_prop),
            energy_prop=jnp.where(take_new, sub.energy_prop, tree.energy_prop),
            log_sum_w=jnp.where(
                keep, tree.log_sum_w, jnp.logaddexp(tree.log_sum_w, sub.log_sum_w)
            ),
            rho=jnp.where(keep, tree.rho, tree.rho + sub.rho),
            turning=tree.turning,
            diverging=tree.diverging | sub.diverging,
            sum_accept=tree.sum_accept + sub.sum_accept,
            n_leaves=tree.n_leaves + sub.n_leaves,
            depth=depth + 1,
        )
        full_turning = _is_turning(
            inv_mass, merged.r_left, merged.r_right, merged.rho
        )
        merged = merged._replace(turning=sub_invalid | full_turning)
        return merged, key, depth + 1

    def cond(carry):
        tree, key, depth = carry
        return (depth < max_depth) & ~tree.turning & ~tree.diverging

    init = _vary_like((tree0, key_loop, jnp.asarray(0, jnp.int32)), state.z)
    tree, _, _ = jax.lax.while_loop(cond, body, init)

    new_state = IntegratorState(tree.z_prop, r0, tree.logp_prop, tree.grad_prop)
    n = jnp.maximum(tree.n_leaves, 1)
    stats = NutsStats(
        accept_prob=tree.sum_accept / n.astype(dt),
        step_size=eps,
        tree_depth=tree.depth,
        n_leapfrog=tree.n_leaves,
        diverging=tree.diverging,
        energy=tree.energy_prop,
    )
    return new_state, stats
