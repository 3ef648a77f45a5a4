"""Fault injection: error paths of map_rect, sharded log densities, the
samplers' init guard, and checkpoint corruption.

Reference analog: ``test/unit/math/prim/mat/functor/faulty_functor.hpp`` —
a deliberately-throwing functor run through map_rect/MPI to prove failures
propagate rather than corrupt results.  XLA cannot throw mid-program, so
the contract here is: (a) anything catchable on the host (bad init, bad
checkpoint, mismatched shards) raises BEFORE dispatch; (b) on-device
faults poison only their own lanes (nan) and propagate to reductions,
never silently produce plausible numbers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from math_tpu.functional import map_rect
from math_tpu.infer.resume import sample_nuts_checkpointed
from math_tpu.infer.sample import check_init_logdensity, sample_nuts
from math_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from math_tpu.parallel import chain_mesh
from math_tpu.parallel.mesh import sharded_data_logdensity


# --- init guard (a nan/-inf init logp can crash the TPU worker) -------------


def _banded_logp(z):
    """-inf outside |z_i| < 1: initializations at radius 2 start off-support."""
    inside = jnp.all(jnp.abs(z) < 1.0)
    return jnp.where(inside, -0.5 * jnp.sum(jnp.square(z)), -jnp.inf)


def test_init_guard_raises_before_dispatch():
    # user-SUPPLIED inits never retry: a bad explicit init must hard-fail
    with pytest.raises(ValueError, match="non-finite initial log density"):
        sample_nuts(
            lambda z: _banded_logp(z),
            jax.random.PRNGKey(0),
            4,
            num_warmup=10,
            num_samples=10,
            init=jnp.full((4, 4), 1.5),  # all chains off-support
        )


def test_init_guard_retries_banded_support():
    """Auto-generated inits re-draw failing chains (Stan util::initialize
    retries up to 100 times) — a bounded-support model with the default
    init radius must sample, not hard-fail."""
    res = sample_nuts(
        _banded_logp,
        jax.random.PRNGKey(0),
        4,
        num_warmup=20,
        num_samples=10,
        num_chains=4,
        init_radius=2.0,  # most draws start off-support; retries land inside
        max_depth=5,
    )
    assert np.isfinite(np.asarray(res.position)).all()


def test_init_guard_retry_exhaustion_raises():
    # a logp that is -inf everywhere exhausts the retries and raises
    with pytest.raises(ValueError, match="non-finite initial log density"):
        sample_nuts(
            lambda z: jnp.full((), -jnp.inf) + 0.0 * jnp.sum(z),
            jax.random.PRNGKey(0),
            2,
            num_warmup=10,
            num_samples=10,
            num_chains=2,
        )


def test_init_guard_accepts_valid_init():
    res = sample_nuts(
        lambda z: -0.5 * jnp.sum(jnp.square(z)),
        jax.random.PRNGKey(0),
        2,
        num_warmup=20,
        num_samples=10,
        num_chains=2,
        max_depth=5,
    )
    assert np.isfinite(np.asarray(res.position)).all()


def test_init_guard_catches_nan_gradient():
    # logp is finite at the init but its gradient is nan (0 * inf from a
    # hand-rolled non-smooth term) — the guard must catch it
    def lp(z):
        return jnp.sum(jnp.sqrt(jnp.abs(z)) * 0.0) - 0.5 * jnp.sum(
            jnp.square(z)
        )

    with pytest.raises(ValueError, match="non-finite initial log density"):
        check_init_logdensity(lp, jnp.zeros((2, 3)))


def test_checkpointed_driver_init_guard(tmp_path):
    # everywhere--inf logp: retries exhaust and the driver raises pre-dispatch
    with pytest.raises(ValueError, match="non-finite initial log density"):
        sample_nuts_checkpointed(
            lambda z: jnp.full((), -jnp.inf) + 0.0 * jnp.sum(z),
            jax.random.PRNGKey(0),
            4,
            checkpoint_path=str(tmp_path / "ck"),
            num_warmup=10,
            num_samples=10,
            num_chains=4,
            init_radius=2.0,
        )


# --- map_rect fault containment ---------------------------------------------


def test_map_rect_nan_job_is_localized():
    """A faulty job poisons its own outputs only (≙ faulty_functor's throw
    propagating for the failing job, map_rect_mpi_test.cpp:10-17)."""

    def f(shared, job, x_r, x_i):
        fault = x_i[0] == 1
        base = shared[0] * job + x_r
        return jnp.where(fault, jnp.nan, base)

    shared = jnp.array([2.0])
    jobs = jnp.arange(4.0).reshape(4, 1)
    x_r = jnp.ones((4, 1))
    x_i = jnp.array([[0], [0], [1], [0]])
    out = np.asarray(map_rect(f, shared, jobs, x_r, x_i))
    assert out.shape == (4,)
    assert np.isnan(out[2])
    np.testing.assert_allclose(out[[0, 1, 3]], [1.0, 3.0, 7.0])


def test_map_rect_nan_propagates_to_reduction_and_grad():
    def f(shared, job, x_r, x_i):
        fault = x_i[0] == 1
        base = shared[0] * job
        # the faulty branch depends on shared, so the fault reaches the VJP
        return jnp.where(fault, jnp.sqrt(-base - 1.0), base)

    jobs = jnp.arange(4.0).reshape(4, 1)
    x_i = jnp.array([[0], [1], [0], [0]])

    def total(s):
        return jnp.sum(map_rect(f, s, jobs, None, x_i))

    v, g = jax.value_and_grad(total)(jnp.array([2.0]))
    assert np.isnan(float(v))
    assert np.isnan(np.asarray(g)).all()


# --- sharded data log density -----------------------------------------------


def test_sharded_nan_shard_propagates():
    """One bad shard must poison the global psum (the MPI-gather rethrow
    analog), not disappear into a finite total."""
    mesh = chain_mesh(axis="obs")
    n_dev = len(jax.devices())
    y = np.ones(8 * n_dev)
    y[3] = np.inf  # marker lands in shard 0

    def term(theta, shard):
        return jnp.sum(-0.5 * jnp.square(shard - theta))

    lp, _ = sharded_data_logdensity(term, jnp.asarray(y), mesh)
    assert not np.isfinite(float(lp(jnp.zeros(()))))


def test_sharded_mismatched_shards_raise():
    mesh = chain_mesh(axis="obs")
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs >1 device")
    y = np.ones(8 * n_dev + 1)  # not divisible by mesh size

    def term(theta, shard):
        return jnp.sum(shard) * theta

    with pytest.raises(Exception):
        lp, _ = sharded_data_logdensity(term, jnp.asarray(y), mesh)
        float(lp(jnp.ones(())))


# --- checkpoint corruption ----------------------------------------------------


def _quad_logp(z):
    return -0.5 * jnp.sum(jnp.square(z))


def test_truncated_checkpoint_raises(tmp_path):
    path = str(tmp_path / "ck")
    common = dict(
        num_warmup=20, num_chains=2, chunk_size=20, max_depth=5
    )
    sample_nuts_checkpointed(
        _quad_logp, jax.random.PRNGKey(0), 3, checkpoint_path=path,
        num_samples=20, **common
    )
    # corrupt: drop a required key
    ck = load_checkpoint(path)
    ck.pop("draws")
    save_checkpoint(path, ck)
    with pytest.raises(ValueError, match="incomplete"):
        sample_nuts_checkpointed(
            _quad_logp, jax.random.PRNGKey(0), 3, checkpoint_path=path,
            num_samples=40, **common
        )


def test_inconsistent_checkpoint_counter_raises(tmp_path):
    path = str(tmp_path / "ck")
    common = dict(num_warmup=20, num_chains=2, chunk_size=20, max_depth=5)
    sample_nuts_checkpointed(
        _quad_logp, jax.random.PRNGKey(0), 3, checkpoint_path=path,
        num_samples=20, **common
    )
    ck = load_checkpoint(path)
    ck["done"] = np.asarray(7)  # draws hold 20
    save_checkpoint(path, ck)
    with pytest.raises(ValueError, match="corrupt"):
        sample_nuts_checkpointed(
            _quad_logp, jax.random.PRNGKey(0), 3, checkpoint_path=path,
            num_samples=40, **common
        )
