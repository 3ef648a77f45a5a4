"""Runtime subsystems: checks, config, profiling spans, checkpoint/resume."""

import os
import shutil
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu import config as cfg
from math_tpu.utils import checks, profiling
from math_tpu.infer.resume import sample_nuts_checkpointed
from math_tpu.models import eight_schools


def test_is_predicates():
    assert bool(checks.is_positive(jnp.asarray([1.0, 2.0])))
    assert not bool(checks.is_positive(jnp.asarray([1.0, -2.0])))
    assert bool(checks.is_simplex(jnp.asarray([0.2, 0.3, 0.5])))
    assert not bool(checks.is_simplex(jnp.asarray([0.2, 0.3, 0.6])))
    assert bool(checks.is_ordered(jnp.asarray([1.0, 2.0, 3.0])))
    assert not bool(checks.is_ordered(jnp.asarray([1.0, 3.0, 2.0])))
    spd = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
    assert bool(checks.is_pos_definite(spd))
    assert not bool(checks.is_pos_definite(-spd))
    L = jnp.linalg.cholesky(spd)
    assert bool(checks.is_cholesky_factor(L))
    corr = jnp.asarray([[1.0, 0.3], [0.3, 1.0]])
    assert bool(checks.is_corr_matrix(corr))
    assert bool(checks.is_unit_vector(jnp.asarray([0.6, 0.8])))


def test_structural_checks_raise_at_trace_time():
    with pytest.raises(ValueError):
        checks.check_square("f", "m", jnp.zeros((2, 3)))
    with pytest.raises(ValueError):
        checks.check_size_match("f", "a", 3, "b", 4)
    with pytest.raises(ValueError):
        checks.check_consistent_sizes(
            "f", "x", np.zeros(3), "y", np.zeros(4)
        )
    # consistent broadcastable sizes pass
    checks.check_consistent_sizes("f", "x", np.zeros(3), "y", 1.0)


def test_debug_value_checks():
    # outside debug mode: no-op
    checks.check_positive("f", "x", jnp.asarray(-1.0))
    with checks.enable_debug_checks():
        with pytest.raises(Exception):
            checks.check_positive("f", "x", jnp.asarray(-1.0))
            jax.effects_barrier()


def test_config_roundtrip():
    c0 = cfg.get_config()
    c1 = cfg.update_config(max_tree_depth=8)
    assert cfg.get_config().max_tree_depth == 8
    cfg.update_config(max_tree_depth=c0.max_tree_depth)


def test_profiling_spans():
    profiling.reset_spans()
    with profiling.span("unit-test-span"):
        _ = jnp.sum(jnp.arange(10.0))
    s = profiling.span_stats()
    assert s["unit-test-span"]["count"] == 1
    assert s["unit-test-span"]["total_s"] >= 0


def test_checkpoint_resume_bit_compatible(tmp_path):
    model = eight_schools.make()
    path_a = str(tmp_path / "ckA")
    path_b = str(tmp_path / "ckB")
    common = dict(
        num_warmup=50,
        num_chains=2,
        chunk_size=40,
        max_depth=6,
    )
    key = jax.random.PRNGKey(0)

    # straight run to 120 draws
    pos_a, div_a, _ = sample_nuts_checkpointed(
        model.logp, key, model.dim, checkpoint_path=path_a, num_samples=120, **common
    )
    # interrupted run: first 40, then resume to 120
    pos_b1, _, _ = sample_nuts_checkpointed(
        model.logp, key, model.dim, checkpoint_path=path_b, num_samples=40, **common
    )
    pos_b, div_b, info = sample_nuts_checkpointed(
        model.logp, key, model.dim, checkpoint_path=path_b, num_samples=120, **common
    )
    assert pos_a.shape == (2, 120, model.dim)
    np.testing.assert_array_equal(pos_a, pos_b)
    assert info["resumed"]


def test_segmented_warmup_bit_compatible(tmp_path):
    """warmup_chunk_size splits warmup into multiple dispatches but must
    reproduce the monolithic warmup draw stream exactly."""
    from math_tpu.models import eight_schools

    model = eight_schools.make()
    key = jax.random.PRNGKey(3)
    common = dict(
        num_warmup=50, num_samples=30, num_chains=2, chunk_size=30, max_depth=6
    )
    pos_a, _, _ = sample_nuts_checkpointed(
        model.logp, key, model.dim, checkpoint_path=str(tmp_path / "m"), **common
    )
    pos_b, _, _ = sample_nuts_checkpointed(
        model.logp, key, model.dim, checkpoint_path=str(tmp_path / "s"),
        warmup_chunk_size=20, **common
    )
    np.testing.assert_array_equal(pos_a, pos_b)
