"""Auto-sized NUTS tree-depth cap (adapt.choose_depth_cap + driver wiring).

The transition's cost scales with the PROGRAM's max_depth (checkpoint
stacks + worst-lane budget under vmap), not the adapted depth — r4
measured 4.8x on eight-schools (BENCHMARKS.md).  These tests pin the
sizing rule, the saturation warning, and the driver integrations.
"""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu.infer import adapt
from math_tpu.infer.sample import sample_nuts


def test_choose_depth_cap_rule():
    # adapted mean 3.0, no tail -> cap = max(round(3+2), 4) = 5
    assert adapt.choose_depth_cap(np.full(1000, 3), 10) == 5
    # heavy tail: mean 3.15 with 3% at depth 8 -> 3% <= sat_tol (5%), so
    # the cheap cap 5 wins (under vmap EVERY transition pays the worst
    # lane's budget, so cap 8 costs ~8x for the 3% tail; r5 measured a
    # 7.4%-hit cap running SLOWER than the next cap up); a hit rate
    # above sat_tol pushes the tail term past the lump instead
    d = np.r_[np.full(970, 3), np.full(30, 8)]
    assert adapt.choose_depth_cap(d, 10) == 5
    assert adapt.choose_depth_cap(d, 10, sat_tol=0.02) == 9
    # 8% lump at depth 5: P(d>=5)=0.08 > sat_tol -> cap must clear it
    d2 = np.r_[np.full(920, 3), np.full(80, 5)]
    assert adapt.choose_depth_cap(d2, 10) == 6
    # saturated probe keeps the user ceiling
    assert adapt.choose_depth_cap(np.full(100, 10), 10) == 10
    # never exceeds the ceiling, never below 2
    assert adapt.choose_depth_cap(np.full(100, 9), 6) == 6
    assert adapt.choose_depth_cap(np.zeros(100), 10) == 2
    # empty/degenerate input: keep the ceiling
    assert adapt.choose_depth_cap(np.zeros((0,)), 7) == 7


def test_saturation_warning_fires_and_reports():
    with pytest.warns(UserWarning, match="tree-depth cap"):
        rate = adapt.warn_on_treedepth_saturation(np.full(100, 4), 4)
    assert rate == 1.0
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rate = adapt.warn_on_treedepth_saturation(np.full(100, 2), 4)
    assert rate == 0.0


def _corr_normal_logp(z):
    # mildly correlated 4-dim normal; adapted tree depth ~2-3
    prec_chol = jnp.array(
        [[1.0, 0.0, 0.0, 0.0],
         [0.5, 1.0, 0.0, 0.0],
         [0.0, 0.5, 1.0, 0.0],
         [0.0, 0.0, 0.5, 1.0]]
    )
    v = prec_chol.T @ z
    return -0.5 * jnp.sum(v * v)


def test_sample_nuts_auto_depth_shrinks_cap_and_recovers_posterior():
    res = sample_nuts(
        _corr_normal_logp, jax.random.PRNGKey(0), 4,
        num_warmup=300, num_samples=400, num_chains=16, max_depth=10,
        auto_depth=True,
    )
    assert res.max_depth < 10  # an easy posterior must shrink the cap
    assert res.max_depth >= 2
    pos = np.asarray(res.position).reshape(-1, 4)
    assert np.abs(pos.mean(0)).max() < 0.15
    # marginal variances of N(0, (C C^T)^-1)
    prec_chol = np.array(
        [[1.0, 0.0, 0.0, 0.0], [0.5, 1.0, 0.0, 0.0],
         [0.0, 0.5, 1.0, 0.0], [0.0, 0.0, 0.5, 1.0]]
    )
    cov = np.linalg.inv(prec_chol @ prec_chol.T)
    assert np.allclose(pos.var(0), np.diag(cov), rtol=0.25)


def test_sample_nuts_low_ceiling_warns_on_saturation():
    # 16-dim standard normal needs depth ~3; ceiling 2 truncates and the
    # auto path must warn about it
    def logp(z):
        return -0.5 * jnp.sum(z * z) - 0.5 * jnp.sum((z[:8] - z[8:]) ** 2)

    with pytest.warns(UserWarning, match="truncated"):
        sample_nuts(
            logp, jax.random.PRNGKey(0), 16,
            num_warmup=150, num_samples=150, num_chains=8, max_depth=2,
            auto_depth=True,
        )


def test_pooled_chunked_auto_depth():
    from math_tpu.infer.pooled import run_pooled_chains_chunked
    from math_tpu.models import eight_schools

    model = eight_schools.make()
    key = jax.random.PRNGKey(3)
    key, k0 = jax.random.split(key)
    z0 = jax.random.uniform(k0, (32, model.dim), minval=-2, maxval=2,
                            dtype=jnp.float64)
    keys = jax.random.split(key, 32)
    res = run_pooled_chains_chunked(
        keys, z0, model.logp, num_warmup=300, num_samples=300,
        max_depth=10, auto_depth=True, warmup_chunk=80, sample_chunk=150,
    )
    assert 2 <= res.max_depth < 10
    cons = model.transform_draws(res.position)
    mu = float(np.mean(np.asarray(cons["mu"])))
    assert abs(mu - 4.4) < 1.5
    # sampling-phase saturation at the chosen cap stays moderate
    sat = adapt.treedepth_saturation(np.asarray(res.tree_depth), res.max_depth)
    assert sat < 0.2


def test_pooled_chunked_auto_depth_on_mesh():
    """Auto cap + mesh: the probe histogram pools across devices and the
    re-staged segments stay shard_map-ped."""
    from math_tpu.infer.pooled import run_pooled_chains_chunked
    from math_tpu.models import eight_schools
    from math_tpu.parallel import chain_mesh

    model = eight_schools.make()
    key = jax.random.PRNGKey(5)
    key, k0 = jax.random.split(key)
    z0 = jax.random.uniform(k0, (16, model.dim), minval=-2, maxval=2,
                            dtype=jnp.float64)
    keys = jax.random.split(key, 16)
    res = run_pooled_chains_chunked(
        keys, z0, model.logp, num_warmup=200, num_samples=200,
        max_depth=10, auto_depth=True, warmup_chunk=60, sample_chunk=100,
        mesh=chain_mesh(),
    )
    assert 2 <= res.max_depth < 10
    assert res.position.shape[0] == 16
    cons = model.transform_draws(res.position)
    assert abs(float(np.mean(np.asarray(cons["mu"]))) - 4.4) < 2.0


def test_checkpointed_auto_depth(tmp_path):
    from math_tpu.infer.resume import sample_nuts_checkpointed
    from math_tpu.models import eight_schools

    model = eight_schools.make()
    pos, div, info = sample_nuts_checkpointed(
        model.logp, jax.random.PRNGKey(0), model.dim,
        checkpoint_path=str(tmp_path / "ck"),
        num_warmup=200, num_samples=200, num_chains=8,
        chunk_size=100, warmup_chunk_size=60,
        max_depth=10, auto_depth=True,
    )
    assert 2 <= info["max_depth_used"] < 10
    assert 0.0 <= info["treedepth_hit_rate"] < 0.2
    cons = model.transform_draws(pos)
    assert abs(float(np.mean(np.asarray(cons["mu"]))) - 4.4) < 2.0
