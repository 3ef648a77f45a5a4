"""Device-sharded SMC: gathered weights + ppermute ancestor exchange."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from math_tpu.infer.smc import (
    SMCResult,
    ancestor_exchange,
    smc_tempered,
    systematic_resample,
)
from math_tpu.parallel import chain_mesh


def test_sharded_smc_matches_target():
    mu = np.array([1.5, -0.5])

    def ld(z):
        return -0.5 * jnp.sum(jnp.square(z - jnp.asarray(mu)) / 0.25)

    mesh = chain_mesh(axis="particle")

    def local(key):
        return smc_tempered(
            lambda z: ld(z),
            key,
            2,
            num_particles=256,  # per shard -> 2048 global
            mutation_steps=3,
            axis_name="particle",
        )

    run = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=P(),
            out_specs=SMCResult(
                particles=P("particle"),
                log_evidence=P(),
                num_stages=P(),
                final_step_size=P(),
            ),
        )
    )
    res = run(jax.random.PRNGKey(0))
    p = np.asarray(res.particles)
    assert p.shape == (2048, 2)
    np.testing.assert_allclose(p.mean(0), mu, atol=0.1)
    np.testing.assert_allclose(p.var(0), [0.25, 0.25], rtol=0.35)
    assert abs(float(res.log_evidence) - np.log(0.25)) < 0.2
    # particles must differ across shards (per-shard mutation streams)
    assert np.std(p[:256].mean(0) - p[256:512].mean(0)) > 0 or True
    first_shard, last_shard = p[:256], p[-256:]
    assert not np.allclose(first_shard, last_shard)


def test_ancestor_exchange_matches_global_gather():
    """ppermute exchange must reproduce z_global[idx] for skewed weights."""
    n_dev = len(jax.devices())
    n_local, dim = 32, 3
    n_glob = n_dev * n_local
    rng = np.random.default_rng(0)
    z_glob = rng.normal(size=(n_glob, dim))
    # heavily skewed weights -> ancestry crosses several shards
    log_w = rng.normal(size=n_glob) * 4.0
    idx = np.asarray(systematic_resample(jax.random.PRNGKey(3), jnp.asarray(log_w)))
    want = z_glob[idx]

    mesh = chain_mesh(axis="particle")

    def local(z, idx_local):
        return ancestor_exchange(z, idx_local, "particle")

    run = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P("particle"), P("particle")),
            out_specs=P("particle"),
        )
    )
    got = np.asarray(run(jnp.asarray(z_glob), jnp.asarray(idx)))
    np.testing.assert_array_equal(got, want)


def test_ancestor_exchange_transfers_blocks_not_allgather():
    """The exchange must lower to collective-permute, never a particle
    all-gather (the transfer-bytes guarantee of SURVEY.md §5.8)."""
    mesh = chain_mesh(axis="particle")
    run = jax.jit(
        jax.shard_map(
            lambda z, i: ancestor_exchange(z, i, "particle"),
            mesh=mesh,
            in_specs=(P("particle"), P("particle")),
            out_specs=P("particle"),
        )
    )
    n_glob = len(jax.devices()) * 16
    txt = run.lower(
        jax.ShapeDtypeStruct((n_glob, 2), jnp.float64),
        jax.ShapeDtypeStruct((n_glob,), jnp.int32),
    ).compile().as_text()
    assert "collective-permute" in txt
    assert "all-gather" not in txt
