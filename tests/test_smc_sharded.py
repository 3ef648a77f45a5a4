"""Device-sharded SMC: global resampling via all_gather on the virtual mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from math_tpu.infer.smc import SMCResult, smc_tempered
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
