"""BASELINE.md config 5: GP regression, 2k points, Cholesky latent — NUTS + SMC.

Baseline: CPU Stan on a 2k-point latent GP is dominated by the O(N^3)
Cholesky per leapfrog (~0.5-1 s each on CPU): well under 1 ESS/s; use
0.5 ESS/s.
"""

import numpy as np

import jax
import jax.numpy as jnp

from benches.common import emit, min_ess_per_sec, timed
from math_tpu.infer.pooled import run_pooled_chains
from math_tpu.infer.smc import smc_tempered
from math_tpu.models import gp_regression


def main():
    n = 2000
    xg, yg = gp_regression.synthetic_data(n, dtype=np.float32)
    model = gp_regression.make(n, jitter=1e-5)
    args = (jnp.asarray(xg), jnp.asarray(yg))
    num_chains, warm, samp = 4, 100, 100

    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    z0 = jax.random.uniform(
        jax.random.PRNGKey(1), (num_chains, model.dim), minval=-0.5, maxval=0.5,
        dtype=jnp.float32,
    )
    run = jax.jit(
        lambda k, z, *a: run_pooled_chains(
            k, z, model.logp, args=a,
            num_warmup=warm, num_samples=samp, max_depth=5, target_accept=0.8,
        )
    )
    wall, res = timed(run, keys, z0, *args)
    min_ess, eps_s = min_ess_per_sec(res.position, wall, coords=range(3))

    # SMC leg: particles over the same posterior (smaller budget)
    import time

    t0 = time.perf_counter()
    sres = smc_tempered(
        model.logp, jax.random.PRNGKey(2), model.dim, args=args,
        num_particles=64, mutation_steps=2, max_depth=5, dtype=jnp.float32,
    )
    smc_wall = time.perf_counter() - t0

    emit(
        "gp_regression_2k_nuts_min_bulk_ess_per_sec_1chip",
        eps_s,
        "ESS/s",
        0.5,
        {
            "wall_s": round(wall, 2),
            "chains": num_chains,
            "min_ess": round(min_ess, 1),
            "divergence_rate": float(np.asarray(res.diverging).mean()),
            "smc_stages": int(sres.num_stages),
            "smc_wall_s": round(smc_wall, 2),
        },
    )


if __name__ == "__main__":
    main()
