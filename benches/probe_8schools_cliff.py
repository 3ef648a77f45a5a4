"""Root-cause probe for the eight-schools chain-count cliff (r3: 512 ->
27.0k, 1024 -> 44.9k, 2048 -> 31.5k ESS/s).

Hypotheses measured per chain count C:

  H1 worst-lane tree serialization: a vmapped NUTS transition costs the
     MAX tree length over C lanes (masked lanes idle); the max order
     statistic grows with C, so per-draw wall grows faster than ESS.
     -> measure mean and max n_leapfrog per transition, and wall of a
        fixed-depth leapfrog scan (all lanes equal) as the H1-free
        control.
  H2 VPU/memory scaling: the batched leapfrog itself stops scaling
     linearly past some C (HBM or lane-packing effect).
     -> the fixed-depth control isolates this directly.

Prints one JSON line with a sweep table; run on TPU:
    python -m benches.probe_8schools_cliff
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from benches.common import _force  # also sets the compile cache
from math_tpu.infer.nuts import IntegratorState, leapfrog
from math_tpu.infer.pooled import run_pooled_chains
from math_tpu.models import eight_schools


def fixed_leapfrog_wall(model, C, n_steps=1024, dtype=jnp.float32):
    """Wall of n_steps sequential batched leapfrogs (no trees, no masking):
    the pure compute+latency cost per gradient step at chain count C."""
    logp_grad = jax.value_and_grad(model.logp)
    z = jax.random.uniform(jax.random.PRNGKey(0), (C, model.dim),
                           minval=-1.0, maxval=1.0, dtype=dtype)
    lp, g = jax.vmap(logp_grad)(z)
    s0 = IntegratorState(z, jnp.zeros_like(z), lp, g)
    eps = jnp.asarray(0.2, dtype)
    im = jnp.ones((model.dim,), dtype)

    @jax.jit
    def scan(s0):
        def step(s, _):
            s = jax.vmap(lambda st: leapfrog(logp_grad, st, eps, im))(s)
            return s, None

        s, _ = jax.lax.scan(step, s0, None, length=n_steps)
        return s

    _force(scan(s0))
    t0 = time.perf_counter()
    _force(scan(s0))
    dt = time.perf_counter() - t0
    return dt / n_steps


def nuts_run(model, C, warm=500, samp=500, max_depth=10, dtype=jnp.float32):
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    z0 = jax.random.uniform(jax.random.PRNGKey(1), (C, model.dim),
                            minval=-2.0, maxval=2.0, dtype=dtype)
    run = jax.jit(
        lambda k, z: run_pooled_chains(
            k, z, model.logp, num_warmup=warm, num_samples=samp,
            max_depth=max_depth, target_accept=0.9,
        )
    )
    _force(run(keys, z0))
    t0 = time.perf_counter()
    res = run(keys, z0)
    _force(res)
    dt = time.perf_counter() - t0

    from math_tpu.diagnostics import ess_bulk

    pos = np.nan_to_num(
        np.asarray(res.position), nan=0.0
    )  # (C, samp, dim) — small
    ess = np.array([ess_bulk(pos[:, :, i]) for i in range(model.dim)])
    nl = np.asarray(res.n_leapfrog)  # (C, samp)
    return {
        "wall_s": round(dt, 2),
        "min_ess": round(float(np.nanmin(ess)), 0),
        "ess_per_sec": round(float(np.nanmin(ess)) / dt, 0),
        "mean_leapfrogs_per_draw": round(float(nl.mean()), 1),
        # worst lane per transition, averaged over draws: the actual cost
        "mean_max_lane_leapfrogs": round(float(nl.max(axis=0).mean()), 1),
        "mean_tree_depth": round(float(np.asarray(res.tree_depth).mean()), 2),
        "step_size": round(float(res.step_size), 4),
    }


def main():
    model = eight_schools.make()
    out = {"probe": "eight_schools_chain_cliff", "sweep": {}}
    for C in (512, 1024, 2048, 4096):
        row = nuts_run(model, C)
        row["fixed_leapfrog_ms"] = round(1e3 * fixed_leapfrog_wall(model, C), 3)
        out["sweep"][str(C)] = row
        print(json.dumps({"partial": str(C), **row}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
