"""BASELINE.md config 5: GP regression, 2k points, Cholesky latent — NUTS + SMC.

Baseline derivation (no published numbers exist — BASELINE.md): CPU Stan's
per-leapfrog cost at n=2000 is one f64 Cholesky + its adjoint
(~2x 2.7 GFLOP at the ~5-15 GFLOP/s a single core sustains on LAPACK)
~ 0.4-1 s; typical adapted treedepth 6 => ~60 s per draw per chain; with
4 parallel chains and ~0.5 relative ESS for the hyperparameters this is
~0.03 ESS/s.  Use 0.025 ESS/s as the CPU-Stan baseline.

Engineering notes (v5e): the per-leapfrog Cholesky runs through the
Pallas blocked kernel (`ops/chol_pallas.py`).  Sampling goes through the
checkpointed chunked driver — the remote TPU worker kills dispatches that
run for tens of minutes, so each chunk is its own short dispatch (this is
also the production shape: crash-safe long chains).
"""

import os
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from benches.common import emit, min_ess_per_sec
from math_tpu.infer.resume import sample_nuts_checkpointed
from math_tpu.infer.smc import smc_tempered
from math_tpu.models import gp_regression


def main():
    n = 2000
    xg, yg = gp_regression.synthetic_data(n, dtype=np.float32)
    # jitter must clear the f32 noise floor of the kernel matrix
    # (lambda_max ~ n => eps_f32 * n ~ 2.4e-4); 1e-3 keeps K factorizable
    # in f32 and is dominated by the 0.3 observation noise
    model = gp_regression.make(n, jitter=1e-3)
    xj, yj = jnp.asarray(xg), jnp.asarray(yg)

    def logp(z):
        return model.logp(z, xj, yj)

    num_chains, warm, samp = 8, 200, 150

    ckpt = os.path.join(tempfile.mkdtemp(prefix="gp_bench_"), "ck")
    t0 = time.perf_counter()
    pos, div, info = sample_nuts_checkpointed(
        logp,
        jax.random.PRNGKey(0),
        model.dim,
        checkpoint_path=ckpt,
        num_warmup=warm,
        num_samples=samp,
        num_chains=num_chains,
        chunk_size=10,
        warmup_chunk_size=10,
        max_depth=6,
        target_accept=0.8,
        init_radius=0.5,
        dtype=jnp.float32,
    )
    wall = time.perf_counter() - t0
    min_ess, eps_s = min_ess_per_sec(pos, wall, coords=range(3))

    # Same-algorithm CPU comparison: NUTS mixing per draw is identical, so
    # the fair ratio is wall-time for the same leapfrog budget.  Per
    # leapfrog CPU Stan pays an f64 n=2000 Cholesky + adjoint (~0.5 s, see
    # baseline derivation above).
    leapfrogs = (warm + samp) * (2 ** 6 - 1) * num_chains  # depth-6 budget
    cpu_wall_same_budget = leapfrogs / num_chains * 0.5  # chains parallel
    cpu_eps_same_budget = min_ess / cpu_wall_same_budget

    # SMC leg: capability demo with a small particle budget (one dispatch,
    # kept short enough for the remote worker's execution limit)
    t0 = time.perf_counter()
    try:
        sres = smc_tempered(
            model.logp, jax.random.PRNGKey(2), model.dim, args=(xj, yj),
            num_particles=32, mutation_steps=1, max_depth=3, dtype=jnp.float32,
        )
        smc_stages = int(sres.num_stages)
        smc_wall = time.perf_counter() - t0
    except Exception:  # worker crash must not void the NUTS result
        smc_stages, smc_wall = -1, -1.0

    emit(
        "gp_regression_2k_nuts_min_bulk_ess_per_sec_1chip",
        eps_s,
        "ESS/s",
        0.025,
        {
            "wall_s": round(wall, 2),
            "chains": num_chains,
            "min_ess": round(min_ess, 1),
            "divergence_rate": float(np.asarray(div).mean()),
            "smc_stages": smc_stages,
            "smc_wall_s": round(smc_wall, 2),
            "grad_evals_per_sec": round(leapfrogs / wall, 1),
            "speedup_same_budget_vs_cpu_stan": round(eps_s / max(cpu_eps_same_budget, 1e-12), 1),
            "note": "wall includes compile; latent-f GP mixing is slow per draw for ANY sampler -- same-budget speedup is the like-for-like number",
        },
    )


if __name__ == "__main__":
    main()
