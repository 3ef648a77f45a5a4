"""BASELINE.md config 4: Lotka-Volterra ODE inverse problem, NUTS.

Baseline: CPU Stan with CVODES/RK45 sensitivity on the 20-obs LV case
study: ~10-30 ESS/s wall; use 20 ESS/s.
"""

import numpy as np

import jax
import jax.numpy as jnp

from benches.common import emit, flops_detail, min_ess_per_sec, timed
from math_tpu.infer.pooled import run_pooled_chains_chunked
from math_tpu.models import lotka_volterra


def main():
    ts, yobs, theta_true, _ = lotka_volterra.synthetic_data(20)
    model = lotka_volterra.make(ts, solver="rk4")
    # chains sweep (v5e): 16 -> 24, 64 -> 95, 128 -> 186, 256 -> 318 ESS/s.
    # 512 as ONE dispatch hits the worker's ~90 s single-dispatch kill
    # (the round-1 "program limits"); the chunked pooled runner
    # (bit-identical draws) bounds each dispatch instead.
    num_chains, warm, samp = 512, 150, 150

    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    z0 = jax.random.uniform(
        jax.random.PRNGKey(1), (num_chains, model.dim), minval=-1.5, maxval=-0.5,
        dtype=jnp.float32,
    )

    def run(k, z, yo):
        return run_pooled_chains_chunked(
            k, z, model.logp, args=(yo,),
            num_warmup=warm, num_samples=samp, max_depth=7, target_accept=0.85,
            warmup_chunk=10, sample_chunk=15,
        )

    wall, res = timed(run, keys, z0, jnp.asarray(yobs, jnp.float32))
    min_ess, eps_s = min_ess_per_sec(res.position, wall, coords=range(4))
    grads = int(np.asarray(res.n_leapfrog).sum())  # sampling window only
    # XLA cost analysis counts a scan body ONCE (verified: 100-step scan
    # of a matmul reports 1 matmul), so the ODE-solve-dominated logp needs
    # an analytic count: 20 intervals x 24 RK4 steps x (4 RHS evals ~12
    # flops + state update ~24) fwd, x ~3 for the scan VJP, + O(100)
    # lpdf terms => ~1.1e5 flops/grad/chain.  LV is latency-bound: the
    # honest utilization metric is grad-evals/s.
    fpg = 480 * (4 * 12 + 24) * 3 + 500
    tele = flops_detail(fpg * grads * (1.0 + warm / samp), wall)
    tele["flops_note"] = "analytic est.; scan-dominated logp (see source)"
    emit(
        "lotka_volterra_ode_nuts_min_bulk_ess_per_sec_1chip",
        eps_s,
        "ESS/s",
        20.0,
        {
            "wall_s": round(wall, 2),
            "chains": num_chains,
            "min_ess": round(min_ess, 1),
            "grad_evals_per_sec": round(grads / wall, 0),
            "flops_per_grad_eval": fpg,
            **tele,
            "divergence_rate": float(np.asarray(res.diverging).mean()),
        },
    )


if __name__ == "__main__":
    main()
