"""BASELINE.md config 3: radon hierarchical, NUTS + ADVI.

Baseline: CPU Stan radon varying-intercept/slope, ~500-1000 ESS/s wall on
the ~900-obs dataset; use 750 ESS/s.
"""

import numpy as np

import jax
import jax.numpy as jnp

from benches.common import (
    emit,
    flops_detail,
    leapfrog_flops,
    min_ess_per_sec,
    timed,
)
from math_tpu.infer.advi import advi
from math_tpu.infer.pooled import run_pooled_chains_chunked
from math_tpu.models import radon


def main():
    county, x, y = radon.synthetic_data(85, 919, dtype=np.float32)
    model = radon.make(85)
    args = (jnp.asarray(county), jnp.asarray(x), jnp.asarray(y))
    # config sweep (v5e, r3): 256ch/d8 2992 -> 1024ch 30.5k -> 2048ch 31.3k
    # -> 2048ch/warm300 34.9k ESS/s (pooled warmup converges well before 300;
    # posterior parity held at mu_a=1.439+-0.050 across all configs).
    # Env-overridable (clamped >= 1) so a time-boxed run can shrink legs;
    # ESS/s stays honest at any size.
    import os

    def _env(name, default):
        return max(1, int(os.environ.get(name, default)))

    num_chains = _env("RADON_CHAINS", 2048)
    warm = _env("RADON_WARM", 300)
    samp = _env("RADON_SAMP", 500)
    advi_steps = _env("RADON_ADVI_STEPS", 10000)  # cap; Stan tol rule stops earlier

    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    z0 = jax.random.uniform(
        jax.random.PRNGKey(1), (num_chains, model.dim), minval=-1.0, maxval=1.0,
        dtype=jnp.float32,
    )
    # AUTO depth cap (r5; was hand-set 6 in r4): radon's adapted mean tree
    # depth is 4.0, so choose_depth_cap lands at 6 — never saturates (hit
    # rate ~0) and trims program-size bookkeeping vs 8 (36.7k vs 34.9k
    # ESS/s at the r4 sweep), while 5 truncates real trajectories
    # (min-ESS collapses 138k -> 49k).  The chunked pooled driver probes
    # the first 100 warmup steps at ceiling 10 and sizes the cap itself
    # (artifacts/radon_depthcap_r4.jsonl for the underlying sweep).
    def run(k, z, *a):
        return run_pooled_chains_chunked(
            k, z, model.logp, args=a,
            num_warmup=warm, num_samples=samp, max_depth=10,
            auto_depth=True, target_accept=0.85,
            warmup_chunk=100, sample_chunk=samp,
        )

    wall, res = timed(run, keys, z0, *args)
    cap = int(res.max_depth)
    min_ess, eps_s = min_ess_per_sec(res.position, wall, coords=range(5))
    grads = int(np.asarray(res.n_leapfrog).sum())  # sampling window only
    fpg = leapfrog_flops(
        lambda z: jax.vmap(
            jax.value_and_grad(lambda q: model.logp(q, *args))
        )(z),
        z0,
    )
    tele = (
        flops_detail(fpg * grads * (1.0 + warm / samp), wall) if fpg else {}
    )

    # ADVI legs (same model), meanfield AND fullrank: throughput plus
    # posterior accuracy vs the NUTS leg on the monitored coords — mean
    # error in NUTS-sd units (z-score) and sd ratio.  BASELINE.md config 3
    # claims "reference-matching posteriors"; this is where it is checked.
    import time

    mon = 5
    nuts_draws = np.asarray(
        res.position[..., :mon].reshape(-1, mon)
    )  # sliced on device; host pull is tiny
    nuts_mean, nuts_sd = nuts_draws.mean(0), nuts_draws.std(0)

    advi_detail = {}
    for method in ("meanfield", "fullrank"):
        t0 = time.perf_counter()
        # Stan protocol (r5): eta adaptation over the candidate ladder,
        # k^{-1/2} windowed-adagrad schedule, relative-ELBO-change
        # termination (tol_rel_obj 0.01) — ``advi_steps`` is the CAP.
        # r4's 8x-overdispersed coord-5 was under-convergence under the
        # old fixed-step adam loop: converged runs give sd-ratios
        # 0.93/0.99 on log_sigma_y (artifacts/radon_advi_converged_r5).
        ares = advi(
            model.logp, jax.random.PRNGKey(2), model.dim, args=args,
            method=method, num_steps=advi_steps,
            dtype=jnp.float32,
        )
        advi_wall = time.perf_counter() - t0
        mu = np.asarray(ares.mu)[:mon]
        if method == "meanfield":
            sd = np.exp(np.asarray(ares.omega))[:mon]
        else:
            L = np.asarray(ares.L)
            sd = np.sqrt(np.diag(L @ L.T))[:mon]
        advi_detail[f"advi_{method}"] = {
            "steps_per_sec": round(ares.num_steps_run / advi_wall, 0),
            "converged": bool(ares.converged),
            "steps_run": int(ares.num_steps_run),
            "final_elbo": round(float(ares.final_elbo), 2),
            # per monitored coord (mu_a, mu_b, log_sigma_a, log_sigma_b,
            # log_sigma_y): |mean_ADVI - mean_NUTS| / sd_NUTS and the sd
            # ratio.  Converged meanfield shows the textbook pattern —
            # tight locations, sd-ratios <= 1 (underdispersion) — except
            # on the weakly identified log_sigma_b; fullrank matches all
            # five coords (max z ~0.1).
            "mean_z_by_coord": [
                round(float(v), 3) for v in np.abs((mu - nuts_mean) / nuts_sd)
            ],
            "sd_ratio_by_coord": [
                round(float(v), 3) for v in sd / nuts_sd
            ],
        }

    emit(
        "radon_hierarchical_nuts_min_bulk_ess_per_sec_1chip",
        eps_s,
        "ESS/s",
        750.0,
        {
            "wall_s": round(wall, 2),
            "chains": num_chains,
            "min_ess": round(min_ess, 1),
            "grad_evals_per_sec": round(grads / wall, 0),
            "flops_per_grad_eval": fpg,
            **tele,
            "divergence_rate": float(np.asarray(res.diverging).mean()),
            "max_depth": cap,
            "max_depth_auto": True,
            "treedepth_hit_rate": float(
                (np.asarray(res.tree_depth) >= cap).mean()
            ),
            **advi_detail,
        },
    )


if __name__ == "__main__":
    main()
