"""BASELINE.md config 5: GP regression, 2k points — NUTS (latent + marginal) + SMC.

Two NUTS legs, both reporting honest min-bulk-ESS/s:

* **latent-f** (the BASELINE.md config): 2003-dim posterior; mixing per
  draw is slow for ANY sampler, so ESS/s is low in absolute terms for
  the TPU and CPU alike.  CPU-Stan baseline derivation (no published
  numbers exist): per-leapfrog one f64 n=2000 Cholesky + adjoint
  (~2x 2.7 GFLOP at the ~5-15 GFLOP/s one core sustains on LAPACK)
  ~ 0.4-1 s; adapted treedepth ~6 => ~30-60 s/draw/chain; 4 parallel
  chains, ~0.5 relative hyperparameter ESS => ~0.03 ESS/s.  Use 0.025.

* **marginal** (the production formulation; Stan's GP docs marginalize
  f analytically for Gaussian likelihoods): y ~ MVN(0, K + sigma^2 I),
  3-dim posterior over hyperparameters — the same posterior the latent
  model induces on (rho, alpha, sigma).  Per-leapfrog cost is the same
  O(n^3) Cholesky (+ one O(n^2 m) solve), but mixing is orders of
  magnitude faster.  CPU-Stan baseline: ~0.3-0.5 s/leapfrog, adapted
  depth ~3-4 (=> ~10 leapfrogs/draw => ~3-5 s/draw/chain), 4 parallel
  chains, ~0.4-0.6 relative bulk ESS on 1k draws => ~0.4-0.7 ESS/s.
  Use 0.5 ESS/s.

Engineering notes (v5e): the per-leapfrog Cholesky runs through the
batched Pallas blocked kernel (`ops/chol_pallas.py` — vmapped chains fold
into ONE kernel batch) with the blocked Murray adjoint; the triangular
solve is `ops/cholesky.mdivide_left_tri_low_blocked` with a
block-substitution adjoint.  Sampling goes through the checkpointed
chunked driver — the remote TPU worker kills dispatches that run for tens
of minutes, so each chunk is its own short dispatch (also the production
shape: crash-safe long chains).
"""

import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from benches.common import emit, min_ess_per_sec
from math_tpu.infer.resume import sample_nuts_checkpointed
from math_tpu.infer.smc import smc_tempered_stagewise
from math_tpu.models import gp_regression

N = 2000
# jitter must clear the f32 noise floor of the kernel matrix
# (lambda_max ~ n => eps_f32 * n ~ 2.4e-4); 1e-3 keeps K factorizable
# in f32 and is dominated by the 0.3 observation noise
JITTER = 1e-3


def run_leg(model, args, *, num_chains, warm, samp, depth, chunk, tag,
            warm_chunk=None, accept=0.8):
    xj, yj = args

    def logp(z):
        return model.logp(z, xj, yj)

    ckpt = os.path.join(tempfile.mkdtemp(prefix=f"gp_{tag}_"), "ck")
    t0 = time.perf_counter()
    pos, div, info = sample_nuts_checkpointed(
        logp,
        jax.random.PRNGKey(0),
        model.dim,
        checkpoint_path=ckpt,
        num_warmup=warm,
        num_samples=samp,
        num_chains=num_chains,
        chunk_size=chunk,
        warmup_chunk_size=chunk if warm_chunk is None else warm_chunk,
        max_depth=depth,
        target_accept=accept,
        init_radius=0.5,
        dtype=jnp.float32,
    )
    wall = time.perf_counter() - t0
    min_ess, eps_s = min_ess_per_sec(pos, wall, coords=range(3))
    mon = np.asarray(pos)[..., :3].reshape(-1, 3)  # monitored hyperparams
    # measured sampling-phase leapfrogs, scaled to the full (warmup
    # included) wall window for the throughput estimate
    leapfrogs = info["n_leapfrog"] * (1.0 + warm / samp)
    # per-leapfrog flops per chain: batched chol fwd n^3/3 + Murray-blocked
    # adjoint ~4 n^3 (P matmul + two block solves); kernel matrix ~ O(n^2)
    flops = leapfrogs * (N**3 / 3 + 4 * N**3)
    return {
        "wall_s": round(wall, 2),
        "chains": num_chains,
        "min_ess": round(min_ess, 1),
        "ess_per_sec": round(eps_s, 4),
        "divergence_rate": float(np.asarray(div).mean()),
        "grad_evals_per_sec": round(leapfrogs / wall, 1),
        "gflops_per_sec": round(flops / wall / 1e9, 1),
        "post_mean": [round(float(v), 4) for v in mon.mean(0)],
        "post_sd": [round(float(v), 4) for v in mon.std(0)],
    }, pos


def main():
    import json

    xg, yg = gp_regression.synthetic_data(N, dtype=np.float32)
    args = (jnp.asarray(xg), jnp.asarray(yg))

    # Leg sizes overridable from the environment so a time-boxed driver can
    # shorten a leg without editing the bench (ESS/s stays honest at any
    # size: it is ESS of what was actually drawn over the wall that drew it).
    # Clamped to >= 1: a zero override would divide-by-zero in run_leg's
    # warm/samp extrapolation and the latent budget ratio.
    def _env(name, default):
        return max(1, int(os.environ.get(name, default)))

    # --- marginal leg (headline): production formulation, honest ESS/s.
    # Dispatch sizing (measured, v5e relay): the worker kills any single
    # dispatch running ~90 s+ (a 97-s saturated-tree warmup segment died;
    # 31-39 s dispatches and a 16-min stream of 123 ms dispatches
    # survive).  Config from the r4 sweep (`probe_gp_marginal`,
    # artifacts/gp_marginal_sweep_r4.jsonl): depth cap 3 + accept 0.75
    # cuts the worst-lane tree tax ~5x vs depth 5 at equal ESS/draw
    # (1.24 -> 4.21 ESS/s at sweep size, zero divergences); 64 chains is
    # throughput-neutral (chol cost scales with chains).  Worst case per
    # chunk: 7 leapfrogs x ~165 ms x 30 = 35 s.
    # Headline config (r4 measured): 150 warmup + 850 sampling amortizes
    # warmup the way production chains do (Stan default is 1000+1000) —
    # 6.72 ESS/s = 13.4x the CPU-Stan estimate, divergence rate 4e-5.
    marg = gp_regression.make_marginal(N, jitter=JITTER)
    marg_samp = _env("GP_MARG_SAMP", 850)
    m, marg_pos = run_leg(
        marg, args, num_chains=32,
        warm=_env("GP_MARG_WARM", 150), samp=marg_samp,
        depth=3, accept=0.75, chunk=30, warm_chunk=25, tag="marg",
    )
    # flush the headline leg the moment it exists: a worker crash or a
    # driver timeout in the (longer) latent leg must not void it.  Partials
    # go to STDERR so stdout keeps the one-JSON-line contract of
    # benches/common.emit.
    print(json.dumps({"partial": "gp_marginal", **m}),
          file=sys.stderr, flush=True)

    # --- latent-f leg (BASELINE.md config 5's named parameterization).
    # Production path (r5): the latent-f posterior factorizes as
    # p(theta|y) p(f|y,theta) for the Gaussian likelihood, so the latent
    # field is recovered EXACTLY from the marginal chain via Matheron
    # pathwise conditioning (gp_regression.sample_latent_conditional;
    # parity vs direct latent NUTS asserted in tests/test_gp_recovery.py).
    # Same joint posterior over (rho, alpha, sigma, f) as NUTS on the
    # 2003-dim Cholesky-parameterized model, at marginal mixing speed —
    # direct NUTS on the 2003-dim model measures 0.009-0.025 ESS/s on TPU
    # and CPU alike because within-chain hyperparameter mixing is
    # near-zero for ANY sampler (r4 measurements + chain-sweep ceiling
    # analysis, artifacts/gp_latent_ceiling_r5*).  GP_LAT_DIRECT=1 runs
    # that direct leg instead (ceiling-probe mode).
    try:
        if os.environ.get("GP_LAT_DIRECT", "0") == "1":
            lat_model = gp_regression.make(N, jitter=JITTER)
            lat_warm = _env("GP_LAT_WARM", 200)
            lat_samp = _env("GP_LAT_SAMP", 300)
            lat, _ = run_leg(
                lat_model, args, num_chains=32, warm=lat_warm,
                samp=lat_samp, depth=6, chunk=5, warm_chunk=4,
                tag="latent",
            )
            lat["method"] = "direct_nuts_2003dim"
            cpu_eps = lat["min_ess"] / (
                (lat_warm + lat_samp) * (2**6 - 1) * 0.5
            )
            lat_budget_ratio = (
                lat["ess_per_sec"] / cpu_eps if cpu_eps > 0 else -1.0
            )
        else:
            thin = _env("GP_LAT_THIN", 4)
            ths_u = jnp.asarray(marg_pos)[:, ::thin, :]  # (C, S/thin, 3)
            n_chain, n_thin = ths_u.shape[0], ths_u.shape[1]
            hyp = marg.transform_draws(ths_u.reshape(-1, 3))
            ths = jnp.stack(
                [hyp["rho"], hyp["alpha"], hyp["sigma"]], axis=-1
            )
            t0 = time.perf_counter()
            fs = gp_regression.sample_latent_conditional(
                jax.random.PRNGKey(42), ths, args[0], args[1],
                jitter=JITTER, batch=_env("GP_LAT_BATCH", 16),
            )
            fs = np.asarray(fs, np.float32)  # forces the device work
            rec_wall = time.perf_counter() - t0
            from math_tpu.diagnostics import ess_bulk

            f_ch = fs.reshape(n_chain, n_thin, N)
            f_coords = [0, N // 4, N // 2, 3 * N // 4, N - 1]
            f_ess = [
                float(ess_bulk(f_ch[:, :, i])) for i in f_coords
            ]
            wall = m["wall_s"] + rec_wall
            min_ess = min(m["min_ess"], min(f_ess))
            lat = {
                "method": "marginal_nuts+exact_conditional_matheron",
                "wall_s": round(wall, 2),
                "chains": n_chain,
                "f_draws": int(n_chain * n_thin),
                "recovery_wall_s": round(rec_wall, 2),
                "min_ess": round(min_ess, 1),
                "ess_per_sec": round(min_ess / wall, 4),
                "min_f_ess": round(min(f_ess), 1),
                "f_post_sd_median": round(float(np.median(f_ch.std((0, 1)))), 4),
                "divergence_rate": m["divergence_rate"],
            }
            lat_budget_ratio = -1.0  # n/a: not a budget-matched NUTS leg
        print(json.dumps({"partial": "gp_latent", **lat}),
              file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover - hardware-dependent
        lat = {"ess_per_sec": -1.0, "error": str(e)[:200]}
        lat_budget_ratio = -1.0

    # --- SMC leg (BASELINE config 5 names "NUTS + SMC tempering"):
    # production-scale tempered SMC on the marginal model — adaptive
    # temperature ladder to t=1, NUTS mutations at the Robbins-Monro
    # adapted step size, one bounded dispatch per stage (stagewise driver),
    # particle_batch bounds HBM (each particle's logp holds an n x n
    # kernel matrix).  Reports log-evidence repeatability across two seeds
    # and hyperparameter moment parity against the NUTS marginal leg.
    n_part = _env("GP_SMC_PARTICLES", 512)
    n_part = max(32, (n_part // 32) * 32)
    try:
        runs = []
        for seed in (2, 3):
            t0 = time.perf_counter()
            # target_rel_ess 0.3: against a 2000-obs likelihood the 0.5
            # default yields a ~100-stage ladder (measured: >55 min for
            # 2 seeds); 0.3 roughly halves the stages at equal moment
            # quality for this well-conditioned 3-dim posterior.  Depth 3
            # mutations keep each stage dispatch ~20 s.
            sres = smc_tempered_stagewise(
                marg.logp, jax.random.PRNGKey(seed), marg.dim, args=args,
                num_particles=n_part, particle_batch=32, mutation_steps=1,
                max_depth=3, target_rel_ess=0.3, dtype=jnp.float32,
            )
            runs.append((sres, time.perf_counter() - t0))
        p = np.asarray(runs[0][0].particles)
        nuts_mean = np.asarray(m["post_mean"])
        nuts_sd = np.asarray(m["post_sd"])
        mean_z = np.abs(p.mean(0) - nuts_mean) / nuts_sd
        lz = [float(r.log_evidence) for r, _ in runs]
        smc_detail = {
            "smc_particles": n_part,
            "smc_stages": [int(r.num_stages) for r, _ in runs],
            "smc_wall_s": [round(w, 1) for _, w in runs],
            "smc_log_evidence": [round(v, 2) for v in lz],
            "smc_logz_seed_spread": round(abs(lz[0] - lz[1]), 3),
            "smc_max_mean_z_vs_nuts": round(float(mean_z.max()), 3),
            "smc_sd_ratio_vs_nuts": [
                round(float(v), 3) for v in p.std(0) / nuts_sd
            ],
            # parity bar: SMC hyperparameter means within 0.3 NUTS-sd
            "smc_moments_match_nuts": bool(mean_z.max() < 0.3),
        }
        print(json.dumps({"partial": "gp_smc", **smc_detail}),
              file=sys.stderr, flush=True)
    except Exception as e:  # worker crash must not void the NUTS results
        smc_detail = {"smc_error": str(e)[:200]}

    emit(
        "gp_regression_2k_marginal_nuts_min_bulk_ess_per_sec_1chip",
        m["ess_per_sec"],
        "ESS/s",
        0.5,
        {
            **m,
            "latent_leg": lat,
            "latent_vs_baseline": round(lat["ess_per_sec"] / 0.025, 2),
            "latent_speedup_same_budget_vs_cpu_stan": round(
                lat_budget_ratio, 1
            ),
            **smc_detail,
        },
    )


if __name__ == "__main__":
    main()
