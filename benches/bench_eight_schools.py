"""Headline benchmark: eight-schools NUTS ESS/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ESS/s", "vs_baseline": N}

Baseline: CPU Stan (CmdStan, 4 chains) on eight-schools achieves roughly
2,500 bulk-ESS/s wall-clock for mu (release builds on modern x86; the
reference repo publishes no numbers — BASELINE.md).  The north-star target
is >=10x per chip, i.e. 25,000 ESS/s.

Method: 1024 vmapped chains, Stan-default windowed warmup (500) + 500
draws, f32 on TPU, AUTO-sized depth cap (see inline note; no hand-set
max_depth).  Value = min bulk-ESS across the 10 unconstrained coordinates
divided by total wall time (warmup + sampling, excluding compile — compile
is cached across runs in production serving).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import benches.common  # noqa: F401  (sets the shared persistent compile cache)


def main():
    from math_tpu.diagnostics import ess_bulk
    from math_tpu.models import eight_schools

    model = eight_schools.make()
    # chains sweep (v5e, depth 10): 512 -> 25.3k, 1024 -> 41.5k, 2048 ->
    # 35.8k, 4096 -> 31.1k ESS/s (probe_8schools_cliff); 1024 optimum
    num_chains = 1024
    num_warmup, num_samples = 500, 500
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    z0 = jax.random.uniform(
        k_init, (num_chains, model.dim), minval=-2.0, maxval=2.0, dtype=dtype
    )
    keys = jax.random.split(key, num_chains)

    # AUTO depth cap (r4 root cause, r5 auto-sizing): the transition's
    # bookkeeping (checkpoint stacks, worst-lane budget) scales with the
    # PROGRAM's depth cap, so depth 10 cost 4.8x the wall at IDENTICAL
    # min-ESS (296k both ways; adapted mean tree depth 3.3).  The chunked
    # pooled driver probes the first 100 warmup steps at the ceiling (10)
    # and auto-sizes the cap for the rest (adapt.choose_depth_cap);
    # saturation rate is reported in the detail dict (the Stan
    # max-treedepth-warning analog).  No hand-set max_depth.
    from math_tpu.infer.pooled import run_pooled_chains_chunked

    def run(k, z):
        return run_pooled_chains_chunked(
            k,
            z,
            model.logp,
            num_warmup=num_warmup,
            num_samples=num_samples,
            max_depth=10,
            auto_depth=True,
            target_accept=0.9,
            warmup_chunk=100,
            sample_chunk=500,
        )

    # compile (not timed: amortized in production) with the SAME inputs as
    # the timed run — the auto-chosen cap is deterministic in the inputs,
    # so the second call reuses every jitted segment; forcing uses an
    # on-device scalar checksum — block_until_ready can return early on
    # remote-proxy backends, and pulling the full draw array through the
    # relay tunnel measures the tunnel, not the sampler (see
    # benches/common._force)
    from benches.common import _force

    keys2 = jax.random.split(jax.random.PRNGKey(7), num_chains)
    res = run(keys2, z0)
    _force(res)

    t0 = time.perf_counter()
    res = run(keys2, z0)
    _force(res)
    dt = time.perf_counter() - t0
    cap = int(res.max_depth)
    pos = jax.device_get(res.position)

    pos = np.nan_to_num(np.asarray(pos), nan=0.0)  # (chains, samples, dim)
    ess = np.array([ess_bulk(pos[:, :, i]) for i in range(model.dim)])
    min_ess = float(np.nanmin(ess))
    ess_per_sec = min_ess / dt

    n_grad = int(np.asarray(res.n_leapfrog).sum()) * 1  # sampling phase only
    grad_per_sec = n_grad / dt
    # FLOP telemetry (VERDICT r2 #3): eight-schools is a 10-dim VPU/latency
    # bound posterior — FLOP/s is reported for completeness, the honest
    # utilization metric here is grad-evals/s
    from benches.common import flops_detail, leapfrog_flops

    fpg = leapfrog_flops(
        lambda z: jax.vmap(jax.value_and_grad(model.logp))(z), z0
    )
    tele = (
        flops_detail(fpg * n_grad * (1.0 + num_warmup / num_samples), dt)
        if fpg
        else {}
    )

    baseline_cpu_stan = 2500.0  # ESS/s, documented estimate (see docstring)
    out = {
        "metric": "eight_schools_nuts_min_bulk_ess_per_sec_1chip",
        "value": round(ess_per_sec, 1),
        "unit": "ESS/s",
        "vs_baseline": round(ess_per_sec / baseline_cpu_stan, 2),
        "detail": {
            "wall_s": round(dt, 3),
            "chains": num_chains,
            "min_ess": round(min_ess, 1),
            "grad_evals_per_sec_sampling": round(grad_per_sec, 0),
            "flops_per_grad_eval": fpg,
            **tele,
            "divergence_rate": float(np.asarray(res.diverging).mean()),
            "max_depth": cap,
            "max_depth_auto": True,
            "treedepth_hit_rate": float(
                (np.asarray(res.tree_depth) >= cap).mean()
            ),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
