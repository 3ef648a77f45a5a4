"""One-off: GP marginal HEADLINE config (150+850) at the r5 exact-transpose
Cholesky adjoint (97 ms/step fused value+grad) — the r4 artifact recorded
6.72 ESS/s (13.4x) at ~150 ms/step.

Measurement discipline: the chunked driver is host-orchestrated, so this
probe must run on an OTHERWISE-IDLE host — a run concurrent with the full
pytest suite measured 5.09 ESS/s at 121 grad-evals/s where the idle
driver-config run sustains 161 (the ~25% loss is host contention, not the
sampler; that contaminated number is deliberately not recorded in
BENCHMARKS.md)."""

import json

import numpy as np  # noqa: F401

import jax.numpy as jnp

import benches.common  # noqa: F401
from benches.bench_gp import JITTER, N, run_leg
from math_tpu.models import gp_regression


def main():
    xg, yg = gp_regression.synthetic_data(N, dtype=np.float32)
    args = (jnp.asarray(xg), jnp.asarray(yg))
    marg = gp_regression.make_marginal(N, jitter=JITTER)
    m, _ = run_leg(
        marg, args, num_chains=32, warm=150, samp=850,
        depth=3, accept=0.75, chunk=30, warm_chunk=25, tag="marg_headline",
    )
    print(json.dumps({"probe": "gp_marginal_headline_r5", **m}), flush=True)


if __name__ == "__main__":
    import numpy as np  # noqa: F811

    main()
