"""Marginal-GP NUTS config sweep: find the depth/chains/accept point that
maximizes honest ESS/s.

r4 finding to probe: at depth 5 / 32 chains the batched transition pays
the MAX tree length over lanes (~15 leapfrogs) while the MEAN is ~5 — a
~3x worst-lane serialization tax.  GP hyperparameter posteriors typically
adapt to treedepth 3-4 (bench_gp docstring), so capping depth should cut
the tax without hurting per-draw mixing.

Prints one JSON line per config (stdout); run on TPU:
    GP_SWEEP_WARM=150 GP_SWEEP_SAMP=150 python -m benches.probe_gp_marginal
"""

import json
import os
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

import benches.common  # noqa: F401  (compile cache)
from math_tpu.infer.resume import sample_nuts_checkpointed
from math_tpu.models import gp_regression

N = 2000
JITTER = 1e-3


def leg(model, args, *, chains, warm, samp, depth, accept, chunk, wchunk):
    xj, yj = args

    def logp(z):
        return model.logp(z, xj, yj)

    ckpt = os.path.join(tempfile.mkdtemp(prefix="gp_sweep_"), "ck")
    t0 = time.perf_counter()
    pos, div, info = sample_nuts_checkpointed(
        logp, jax.random.PRNGKey(0), model.dim, checkpoint_path=ckpt,
        num_warmup=warm, num_samples=samp, num_chains=chains,
        chunk_size=chunk, warmup_chunk_size=wchunk, max_depth=depth,
        target_accept=accept, init_radius=0.5, dtype=jnp.float32,
    )
    wall = time.perf_counter() - t0
    from benches.common import min_ess_per_sec

    min_ess, eps_s = min_ess_per_sec(pos, wall, coords=range(3))
    return {
        "chains": chains, "depth": depth, "accept": accept,
        "wall_s": round(wall, 1), "min_ess": round(min_ess, 1),
        "ess_per_sec": round(eps_s, 3),
        "grad_evals": int(info["n_leapfrog"]),
        "divergence_rate": float(np.asarray(div).mean()),
    }


def main():
    warm = max(1, int(os.environ.get("GP_SWEEP_WARM", 150)))
    samp = max(1, int(os.environ.get("GP_SWEEP_SAMP", 150)))
    xg, yg = gp_regression.synthetic_data(N, dtype=np.float32)
    args = (jnp.asarray(xg), jnp.asarray(yg))
    marg = gp_regression.make_marginal(N, jitter=JITTER)

    # (chains, depth, accept, sample chunk, warm chunk) — chunks sized so
    # worst case (2^d - 1) * ~0.17 s * chunk stays under ~40 s
    configs = [
        (32, 5, 0.8, 10, 8),   # r3 headline config (control)
        (32, 4, 0.8, 15, 12),
        (32, 3, 0.8, 30, 25),
        (32, 3, 0.75, 30, 25),
        (64, 3, 0.8, 15, 12),
    ]
    for chains, depth, accept, chunk, wchunk in configs:
        try:
            row = leg(marg, args, chains=chains, warm=warm, samp=samp,
                      depth=depth, accept=accept, chunk=chunk, wchunk=wchunk)
        except Exception as e:  # keep sweeping past a worker kill
            row = {"chains": chains, "depth": depth, "accept": accept,
                   "error": str(e)[:160]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
