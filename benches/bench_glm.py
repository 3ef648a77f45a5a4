"""BASELINE.md config 2: bernoulli_logit_glm 100k x 50, NUTS.

Baseline: CPU Stan on the same model runs ~1-2 leapfrog grad evals/ms/core
(each eval streams the 100k x 50 design); published CmdStan runs put
wall-clock for 1000+1000 iters around 20-40 min single-chain, i.e. on the
order of 1 ESS/s.  We use 5 ESS/s as a conservative CPU baseline.
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
from math_tpu.infer.pooled import run_pooled_chains
from math_tpu.models import glm_logistic


def main():
    Xn, yn, beta_true, _ = glm_logistic.synthetic_data(100_000, 50)
    X, y = jnp.asarray(Xn), jnp.asarray(yn)
    model = glm_logistic.make(50)
    # chains sweep (v5e, depth 6): 64 -> 90, 128 -> 220, 256 -> 345 ESS/s;
    # the fused GLM kernel amortizes the 100k x 50 X read across the batch
    num_chains, warm, samp = 256, 300, 300

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_chains)
    z0 = jax.random.uniform(
        jax.random.PRNGKey(1), (num_chains, model.dim), minval=-0.1, maxval=0.1,
        dtype=jnp.float32,
    )
    run = jax.jit(
        lambda k, z, X, y: run_pooled_chains(
            k, z, model.logp, args=(X, y),
            num_warmup=warm, num_samples=samp, max_depth=6, target_accept=0.8,
        )
    )
    wall, res = timed(run, keys, z0, X, y)
    min_ess, eps_s = min_ess_per_sec(res.position, wall, coords=range(6))
    grads = int(np.asarray(res.n_leapfrog).sum())  # sampling window only
    fpg = leapfrog_flops(
        lambda z: jax.vmap(jax.value_and_grad(lambda q: model.logp(q, X, y)))(z),
        z0,
    )
    # the timed wall includes warmup; scale sampled leapfrogs to the full
    # window for the FLOP/s estimate
    tele = (
        flops_detail(fpg * grads * (1.0 + warm / samp), wall) if fpg else {}
    )
    beta_err = float(
        np.abs(
            np.asarray(res.position[:, samp // 2 :, 1:]).reshape(-1, 50).mean(0)
            - beta_true
        ).max()
    )
    emit(
        "glm_logistic_100kx50_nuts_min_bulk_ess_per_sec_1chip",
        eps_s,
        "ESS/s",
        5.0,
        {
            "wall_s": round(wall, 2),
            "chains": num_chains,
            "min_ess": round(min_ess, 1),
            "grad_evals_per_sec": round(grads / wall, 0),
            "flops_per_grad_eval": fpg,
            **tele,
            "beta_max_abs_err": round(beta_err, 4),
            "divergence_rate": float(np.asarray(res.diverging).mean()),
        },
    )


if __name__ == "__main__":
    main()
