"""Grid-convergence audit for the LV bench's rk4-vs-rk45 swap.

BASELINE.md config 4 names "RK45 + adjoint sensitivities"
(ref: stan/math/prim/arr/functor/integrate_ode_rk45.hpp:80-140);
`benches/bench_lv.py` uses the fixed-grid rk4 path (480 steps,
discretize-then-optimize gradients) because it is the faster TPU program.
This audit justifies the swap on the numbers:

  A. pointwise: |logp_rk4 - logp_rk45| and gradient differences over a
     cloud of posterior-typical parameter draws (f64, CPU — the accuracy
     question is backend-independent);
  B. posterior: full NUTS with each solver, same seeds; posterior
     mean/sd differences in Monte-Carlo-error units for all 8 params.

Prints one JSON line; run `python -m benches.audit_lv_grid`.
"""

import json

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from math_tpu.infer.sample import sample_nuts  # noqa: E402
from math_tpu.models import lotka_volterra  # noqa: E402


def main():
    ts, yobs, _, _ = lotka_volterra.synthetic_data(20)
    yo = jnp.asarray(yobs)
    m4 = lotka_volterra.make(ts, solver="rk4")
    m45 = lotka_volterra.make(ts, solver="rk45")  # adaptive DP5, rtol 1e-6

    # --- A: pointwise logp/grad agreement over a posterior-typical cloud.
    # Centered on the truth-ish region the sampler actually explores.
    rng = np.random.default_rng(0)
    center = np.asarray(
        m4.ravel_constrained(
            {"theta": np.array([0.55, 0.028, 0.80, 0.024]),
             "z0": np.array([33.0, 6.0]),
             "sigma": np.array([0.25, 0.25])}
        )
    )
    cloud = jnp.asarray(center + 0.15 * rng.normal(size=(64, m4.dim)))

    vg4 = jax.jit(jax.vmap(jax.value_and_grad(lambda z: m4.logp(z, yo))))
    vg45 = jax.jit(jax.vmap(jax.value_and_grad(lambda z: m45.logp(z, yo))))
    lp4, g4 = vg4(cloud)
    lp45, g45 = vg45(cloud)
    dlp = np.abs(np.asarray(lp4 - lp45))
    # relative grad difference against the grad magnitude (grads are O(1e2))
    dg = np.abs(np.asarray(g4 - g45)).max(1) / np.maximum(
        np.abs(np.asarray(g45)).max(1), 1.0
    )

    # --- B: posterior agreement, full NUTS per solver.
    def run(model):
        return sample_nuts(
            model.logp, jax.random.PRNGKey(7), model.dim, args=(yo,),
            num_chains=8, num_warmup=250, num_samples=250, max_depth=7,
            target_accept=0.85, init_radius=1.0,
        )

    r4, r45 = run(m4), run(m45)

    from math_tpu.diagnostics import ess_bulk

    def moments(res):
        pos = np.asarray(res.position)  # (chains, draws, dim)
        flat = pos.reshape(-1, pos.shape[-1])
        ess = np.array(
            [max(ess_bulk(pos[:, :, i]), 8.0) for i in range(pos.shape[-1])]
        )
        return flat.mean(0), flat.std(0), ess

    mu4, sd4, ess4 = moments(r4)
    mu45, sd45, ess45 = moments(r45)
    # mean difference in MC-error units: MCSE of the difference of two
    # independent estimators = sqrt(sd4^2/ess4 + sd45^2/ess45)
    mcse = np.sqrt(sd4**2 / ess4 + sd45**2 / ess45)
    mean_z = np.abs(mu4 - mu45) / mcse
    sd_ratio = sd4 / sd45

    out = {
        "audit": "lv_rk4_fixed_grid_vs_adaptive_rk45",
        "pointwise_max_abs_dlogp": round(float(dlp.max()), 6),
        "pointwise_max_rel_dgrad": round(float(dg.max()), 6),
        "posterior_max_mean_diff_in_mcse_units": round(float(mean_z.max()), 2),
        "posterior_sd_ratio_range": [
            round(float(sd_ratio.min()), 3),
            round(float(sd_ratio.max()), 3),
        ],
        "min_ess": [round(float(ess4.min()), 0), round(float(ess45.min()), 0)],
        "verdict": (
            "fixed grid reproduces the adaptive posterior"
            if float(mean_z.max()) < 3.0 and float(dlp.max()) < 0.05
            else "DISAGREEMENT - investigate"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
