"""Chain-sharded scaling efficiency on a virtual device mesh.

North-star target: >=85% chain-sharded scaling efficiency at >=2 hosts.
Real multi-chip hardware is not attached in this environment, so this
measures the *sharded program* on an N-virtual-device CPU mesh
(xla_force_host_platform_device_count), which validates the SPMD
partitioning and collective layout; absolute ICI numbers need a real pod
slice.  Efficiency = throughput(N devices) / (N * throughput(1 device)).
"""

import json
import os
import subprocess
import sys
import time

SCRIPT = r"""
import os, time, json
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count={n}"
)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys
sys.path.insert(0, {repo!r})
from math_tpu.models import eight_schools
from math_tpu.parallel import chain_mesh, sample_nuts_sharded

model = eight_schools.make()
n = {n}
chains_per_dev = 16
mesh = chain_mesh(n)
kw = dict(num_chains=n * chains_per_dev, num_warmup=200, num_samples=200,
          max_depth=8, mesh=mesh, dtype=jnp.float32)
res = sample_nuts_sharded(model.logp, jax.random.PRNGKey(0), model.dim, **kw)
jax.device_get(res.position)
t0 = time.perf_counter()
res = sample_nuts_sharded(model.logp, jax.random.PRNGKey(1), model.dim, **kw)
jax.device_get(res.position)
wall = time.perf_counter() - t0
draws = n * chains_per_dev * 200
print(json.dumps({{"n": n, "wall": wall, "draws_per_sec": draws / wall}}))
"""


def run_one(n):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = SCRIPT.format(n=n, repo=repo)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=1200,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    # Headline: efficiency at a device count the host can actually back with
    # physical cores (virtual devices beyond nproc time-slice the same cores,
    # which caps apparent "scaling" regardless of SPMD quality).  The 8-dev
    # run is kept as SPMD-layout validation.
    ncores = os.cpu_count() or 1
    n_eff = max(2, min(8, ncores))
    r1 = run_one(1)
    rn = run_one(n_eff)
    r8 = run_one(8) if n_eff != 8 else rn
    eff = rn["draws_per_sec"] / (n_eff * r1["draws_per_sec"])
    eff8 = r8["draws_per_sec"] / (8 * r1["draws_per_sec"])
    print(
        json.dumps(
            {
                "metric": f"chain_sharded_scaling_efficiency_{n_eff}dev_virtual",
                "value": round(eff, 3),
                "unit": "fraction",
                "vs_baseline": round(eff / 0.85, 2),
                "detail": {
                    "physical_cores": ncores,
                    "draws_per_sec_1dev": round(r1["draws_per_sec"], 0),
                    f"draws_per_sec_{n_eff}dev": round(rn["draws_per_sec"], 0),
                    "draws_per_sec_8dev": round(r8["draws_per_sec"], 0),
                    "efficiency_8dev_oversubscribed": round(eff8, 3),
                    "note": "virtual CPU mesh; validates SPMD layout, not ICI",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
