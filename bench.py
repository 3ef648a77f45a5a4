"""Headline benchmark driver: one JSON line per BASELINE.md config.

Runs every benchmark config as its own subprocess (isolating TPU-worker
crashes: a killed worker in one bench cannot void the others' lines) and
forwards each bench's single stdout JSON line:

  1. eight-schools NUTS            (benches/bench_eight_schools.py)
  2. bernoulli_logit_glm 100k x 50 (benches/bench_glm.py)
  3. radon NUTS + ADVI parity      (benches/bench_radon.py)
  4. Lotka-Volterra ODE            (benches/bench_lv.py)
  5. GP 2k marginal/latent + SMC   (benches/bench_gp.py)
  +  chain-sharded scaling         (benches/bench_scaling.py)

The first line is the eight-schools headline (the round-over-round
tracking metric).  A bench that fails or times out forwards nothing;
the failure is noted on stderr and the remaining benches still run
(after a TPU health re-check, since a crashed remote worker needs ~10
minutes to recover).
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))

# (module, extra env, timeout seconds).  GP leg sizes are trimmed from the
# full BENCHMARKS.md run so the whole suite fits a driver window; ESS/s is
# honest at any size (ESS of what was drawn over the wall that drew it).
BENCHES = [
    ("benches.bench_eight_schools", {}, 1800),
    ("benches.bench_glm", {}, 2400),
    ("benches.bench_radon", {}, 2400),
    ("benches.bench_lv", {}, 3000),
    ("benches.bench_scaling", {}, 1800),
    (
        "benches.bench_gp",
        {
            "GP_MARG_WARM": "150",
            "GP_MARG_SAMP": "400",
            "GP_LAT_WARM": "100",
            "GP_LAT_SAMP": "80",
            "GP_SMC_PARTICLES": "256",
        },
        7200,
    ),
]


def _tpu_healthy(timeout_s=120):
    """True if a trivial dispatch completes (crashed workers hang it)."""
    code = "import jax, jax.numpy as jnp; print(jax.device_get(jnp.sum(jnp.arange(4.0))))"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], cwd=ROOT, timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_healthy(max_wait_s=900):
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if _tpu_healthy():
            return True
        print("bench: TPU worker unhealthy; waiting 60s", file=sys.stderr,
              flush=True)
        time.sleep(60)
    return False


def main():
    prev_failed = False
    for mod, extra_env, timeout_s in BENCHES:
        if prev_failed and not _wait_healthy():
            print(f"bench: skipping {mod}: TPU worker never recovered",
                  file=sys.stderr, flush=True)
            continue
        env = {**os.environ, **extra_env}
        try:
            r = subprocess.run(
                [sys.executable, "-m", mod], cwd=ROOT, env=env,
                timeout=timeout_s,
            )
            prev_failed = r.returncode != 0
            if prev_failed:
                print(f"bench: {mod} exited {r.returncode}",
                      file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            prev_failed = True
            print(f"bench: {mod} timed out after {timeout_s}s",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
