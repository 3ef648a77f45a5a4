"""Headline benchmark driver: one JSON line per BASELINE.md config,
plus a cumulative ``headline_rollup`` line after EVERY leg.

Runs every benchmark config as its own subprocess (isolating TPU-worker
crashes: a killed worker in one bench cannot void the others' lines) and
forwards each bench's single stdout JSON line:

  1. eight-schools NUTS            (benches/bench_eight_schools.py)
  2. bernoulli_logit_glm 100k x 50 (benches/bench_glm.py)
  3. radon NUTS + ADVI parity      (benches/bench_radon.py)
  4. Lotka-Volterra ODE            (benches/bench_lv.py)
  5. GP 2k marginal/latent + SMC   (benches/bench_gp.py)
  +  chain-sharded scaling         (benches/bench_scaling.py)

Two hard lessons from r3/r4 drive the design (VERDICT r4 "Next #1"):

* **Global wall budget** (``BENCH_BUDGET_S``, default 3300 s): the
  orchestrator tracks its own deadline and sizes each leg's subprocess
  timeout to the time actually remaining, skipping legs that no longer
  fit, so the whole run exits rc=0 BEFORE any external capture window
  closes (r4's capture died rc=124 with per-leg timeouts summing to
  18,600 s).
* **Cumulative rollup**: after every leg the full table-so-far is
  re-printed as one compact JSON line, so a consumer that keeps only the
  last JSON line (or a 2000-char tail) always holds every completed
  config's headline number even if a later leg is lost.

A bench that fails or times out contributes an error marker to the
rollup; the remaining benches still run (after a TPU health re-check,
since a crashed remote worker needs ~10 minutes to recover).
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))

# (rollup key, module, extra env, per-leg timeout cap s, min fit s).
# A leg runs with timeout = min(cap, time remaining - reserve) and is
# skipped when less than `min fit` seconds remain.  GP leg sizes are
# trimmed from the full BENCHMARKS.md run so the whole suite fits the
# budget; ESS/s is honest at any size (ESS of what was drawn over the
# wall that drew it).
BENCHES = [
    ("eight_schools", "benches.bench_eight_schools", {}, 480, 180),
    ("glm", "benches.bench_glm", {}, 480, 240),
    ("radon", "benches.bench_radon", {}, 600, 240),
    ("lv", "benches.bench_lv", {}, 600, 240),
    ("scaling", "benches.bench_scaling", {}, 420, 180),
    (
        "gp",
        "benches.bench_gp",
        {
            "GP_MARG_WARM": "150",
            "GP_MARG_SAMP": "400",
            "GP_SMC_PARTICLES": "256",
        },
        1500,
        420,
    ),
]

BUDGET_S = int(os.environ.get("BENCH_BUDGET_S", "3300"))
RESERVE_S = 45  # orchestrator overhead headroom inside the budget


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


def _wait_healthy(deadline):
    while time.time() < deadline - 180:
        if _tpu_healthy():
            return True
        print("bench: TPU worker unhealthy; waiting 60s", file=sys.stderr,
              flush=True)
        time.sleep(60)
    return False


def _rollup_entry(line):
    """Compact {v, x} (+ GP extras) from one emitted metric line."""
    entry = {"v": line.get("value"), "x": line.get("vs_baseline")}
    return entry


def _gp_extras(detail, rollup):
    """GP emits one line carrying three legs; surface each in the rollup."""
    lat = detail.get("latent_leg") or {}
    if "ess_per_sec" in lat:
        rollup["gp_latent"] = {
            "v": lat["ess_per_sec"],
            "x": detail.get("latent_vs_baseline"),
        }
    if "smc_logz_seed_spread" in detail:
        rollup["gp_smc"] = {
            "particles": detail.get("smc_particles"),
            "logz_spread": detail.get("smc_logz_seed_spread"),
            "moments_match_nuts": detail.get("smc_moments_match_nuts"),
        }


def _print_rollup(rollup, done, total):
    es = rollup.get("eight_schools", {})
    print(
        json.dumps(
            {
                "metric": "headline_rollup",
                "value": es.get("v", -1.0),
                "unit": "ESS/s",
                "vs_baseline": es.get("x", -1.0),
                "legs_done": f"{done}/{total}",
                "configs": rollup,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


def main():
    t_start = time.time()
    deadline = t_start + BUDGET_S
    rollup = {}
    prev_failed = False
    for i, (key, mod, extra_env, cap_s, min_fit_s) in enumerate(BENCHES):
        remaining = deadline - time.time() - RESERVE_S
        if remaining < min_fit_s:
            rollup[key] = {"skipped": "budget"}
            print(f"bench: skipping {mod}: {remaining:.0f}s left < "
                  f"{min_fit_s}s needed", file=sys.stderr, flush=True)
            _print_rollup(rollup, i + 1, len(BENCHES))
            continue
        if prev_failed and not _wait_healthy(deadline):
            rollup[key] = {"skipped": "tpu_unhealthy"}
            _print_rollup(rollup, i + 1, len(BENCHES))
            continue
        env = {**os.environ, **extra_env}
        timeout_s = min(cap_s, remaining)
        try:
            r = subprocess.run(
                [sys.executable, "-m", mod], cwd=ROOT, env=env,
                timeout=timeout_s, stdout=subprocess.PIPE, text=True,
            )
            prev_failed = r.returncode != 0
            got = False
            for ln in (r.stdout or "").splitlines():
                ln = ln.strip()
                if not ln.startswith("{"):
                    continue
                print(ln, flush=True)  # forward the bench's own line
                try:
                    rec = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if "metric" not in rec:
                    continue
                got = True
                k = key if not rec["metric"].startswith("chain_sharded") \
                    else "scaling"
                k = "gp_marginal" if key == "gp" else k
                rollup[k] = _rollup_entry(rec)
                if key == "gp":
                    _gp_extras(rec.get("detail", {}), rollup)
            if not got:
                rollup.setdefault(key, {"error": f"rc={r.returncode}"})
            if prev_failed:
                print(f"bench: {mod} exited {r.returncode}",
                      file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired as e:
            prev_failed = True
            # salvage any metric lines the leg printed before the kill
            out = e.stdout or b""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            for ln in out.splitlines():
                ln = ln.strip()
                if ln.startswith("{") and '"metric"' in ln:
                    print(ln, flush=True)
            rollup[key] = {"error": f"timeout_{int(timeout_s)}s"}
            print(f"bench: {mod} timed out after {timeout_s:.0f}s",
                  file=sys.stderr, flush=True)
        _print_rollup(rollup, i + 1, len(BENCHES))
    sys.exit(0)


if __name__ == "__main__":
    main()
