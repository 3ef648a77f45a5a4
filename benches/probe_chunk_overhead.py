"""Probe: where does the chunked auto-depth driver's overhead go?

r5 measured eight-schools AUTO (chunked driver) at wall 2.315 s vs the r4
monolithic hand-tuned single dispatch at 1.494 s — despite the auto run
sampling at a CHEAPER cap (5 vs 6).  This probe decomposes the ~0.8 s:

  1. scalar host-sync round-trip latency through the relay tunnel
  2. monolithic run_pooled_chains at cap 5 / 6 (single dispatch)
  3. chunked driver, FIXED cap 6, warmup_chunk in {100, 250, 500}
  4. chunked driver, AUTO (the r5 bench config)

Prints one JSON line per measurement to stdout (flushed).
"""

import json
import time

import numpy as np  # noqa: F401

import jax
import jax.numpy as jnp

import benches.common  # noqa: F401
from benches.common import _force


def out(tag, **kw):
    print(json.dumps({"probe": tag, **kw}), flush=True)


def main():
    from math_tpu.models import eight_schools
    from math_tpu.infer.pooled import (
        run_pooled_chains,
        run_pooled_chains_chunked,
    )

    model = eight_schools.make()
    num_chains, num_warmup, num_samples = 1024, 500, 500
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    z0 = jax.random.uniform(
        k_init, (num_chains, model.dim), minval=-2.0, maxval=2.0, dtype=dtype
    )
    keys = jax.random.split(jax.random.PRNGKey(7), num_chains)

    # 1. scalar sync round-trip (steady state)
    x = jnp.arange(4.0)
    jax.device_get(jnp.sum(x))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    out(
        "scalar_sync_ms",
        median=round(1e3 * sorted(ts)[len(ts) // 2], 2),
        min=round(1e3 * min(ts), 2),
        max=round(1e3 * max(ts), 2),
    )

    # 2. monolithic single dispatch at cap 5 and 6
    for cap in (5, 6):
        run = jax.jit(
            lambda k, z, cap=cap: run_pooled_chains(
                k,
                z,
                model.logp,
                num_warmup=num_warmup,
                num_samples=num_samples,
                max_depth=cap,
                target_accept=0.9,
            )
        )
        res = run(keys, z0)
        _force(res)
        t0 = time.perf_counter()
        res = run(keys, z0)
        _force(res)
        dt = time.perf_counter() - t0
        out("monolithic", cap=cap, wall_s=round(dt, 3))

    # 3. chunked driver, fixed cap 6, varying warmup_chunk
    for wc in (100, 250, 500):
        def run_c(k, z, wc=wc):
            return run_pooled_chains_chunked(
                k,
                z,
                model.logp,
                num_warmup=num_warmup,
                num_samples=num_samples,
                max_depth=6,
                target_accept=0.9,
                warmup_chunk=wc,
                sample_chunk=500,
            )

        res = run_c(keys, z0)
        _force(res)
        t0 = time.perf_counter()
        res = run_c(keys, z0)
        _force(res)
        dt = time.perf_counter() - t0
        out("chunked_fixed6", warmup_chunk=wc, wall_s=round(dt, 3))

    # 4. chunked AUTO (r5 bench config), with per-phase timers
    def run_a(k, z):
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

    res = run_a(keys, z0)
    _force(res)
    t0 = time.perf_counter()
    res = run_a(keys, z0)
    _force(res)
    dt = time.perf_counter() - t0
    out("chunked_auto", wall_s=round(dt, 3), final_cap=int(res.max_depth))


if __name__ == "__main__":
    main()
