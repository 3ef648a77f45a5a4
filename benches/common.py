"""Shared benchmark harness utilities.

Each benchmark prints one JSON line to STDOUT:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Crash-guarded benches may additionally flush per-leg partial records; those
go to STDERR and lack the "metric" key, so a consumer taking the first
stdout JSON line always gets the emit() result.

Timing excludes compile (amortized in production serving); results are
forced with device_get (remote-proxy backends can return early from
block_until_ready).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: big NUTS programs take minutes to compile
# through the remote-compile relay (observed: 187 s for a single 2000-dim
# cholesky VJP); caching makes repeat bench runs compile-free.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _force(out):
    """Block until every leaf of ``out`` is materialized ON DEVICE.

    device_get of a scalar checksum that depends on all float leaves: the
    producing program must finish before the sum exists.  The full draw
    arrays are NOT pulled to the host — on this backend the host link is a
    remote relay tunnel whose transfer time (~100 s for a GB of draws) is
    an environment artifact, not sampler cost; production serving reduces
    diagnostics on device.  Callers np.asarray() the (sliced) outputs they
    need AFTER the timed window.
    """
    s = 0.0
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            s = s + jnp.sum(leaf.astype(jnp.float32))
        elif hasattr(leaf, "dtype"):
            s = s + jnp.sum(leaf).astype(jnp.float32)
    jax.device_get(s)


def timed(run, *args):
    """Compile, then time one full execution forced via on-device checksum
    (see _force); returns (wall_seconds, device outputs)."""
    out = run(*args)
    _force(out)
    t0 = time.perf_counter()
    out = run(*args)
    _force(out)
    return time.perf_counter() - t0, out


def emit(metric, value, unit, baseline, detail):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 2),
                "unit": unit,
                "vs_baseline": round(float(value) / baseline, 2),
                "detail": detail,
            }
        )
    )


# v5e peak (datasheet): 197 TFLOP/s bf16; f32 runs as multi-pass on the
# MXU at ~1/4 of that.  Benches run f32 compute paths unless noted.
V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = V5E_PEAK_BF16 / 4.0


def compiled_flops(fn, *args):
    """FLOPs for one execution of jit(fn)(*args) from XLA's cost
    analysis; None when the backend doesn't expose it (the remote-relay
    TPU plugin may not)."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def leapfrog_flops(logp_vg, *args):
    """FLOPs of ONE chain's value+grad of the log density — the
    mathematical flop count of a leapfrog gradient — from XLA's CPU cost
    analysis with Pallas/blocked dispatch disabled (CPU compiles the
    plain formulation; flop counts are backend-independent).  None if
    cost analysis is unavailable.

    ``logp_vg`` is the chain-BATCHED value+grad and ``args[0]`` the
    (chains, dim) position batch; the batched cost is divided by the
    chain count because callers multiply by the per-chain-summed
    leapfrog counter (``sum(res.n_leapfrog)``) — batched flops times a
    chain-summed counter would overcount by the chain count."""
    import dataclasses

    from math_tpu.config import get_config, update_config

    th0 = get_config().thresholds
    update_config(
        thresholds=dataclasses.replace(
            th0,
            glm_pallas_min_rows=1 << 60,
            cholesky_blocked_min_dim=1 << 60,
        )
    )
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            c = jax.jit(logp_vg).lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        n_chains = max(1, int(jnp.shape(args[0])[0]))
        return float(f) / n_chains if f and f > 0 else None
    except Exception:
        return None
    finally:
        update_config(thresholds=th0)


def flops_detail(total_flops, wall_s, peak=V5E_PEAK_F32):
    """{'gflops_per_sec', 'pct_of_peak'} telemetry block (the measured
    analog of the reference's tuned opencl thresholds,
    opencl_context.hpp:164-183)."""
    fps = total_flops / wall_s
    return {
        "gflops_per_sec": round(fps / 1e9, 1),
        "pct_of_f32_peak": round(100.0 * fps / peak, 2),
    }


def min_ess_per_sec(position, wall_s, coords=None):
    from math_tpu.diagnostics import ess_bulk

    dim = position.shape[-1]
    coords = list(coords) if coords is not None else list(range(dim))
    # slice the monitored coordinates ON DEVICE before the host transfer
    # (the full draw array can be GBs; the relay link is not the sampler)
    sliced = position[..., jnp.asarray(coords, jnp.int32)]
    pos = np.nan_to_num(np.asarray(sliced), nan=0.0)
    ess = np.array([ess_bulk(pos[:, :, i]) for i in range(len(coords))])
    return float(np.nanmin(ess)), float(np.nanmin(ess) / wall_s)
