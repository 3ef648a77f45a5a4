"""Shared benchmark harness utilities.

Each benchmark prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

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

# Persistent compilation cache: big NUTS programs take minutes to compile
# through the remote-compile relay (observed: 187 s for a single 2000-dim
# cholesky VJP); caching makes repeat bench runs compile-free.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def timed(run, *args):
    """Compile, then time one full execution with forced materialization."""
    out = run(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = run(*args)
    host = jax.device_get(out)
    return time.perf_counter() - t0, host


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


def min_ess_per_sec(position, wall_s, coords=None):
    from math_tpu.diagnostics import ess_bulk

    pos = np.nan_to_num(np.asarray(position), nan=0.0)
    dim = pos.shape[-1]
    coords = coords if coords is not None else range(dim)
    ess = np.array([ess_bulk(pos[:, :, i]) for i in coords])
    return float(np.nanmin(ess)), float(np.nanmin(ess) / wall_s)
