"""Typed runtime configuration.

The reference configures itself with preprocessor macros (``STAN_THREADS``,
``STAN_MPI``, ``STAN_OPENCL``), an env var (``STAN_NUM_THREADS``), and a
runtime GPU-threshold struct (``opencl_context.hpp:164-183``).  Here the
equivalent is one typed object — no compile-time forks (SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class KernelThresholds:
    """Dispatch thresholds between plain-XLA and hand-written Pallas paths.

    The analog of the reference's empirically tuned ``tuning_struct``
    (cholesky_size_worth_transfer=1250 etc.) — defaults chosen by
    benchmarking on TPU v5e; override per deployment.

    Measured (v5e, 100k rows x 50 features, f32, value+grad in a scan
    loop, r3): the fused single-X-read Pallas GLM kernels beat XLA's
    fused value_and_grad above a per-family chain count — XLA
    materializes the (N, C) eta several times, the kernel keeps it in
    VMEM, so the crossover tracks each family's VPU cost per eta
    element: bernoulli 1.07x @128 / 1.09x @512; poisson 1.04x @128 /
    1.37x @512; normal LOSES until C=512 (0.91x @128, 1.32x @512);
    neg_binomial_2 wins from C=32 (1.08x) to 512 (1.18x); ordered
    (5 categories) wins 2.1x @32 to 3.9x @512 and categorical (5
    classes) 6.0x @32 to 8.8x @512 — their XLA paths materialize (N, C)
    link terms per category/class.  Below its threshold each family
    keeps the XLA path (that is also an answer).
    """

    glm_pallas_min_rows: int = 10_000
    glm_pallas_min_chains: int = 128  # fallback for unlisted families
    glm_pallas_min_chains_per_family: dict = dataclasses.field(
        default_factory=lambda: {
            "bernoulli_logit": 128,
            "poisson_log": 128,
            "normal_id": 512,
            "neg_binomial_2_log": 32,
            "ordered_logistic": 32,
            "categorical_logit": 32,
        }
    )
    glm_pallas_block_rows: int = 1024
    cholesky_pallas_min_dim: int = 1 << 62  # XLA's blocked cholesky wins so far
    # scan-blocked cholesky (ops/cholesky.py): XLA's chol VJP *compiles*
    # pathologically (187 s / worker crash via the remote relay at n=2000);
    # the scan formulation compiles in seconds and runs at parity, so it
    # takes over at sizes where compile blowup bites (v5e measurements).
    cholesky_blocked_min_dim: int = 1024
    cholesky_block_size: int = 256


@dataclasses.dataclass
class Config:
    # numerics
    default_dtype: jnp.dtype = jnp.float32
    x64: bool = False
    # sampling
    max_tree_depth: int = 10
    target_accept: float = 0.8
    chains_per_device: Optional[int] = None
    # mesh
    mesh_shape: Optional[Tuple[int, ...]] = None
    mesh_axes: Tuple[str, ...] = ("chain",)
    # kernels
    thresholds: KernelThresholds = dataclasses.field(default_factory=KernelThresholds)
    # observability
    profile_dir: Optional[str] = os.environ.get("MATH_TPU_PROFILE_DIR")


_config = Config()


def get_config() -> Config:
    return _config


def update_config(**kwargs) -> Config:
    global _config
    _config = dataclasses.replace(_config, **kwargs)
    return _config
