"""Pallas TPU kernel: fused bernoulli-logit GLM log-prob + gradient.

The reference's fused GLM kernels compute ``eta = x b + alpha`` once and
emit logp AND closed-form partials in the same pass
(``bernoulli_logit_glm_lpmf.hpp:112-137``; OpenCL version
``opencl/prim/bernoulli_logit_glm_lpmf.hpp``).  Under plain XLA the forward
(logp) and backward (``x^T theta'``) passes each stream the design matrix X
from HBM — two full reads per gradient evaluation.  This kernel is the
``operands_and_partials`` idea as a Mosaic kernel: one pass over row tiles
of X computes

    eta   = X_t B + alpha                 (MXU)
    logp += -sum softplus(-sign * eta)    (VPU)
    th'   = y - sigmoid(eta)
    gB   += X_t^T th'                     (MXU)
    gA   += sum th'

so X is read exactly once, halving HBM traffic for the dominant operand.
Exposed through ``jax.custom_vjp`` (the gradient is computed in the forward
kernel and scaled in the backward, like ``precomputed_gradients``), batched
over chains via the trailing dim of B.

Dispatch: ``math_tpu.config`` thresholds decide when the fused path beats
XLA fusion (the analog of the reference's ``*_worth_transfer`` tuning).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _glm_kernel(n_rows_ref, y_ref, x_ref, b_ref, a_ref,
                logp_ref, ga_ref, gb_ref, *, block_rows):
    i = pl.program_id(0)
    n_rows = n_rows_ref[0]

    x = x_ref[...]  # (bm, K)
    y = y_ref[...]  # (bm, 1)
    b = b_ref[...]  # (K, C)
    a = a_ref[...]  # (1, C)

    eta = jnp.dot(x, b, preferred_element_type=jnp.float32) + a  # (bm, C)
    sign = 2.0 * y - 1.0  # (bm, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, eta.shape, 0)
    valid = (row_ids + i * block_rows) < n_rows

    logp_tile = jnp.where(valid, -jax.nn.softplus(-sign * eta), 0.0)
    thetap = jnp.where(valid, y - jax.nn.sigmoid(eta), 0.0)  # (bm, C)

    gb_tile = jnp.dot(x.T, thetap, preferred_element_type=jnp.float32)  # (K, C)
    ga_tile = jnp.sum(thetap, axis=0, keepdims=True)  # (1, C)
    lp_tile = jnp.sum(logp_tile, axis=0, keepdims=True)  # (1, C)

    @pl.when(i == 0)
    def _():
        logp_ref[...] = jnp.zeros_like(logp_ref)
        ga_ref[...] = jnp.zeros_like(ga_ref)
        gb_ref[...] = jnp.zeros_like(gb_ref)

    logp_ref[...] += lp_tile
    ga_ref[...] += ga_tile
    gb_ref[...] += gb_tile


def _fused_forward(y, x, alpha, beta, *, block_rows=1024, interpret=False):
    """Returns (logp (C,), grad_alpha (C,), grad_beta (K, C))."""
    n, k = x.shape
    c = beta.shape[1]
    n_pad = _round_up(n, block_rows)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        y = jnp.pad(y, (0, n_pad - n))
    grid = n_pad // block_rows

    kernel = functools.partial(_glm_kernel, block_rows=block_rows)
    logp, ga, gb = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block_rows, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((block_rows, k), lambda i, *_: (i, 0)),
                pl.BlockSpec((k, c), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
                pl.BlockSpec((k, c), lambda i, *_: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((k, c), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([n], jnp.int32),
        y.astype(jnp.float32)[:, None],
        x.astype(jnp.float32),
        beta.astype(jnp.float32),
        alpha.astype(jnp.float32)[None, :],
    )
    return logp[0], ga[0], gb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bernoulli_logit_glm_fused(y, x, alpha, beta, interpret=False):
    """Fused multi-chain GLM logp: y (N,), x (N, K), alpha (C,), beta (K, C)
    -> logp (C,).  Gradient wrt alpha/beta computed in the same kernel pass.
    """
    logp, _, _ = _fused_forward(y, x, alpha, beta, interpret=interpret)
    return logp


def _fused_fwd(y, x, alpha, beta, interpret):
    logp, ga, gb = _fused_forward(y, x, alpha, beta, interpret=interpret)
    return logp, (ga, gb, y, x)


def _fused_bwd(interpret, res, g):
    ga, gb, y, x = res
    # g: (C,) cotangent on per-chain logp
    return (
        jnp.zeros_like(y),
        jnp.zeros_like(x),
        (ga * g).astype(jnp.result_type(ga)),
        (gb * g[None, :]).astype(jnp.result_type(gb)),
    )


bernoulli_logit_glm_fused.defvjp(_fused_fwd, _fused_bwd)


def bernoulli_logit_glm_lpmf_chains(y, x, alpha, beta, *, interpret=False):
    """Per-chain GLM logp with threshold dispatch (ref: the
    ``*_worth_transfer`` runtime dispatch in opencl_context.hpp:164-183).

    alpha (C,), beta (K, C) -> logp (C,).  Uses the fused Pallas kernel
    when the measured thresholds say it wins, else vmapped XLA.
    """
    from math_tpu.config import get_config

    th = get_config().thresholds
    n, _ = x.shape
    c = beta.shape[1]
    if n >= th.glm_pallas_min_rows and c >= th.glm_pallas_min_chains:
        return bernoulli_logit_glm_fused(y, x, alpha, beta, interpret)
    # XLA path: same math as dists.glm.bernoulli_logit_glm_lpmf(propto=True)
    eta = x @ beta + alpha[None, :]  # (N, C)
    sign = 2.0 * y[:, None] - 1.0
    return -jnp.sum(jax.nn.softplus(-sign * eta), axis=0)
