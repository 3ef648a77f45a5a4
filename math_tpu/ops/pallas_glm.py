"""Pallas TPU kernels: fused GLM log-prob + gradient, four families.

The reference's fused GLM kernels compute ``eta = x b + alpha`` once and
emit logp AND closed-form partials in the same pass (CPU:
``prim/mat/prob/bernoulli_logit_glm_lpmf.hpp:112-137``; device:
``opencl/prim/{bernoulli_logit,poisson_log,normal_id,neg_binomial_2_log}_glm_*``).
Under plain XLA the forward (logp) and backward (``x^T theta'``) passes each
stream the design matrix X from HBM — two full reads per gradient
evaluation.  These kernels are the ``operands_and_partials`` idea as a
Mosaic kernel: one pass over row tiles of X computes, per family,

    eta    = X_t B + alpha                (MXU)
    logp  += sum lp(eta, y, extra)        (VPU)
    theta' = dlogp/deta
    gB    += X_t^T theta'                 (MXU)
    gA    += sum theta'
    gE    += sum dlp/dextra               (sigma / phi families)

so X is read exactly once.  Exposed through ``jax.custom_vjp`` with
``symbolic_zeros=True``: when the caller differentiates w.r.t. the data
operands (y, x) — which the reference supports when x is ``var``,
``bernoulli_logit_glm_lpmf.hpp:112-137`` — the backward pass recomputes
``theta'`` with one extra matmul and returns EXACT cotangents
(``dx = (theta' * g) beta^T``); when only alpha/beta/extra are
differentiated (the sampler hot path) no data-side work is emitted.

Only the eta-dependent part of logp lives inside the kernel;
(y, extra)-only terms (e.g. ``lgamma(y + phi)`` for NB-2) are added
outside with ordinary XLA ops so their gradients come from plain AD.
All kernels compute the ``propto=True`` form; the ``*_chains``
dispatchers add nothing further (they mirror
``dists.glm.*(..., propto=True)``).

Dispatch: ``math_tpu.config`` thresholds decide when the fused path beats
XLA fusion (the analog of the reference's ``*_worth_transfer`` tuning,
``opencl_context.hpp:164-183``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Family definitions: eta-dependent logp core + partials, all on (bm, C)
# tiles with y broadcast as (bm, 1) and extra as (1, C).
# ---------------------------------------------------------------------------


def _bernoulli_core(eta, y, extra):
    """ref: bernoulli_logit_glm_lpmf.hpp:50-137."""
    sign = 2.0 * y - 1.0
    lp = -jax.nn.softplus(-sign * eta)
    thetap = y - jax.nn.sigmoid(eta)
    return lp, thetap, None


def _poisson_core(eta, y, extra):
    """ref: poisson_log_glm_lpmf.hpp (propto: -lgamma(y+1) lives outside)."""
    mu = jnp.exp(eta)
    lp = y * eta - mu
    thetap = y - mu
    return lp, thetap, None


def _normal_core(eta, y, sigma):
    """ref: normal_id_glm_lpdf.hpp:50-118 (eta part: -z^2/2)."""
    inv_sigma = 1.0 / sigma
    z = (y - eta) * inv_sigma
    lp = -0.5 * jnp.square(z)
    thetap = z * inv_sigma
    dextra = jnp.square(z) * inv_sigma  # d(-z^2/2)/dsigma
    return lp, thetap, dextra


def _nb2_core(eta, y, phi):
    """ref: neg_binomial_2_log_glm_lpmf.hpp (eta part).

    lp_core  = y*eta - (y+phi)*log(phi+mu),  mu = exp(eta)
    theta'   = y - (y+phi)*mu/(phi+mu) = y - (y+phi)*sigmoid(eta - log phi)
    d/dphi   = -log(phi+mu) - (y+phi)/(phi+mu)
    """
    log_phi = jnp.log(phi)
    lse = jnp.logaddexp(eta, log_phi)  # log(mu + phi), overflow-safe
    frac = jnp.exp(-lse)  # 1/(mu+phi)
    lp = y * eta - (y + phi) * lse
    thetap = y - (y + phi) * jax.nn.sigmoid(eta - log_phi)
    dextra = -lse - (y + phi) * frac
    return lp, thetap, dextra


_CORES = {
    "bernoulli_logit": (_bernoulli_core, False),
    "poisson_log": (_poisson_core, False),
    "normal_id": (_normal_core, True),
    "neg_binomial_2_log": (_nb2_core, True),
}


def _glm_kernel(n_rows_ref, *refs, core, has_extra, block_rows):
    if has_extra:
        y_ref, x_ref, b_ref, a_ref, e_ref = refs[:5]
        out_refs = refs[5:]
    else:
        y_ref, x_ref, b_ref, a_ref = refs[:4]
        e_ref = None
        out_refs = refs[4:]
    i = pl.program_id(0)
    n_rows = n_rows_ref[0]

    x = x_ref[...]  # (bm, K)
    y = y_ref[...]  # (bm, 1)
    b = b_ref[...]  # (K, C)
    a = a_ref[...]  # (1, C)
    extra = e_ref[...] if has_extra else None  # (1, C)

    eta = jnp.dot(x, b, preferred_element_type=jnp.float32) + a  # (bm, C)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, eta.shape, 0)
    valid = (row_ids + i * block_rows) < n_rows

    lp, thetap, dextra = core(eta, y, extra)
    lp = jnp.where(valid, lp, 0.0)
    thetap = jnp.where(valid, thetap, 0.0)

    gb_tile = jnp.dot(x.T, thetap, preferred_element_type=jnp.float32)  # (K, C)
    tiles = [
        jnp.sum(lp, axis=0, keepdims=True),
        jnp.sum(thetap, axis=0, keepdims=True),
        gb_tile,
    ]
    if has_extra:
        tiles.append(
            jnp.sum(jnp.where(valid, dextra, 0.0), axis=0, keepdims=True)
        )

    @pl.when(i == 0)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    for r, t in zip(out_refs, tiles):
        r[...] += t


def _fused_forward(family, y, x, alpha, beta, extra, *, interpret=False):
    """One-X-read forward.  Returns (logp_core (C,), ga (C,), gb (K, C)
    [, gextra (C,)])."""
    from math_tpu.config import get_config

    block_rows = get_config().thresholds.glm_pallas_block_rows
    core, has_extra = _CORES[family]
    n, k = x.shape
    c = beta.shape[1]
    n_pad = _round_up(n, block_rows)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        y = jnp.pad(y, (0, n_pad - n))
    grid = n_pad // block_rows

    kernel = functools.partial(
        _glm_kernel, core=core, has_extra=has_extra, block_rows=block_rows
    )
    bcast = pl.BlockSpec((1, c), lambda i, *_: (0, 0))
    in_specs = [
        pl.BlockSpec((block_rows, 1), lambda i, *_: (i, 0)),
        pl.BlockSpec((block_rows, k), lambda i, *_: (i, 0)),
        pl.BlockSpec((k, c), lambda i, *_: (0, 0)),
        bcast,
    ]
    out_specs = [bcast, bcast, pl.BlockSpec((k, c), lambda i, *_: (0, 0))]
    out_shape = [
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((k, c), jnp.float32),
    ]
    operands = [
        jnp.asarray([n], jnp.int32),
        y.astype(jnp.float32)[:, None],
        x.astype(jnp.float32),
        beta.astype(jnp.float32),
        alpha.astype(jnp.float32)[None, :],
    ]
    if has_extra:
        in_specs.append(bcast)
        out_specs.append(bcast)
        out_shape.append(jax.ShapeDtypeStruct((1, c), jnp.float32))
        operands.append(extra.astype(jnp.float32)[None, :])

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if has_extra:
        logp, ga, gb, ge = outs
        return logp[0], ga[0], gb, ge[0]
    logp, ga, gb = outs
    return logp[0], ga[0], gb, None


def _data_cotangents(family, y, x, alpha, beta, extra, g):
    """Exact (dy, dx) for the logp CORE via one eta recompute.

    Reference computes dx when x is var (bernoulli_logit_glm_lpmf.hpp:
    112-137): dlogp_c/dx = theta'_{:,c} beta_{:,c}^T, so
    dx = (theta' * g) beta^T.  Only traced when (y, x) carry tangents
    (symbolic_zeros gate) — the sampler hot path never pays for this.
    """
    core, has_extra = _CORES[family]
    eta = x @ beta + alpha[None, :]  # (N, C)
    e2 = extra[None, :] if has_extra else None
    _, thetap, _ = core(eta, y[:, None], e2)
    dx = (thetap * g[None, :]) @ beta.T
    if family == "bernoulli_logit":
        # match the XLA fallback's sign formulation -softplus(-(2y-1) eta)
        sign = 2.0 * y[:, None] - 1.0
        dy_n = 2.0 * eta * jax.nn.sigmoid(-sign * eta)
    elif family == "poisson_log":
        dy_n = eta  # d(y*eta - exp(eta))/dy per row/chain
    elif family == "normal_id":
        dy_n = -thetap
    else:  # neg_binomial_2_log: d(y*eta - (y+phi) log(phi+mu))/dy
        dy_n = eta - jnp.logaddexp(eta, jnp.log(extra)[None, :])
    dy = dy_n @ g
    return dy.astype(y.dtype), dx.astype(x.dtype)


def _make_fused(family):
    core, has_extra = _CORES[family]

    if has_extra:

        @functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
        def fused(y, x, alpha, beta, extra, interpret=False):
            logp, _, _, _ = _fused_forward(
                family, y, x, alpha, beta, extra, interpret=interpret
            )
            return logp

        def fwd(y, x, alpha, beta, extra, interpret):
            need_data = y.perturbed or x.perturbed
            y, x, alpha, beta, extra = (
                v.value for v in (y, x, alpha, beta, extra)
            )
            logp, ga, gb, ge = _fused_forward(
                family, y, x, alpha, beta, extra, interpret=interpret
            )
            return logp, (ga, gb, ge, y, x, alpha, beta, extra, need_data)

        def bwd(interpret, res, g):
            ga, gb, ge, y, x, alpha, beta, extra, need_data = res
            if need_data:
                dy, dx = _data_cotangents(family, y, x, alpha, beta, extra, g)
            else:
                dy, dx = jnp.zeros_like(y), jnp.zeros_like(x)
            return (
                dy,
                dx,
                (ga * g).astype(alpha.dtype),
                (gb * g[None, :]).astype(beta.dtype),
                (ge * g).astype(extra.dtype),
            )

    else:

        @functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
        def fused(y, x, alpha, beta, interpret=False):
            logp, _, _, _ = _fused_forward(
                family, y, x, alpha, beta, None, interpret=interpret
            )
            return logp

        def fwd(y, x, alpha, beta, interpret):
            need_data = y.perturbed or x.perturbed
            y, x, alpha, beta = (v.value for v in (y, x, alpha, beta))
            logp, ga, gb, _ = _fused_forward(
                family, y, x, alpha, beta, None, interpret=interpret
            )
            return logp, (ga, gb, y, x, alpha, beta, need_data)

        def bwd(interpret, res, g):
            ga, gb, y, x, alpha, beta, need_data = res
            if need_data:
                dy, dx = _data_cotangents(family, y, x, alpha, beta, None, g)
            else:
                dy, dx = jnp.zeros_like(y), jnp.zeros_like(x)
            return (
                dy,
                dx,
                (ga * g).astype(alpha.dtype),
                (gb * g[None, :]).astype(beta.dtype),
            )

    fused.defvjp(fwd, bwd, symbolic_zeros=True)
    fused.__name__ = f"{family}_glm_fused"
    fused.__doc__ = (
        f"Fused multi-chain {family} GLM logp core: y (N,), x (N, K), "
        "alpha (C,), beta (K, C)"
        + (", extra (C,)" if has_extra else "")
        + " -> logp (C,) [propto=True eta-part]. Gradients computed in the "
        "same kernel pass (exact data-side cotangents on demand)."
    )
    return fused


bernoulli_logit_glm_fused = _make_fused("bernoulli_logit")
poisson_log_glm_fused = _make_fused("poisson_log")
_normal_id_glm_fused_core = _make_fused("normal_id")
_neg_binomial_2_log_glm_fused_core = _make_fused("neg_binomial_2_log")


def normal_id_glm_fused(y, x, alpha, beta, sigma, interpret=False):
    """Full propto=True normal_id GLM logp per chain: core kernel plus the
    -N log sigma term (plain XLA; its sigma-gradient comes from ordinary AD).
    ref: normal_id_glm_lpdf.hpp:50-118."""
    n = y.shape[0]
    core = _normal_id_glm_fused_core(y, x, alpha, beta, sigma, interpret)
    return core - n * jnp.log(sigma)


def neg_binomial_2_log_glm_fused(y, x, alpha, beta, phi, interpret=False):
    """Full propto=True NB-2-log GLM logp per chain: eta-core kernel plus
    the (y, phi)-only terms lgamma(y+phi) - lgamma(phi) + phi log phi
    (plain XLA over the cheap (N, C) y-phi grid; no X read).
    ref: neg_binomial_2_log_glm_lpmf.hpp."""
    n = y.shape[0]
    core = _neg_binomial_2_log_glm_fused_core(y, x, alpha, beta, phi, interpret)
    data = jnp.sum(jsp.gammaln(y[:, None] + phi[None, :]), axis=0)
    return core + data - n * jsp.gammaln(phi) + n * phi * jnp.log(phi)


# ---------------------------------------------------------------------------
# Threshold dispatchers (ref: the ``*_worth_transfer`` runtime dispatch in
# opencl_context.hpp:164-183).  alpha (C,), beta (K, C) -> logp (C,); uses
# the fused Pallas kernel when the measured thresholds say it wins, else
# vmapped XLA with identical (propto=True) math.
# ---------------------------------------------------------------------------


def _use_pallas(x, beta):
    from math_tpu.config import get_config

    th = get_config().thresholds
    n, _ = x.shape
    c = beta.shape[1]
    return n >= th.glm_pallas_min_rows and c >= th.glm_pallas_min_chains


def bernoulli_logit_glm_lpmf_chains(y, x, alpha, beta, *, interpret=False):
    if _use_pallas(x, beta):
        return bernoulli_logit_glm_fused(y, x, alpha, beta, interpret)
    eta = x @ beta + alpha[None, :]  # (N, C)
    sign = 2.0 * y[:, None] - 1.0
    return -jnp.sum(jax.nn.softplus(-sign * eta), axis=0)


def poisson_log_glm_lpmf_chains(y, x, alpha, beta, *, interpret=False):
    if _use_pallas(x, beta):
        return poisson_log_glm_fused(y, x, alpha, beta, interpret)
    eta = x @ beta + alpha[None, :]
    return jnp.sum(y[:, None] * eta - jnp.exp(eta), axis=0)


def normal_id_glm_lpdf_chains(y, x, alpha, beta, sigma, *, interpret=False):
    if _use_pallas(x, beta):
        return normal_id_glm_fused(y, x, alpha, beta, sigma, interpret)
    n = y.shape[0]
    eta = x @ beta + alpha[None, :]
    z = (y[:, None] - eta) / sigma[None, :]
    return -0.5 * jnp.sum(jnp.square(z), axis=0) - n * jnp.log(sigma)


def neg_binomial_2_log_glm_lpmf_chains(y, x, alpha, beta, phi, *, interpret=False):
    if _use_pallas(x, beta):
        return neg_binomial_2_log_glm_fused(y, x, alpha, beta, phi, interpret)
    n = y.shape[0]
    eta = x @ beta + alpha[None, :]
    yc = y[:, None]
    pc = phi[None, :]
    lse = jnp.logaddexp(eta, jnp.log(pc))
    core = jnp.sum(yc * eta - (yc + pc) * lse, axis=0)
    data = jnp.sum(jsp.gammaln(yc + pc), axis=0)
    return core + data - n * jsp.gammaln(phi) + n * phi * jnp.log(phi)
