"""Pathfinder: quasi-Newton variational inference (Zhang, Carpenter,
Gelman, Vehtari 2022; downstream-Stan service method since 2.33).

Single path: run L-BFGS on the (jacobian-adjusted) negative log density
from a random init; at every iterate build the local Gaussian
approximation

    q_k = N(theta_k + Sigma_k g_k,  Sigma_k),

where ``Sigma_k`` is the L-BFGS inverse-Hessian estimate in the
Byrd–Nocedal–Schnabel compact form over the last ``history`` curvature
pairs,

    Sigma = gamma I + T W T^T,   T = [S, gamma Y] (dim x 2J),

which a thin QR of ``T`` reduces to ``gamma I + Q E Q^T`` with a 2J x 2J
eigendecomposition — O(dim J^2) to SAMPLE, evaluate log q, and apply
Sigma^-1 (no dim x dim matrix ever materializes; Stan's implementation
uses the same factorization).  Each iterate's ELBO is estimated with
``num_elbo_draws`` Monte-Carlo draws; the best iterate's approximation
supplies the path's draws.

Multi-path: ``num_paths`` independent paths pooled and importance
RESAMPLED with Pareto-smoothed weights (``diagnostics.psis``), returning
the PSIS k_hat diagnostic.

Deviations from Stan, documented: the diagonal initial estimate is the
scalar gamma = s^T y / y^T y (classic L-BFGS H0) rather than Stan's
per-coordinate diagonal update — same compact form, one fewer state
vector; iterates whose middle matrix is not positive definite are
discarded (ELBO = -inf) rather than repaired.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from math_tpu.diagnostics.psis import psis_smooth


class PathfinderResult(NamedTuple):
    draws: jnp.ndarray  # (num_draws, dim) unconstrained draws
    log_p: jnp.ndarray  # (num_draws,) target log density of the draws
    log_q: jnp.ndarray  # (num_draws,) approximation log density
    k_hat: float  # PSIS shape diagnostic of the pooled weights
    path_elbos: np.ndarray  # (num_paths,) best ELBO per path
    best_iters: np.ndarray  # (num_paths,) iterate index chosen per path


class _Approx(NamedTuple):
    """gamma I + Q diag-eig(E) Q^T factorization of Sigma at one iterate."""

    mu: jnp.ndarray  # (dim,)
    gamma: jnp.ndarray  # scalar
    q: jnp.ndarray  # (dim, 2J) orthonormal
    lam: jnp.ndarray  # (2J,) eigenvalues of E (Sigma eigs = gamma + lam)
    v: jnp.ndarray  # (2J, 2J) eigenvectors of E
    logdet: jnp.ndarray  # log |Sigma|


def _build_approx(theta, g_logp, s_cols, y_cols):
    """Compact-form Sigma at one iterate; None if not positive definite.

    ``s_cols``/``y_cols``: lists of (dim,) numpy arrays, oldest->newest,
    with y = grad(neg logp) differences (so S^T Y > 0 under curvature).
    """
    dim = theta.shape[0]
    S = np.stack(s_cols, axis=1)  # (dim, J)
    Y = np.stack(y_cols, axis=1)
    j = S.shape[1]
    sty = S.T @ Y  # (J, J)
    gamma = float(
        (s_cols[-1] @ y_cols[-1]) / max(y_cols[-1] @ y_cols[-1], 1e-300)
    )
    if not np.isfinite(gamma) or gamma <= 0:
        return None
    R = np.triu(sty)
    if np.any(np.abs(np.diag(R)) < 1e-12):
        return None
    Rinv = np.linalg.solve(R, np.eye(j))
    D = np.diag(np.diag(sty))
    # W = [[R^-T (D + gamma Y^T Y) R^-1, -R^-T], [-R^-1, 0]]
    tl = Rinv.T @ (D + gamma * (Y.T @ Y)) @ Rinv
    W = np.block([[tl, -Rinv.T], [-Rinv, np.zeros((j, j))]])
    T = np.concatenate([S, gamma * Y], axis=1)  # (dim, 2J)
    Q, Rq = np.linalg.qr(T)  # thin
    E = Rq @ W @ Rq.T
    E = 0.5 * (E + E.T)
    lam, V = np.linalg.eigh(E)
    if np.any(gamma + lam <= 1e-12 * max(1.0, gamma)):
        return None  # Sigma not PD at this iterate: discard
    logdet = float(np.sum(np.log(gamma + lam)) + (dim - 2 * j) * np.log(gamma))
    # mu = theta + Sigma g  (all thin-factor products)
    u = Q.T @ g_logp
    mu = theta + gamma * g_logp + Q @ (E @ u)
    return _Approx(
        mu=jnp.asarray(mu), gamma=jnp.asarray(gamma), q=jnp.asarray(Q),
        lam=jnp.asarray(lam), v=jnp.asarray(V), logdet=jnp.asarray(logdet),
    )


def _sample_q(key, ap: _Approx, n, dtype):
    dim = ap.mu.shape[0]
    z = jax.random.normal(key, (n, dim), dtype)
    u = z @ ap.q  # (n, 2J)  == Q^T z per draw
    scaled = (jnp.sqrt(ap.gamma + ap.lam) * (u @ ap.v)) @ ap.v.T  # (n, 2J)
    x = (
        ap.mu[None, :]
        + jnp.sqrt(ap.gamma) * (z - u @ ap.q.T)
        + scaled @ ap.q.T
    )
    return x


def _log_q(ap: _Approx, x):
    dim = ap.mu.shape[0]
    d = x - ap.mu[None, :]
    u = d @ ap.q  # (n, 2J)
    # Sigma^-1 = (1/gamma)(I - QQ^T) + Q V diag(1/(gamma+lam)) V^T Q^T
    perp = d - u @ ap.q.T
    quad = jnp.sum(perp * perp, axis=-1) / ap.gamma + jnp.sum(
        ((u @ ap.v) ** 2) / (ap.gamma + ap.lam), axis=-1
    )
    return -0.5 * (quad + ap.logdet + dim * jnp.log(2.0 * jnp.pi))


def _single_path(logdensity_fn, key, dim, args, *, history, max_iters,
                 num_elbo_draws, init_radius, tol, dtype):
    def neg(z):
        return -logdensity_fn(z, *args)

    vg = jax.jit(jax.value_and_grad(neg))
    opt = optax.lbfgs(memory_size=history)

    @jax.jit
    def step(z, state, v, g):
        updates, state = opt.update(g, state, z, value=v, grad=g, value_fn=neg)
        z2 = optax.apply_updates(z, updates)
        v2, g2 = vg(z2)
        return z2, state, v2, g2

    key, k0 = jax.random.split(key)
    z = jax.random.uniform(k0, (dim,), dtype, -init_radius, init_radius)
    v, g = vg(z)
    state = opt.init(z)
    thetas, gnegs = [np.asarray(z)], [np.asarray(g)]
    for _ in range(max_iters):
        z, state, v, g = step(z, state, v, g)
        if not (np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()):
            break
        thetas.append(np.asarray(z))
        gnegs.append(np.asarray(g))
        if float(np.max(np.abs(np.asarray(g)))) < tol:
            break

    logp_batch = jax.jit(
        lambda xs: jax.vmap(lambda x: logdensity_fn(x, *args))(xs)
    )

    best = (-np.inf, None, -1)
    s_hist, y_hist = [], []
    for k in range(1, len(thetas)):
        s = thetas[k] - thetas[k - 1]
        y = gnegs[k] - gnegs[k - 1]
        if (s @ y) > 1e-11 * np.linalg.norm(s) * np.linalg.norm(y):
            s_hist.append(s)
            y_hist.append(y)
            if len(s_hist) > history:
                s_hist.pop(0)
                y_hist.pop(0)
        if not s_hist:
            continue
        ap = _build_approx(thetas[k], -gnegs[k], s_hist, y_hist)
        if ap is None:
            continue
        key, ke = jax.random.split(key)
        xs = _sample_q(ke, ap, num_elbo_draws, dtype)
        lp = np.asarray(logp_batch(xs))
        lq = np.asarray(_log_q(ap, xs))
        mask = np.isfinite(lp)
        if not mask.any():
            continue
        elbo = float(np.mean(np.where(mask, lp, np.min(lp[mask])) - lq))
        if elbo > best[0]:
            best = (elbo, ap, k)
    return key, best


def pathfinder(
    logdensity_fn: Callable,
    key,
    dim: int,
    *,
    args=(),
    num_paths: int = 4,
    num_draws: int = 1000,
    num_draws_per_path: int = 1000,
    num_elbo_draws: int = 25,
    history: int = 6,
    max_iters: int = 75,
    init_radius: float = 2.0,
    tol: float = 1e-8,
    resample: bool = True,
    dtype=jnp.float64,
) -> PathfinderResult:
    """Multi-path Pathfinder (ref: downstream Stan's pathfinder service).

    Draws ``num_draws_per_path`` from each path's best-ELBO Gaussian,
    pools them, Pareto-smooths the importance weights, and (with
    ``resample=True``) importance-resamples ``num_draws`` final draws.
    ``k_hat`` > 0.7 means the pooled approximation is unreliable — use
    the draws for initialization (Pathfinder's main production role:
    cheap NUTS inits), not for posterior summaries.
    """
    pools_x, pools_lp, pools_lq = [], [], []
    elbos, iters = [], []
    for _ in range(num_paths):
        key, kp = jax.random.split(key)
        kp, (elbo, ap, k_best) = _single_path(
            logdensity_fn, kp, dim, tuple(args), history=history,
            max_iters=max_iters, num_elbo_draws=num_elbo_draws,
            init_radius=init_radius, tol=tol, dtype=dtype,
        )
        elbos.append(elbo)
        iters.append(k_best)
        if ap is None:
            continue
        kp, kd = jax.random.split(kp)
        xs = _sample_q(kd, ap, num_draws_per_path, dtype)
        lq = _log_q(ap, xs)
        lp = jax.vmap(lambda x: logdensity_fn(x, *args))(xs)
        pools_x.append(np.asarray(xs))
        pools_lp.append(np.asarray(lp))
        pools_lq.append(np.asarray(lq))
    if not pools_x:
        raise RuntimeError(
            "pathfinder: every optimization path failed to produce a "
            "positive-definite approximation; check the log density"
        )
    X = np.concatenate(pools_x, axis=0)
    LP = np.concatenate(pools_lp, axis=0)
    LQ = np.concatenate(pools_lq, axis=0)
    finite = np.isfinite(LP)
    X, LP, LQ = X[finite], LP[finite], LQ[finite]
    lw, k_hat = psis_smooth(LP - LQ)
    if resample:
        w = np.exp(lw - lw.max())
        w = w / w.sum()
        key, kr = jax.random.split(key)
        idx = np.asarray(
            jax.random.choice(
                kr, X.shape[0], shape=(num_draws,), replace=True,
                p=jnp.asarray(w),
            )
        )
        X, LP, LQ = X[idx], LP[idx], LQ[idx]
    return PathfinderResult(
        draws=jnp.asarray(X), log_p=jnp.asarray(LP), log_q=jnp.asarray(LQ),
        k_hat=float(k_hat), path_elbos=np.asarray(elbos),
        best_iters=np.asarray(iters),
    )
