"""ODE integration with sensitivities.

Reference: ``integrate_ode_rk45`` (Boost odeint dopri5,
``prim/arr/functor/integrate_ode_rk45.hpp``) and the CVODES
``integrate_ode_bdf/adams`` path whose *forward sensitivities* couple an
N(1+S)-dimensional system solved natively (SURVEY.md §3.4).

TPU-native inversion: the solver is adaptive Dormand-Prince 5(4) written
with ``lax.while_loop`` (trace-once, static shapes), and sensitivities use
the *continuous adjoint* method via ``jax.custom_vjp`` — the backward pass
integrates the augmented system

    d/dt [y, lambda, mu] = [f, -lambda^T df/dy, -lambda^T df/dtheta]

between observation times (BacksolveAdjoint).  This replaces CVODES'
staggered forward sensitivities: adjoint cost is O(1) in the number of
parameters instead of O(S), the right trade for NUTS where theta is the
whole parameter vector.  ``jax.vjp`` inside the backward dynamics is the
analog of the reference's nested-reverse-AD RHS Jacobians
(``rev/arr/functor/coupled_ode_system.hpp:59-185``).

``f(t, y, theta) -> dy/dt`` (pytree-free: y and theta are flat arrays).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

# Dormand-Prince 5(4) tableau
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = np.zeros((7, 7))
_A[1, 0] = 1 / 5
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def _dopri_step(f, t, y, h, theta, k0):
    """One DP5(4) step; FSAL: k0 = f(t, y) from the previous step."""
    dt_ = y.dtype
    ks = [k0]
    for i in range(1, 7):
        yi = y + h * sum(_A[i, j] * ks[j] for j in range(i))
        ks.append(f(t + _C[i] * h, yi, theta))
    y5 = y + h * sum(_B5[j] * ks[j] for j in range(7))
    y4 = y + h * sum(_B4[j] * ks[j] for j in range(7))
    err = y5 - y4
    return y5, err, ks[6]  # ks[6] = f(t+h, y5) (FSAL)


def _error_norm(err, y, y_new, rtol, atol):
    scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
    return jnp.sqrt(jnp.mean(jnp.square(err / scale)))


def _integrate_segment(f, y0, t0, t1, theta, rtol, atol, h0, max_steps):
    """Adaptively integrate y' = f from t0 to t1; returns (y(t1), h_last)."""
    dt_ = y0.dtype

    def cond(carry):
        t, y, h, k, steps, _ = carry
        return (t < t1 - 1e-12 * jnp.abs(t1)) & (steps < max_steps)

    def body(carry):
        t, y, h, k, steps, naccept = carry
        h_eff = jnp.minimum(h, t1 - t)
        y_new, err, k_new = _dopri_step(f, t, y, h_eff, theta, k)
        enorm = _error_norm(err, y, y_new, rtol, atol)
        enorm = jnp.where(jnp.isnan(enorm), jnp.inf, enorm)
        accept = enorm <= 1.0
        factor = jnp.clip(
            0.9 * jnp.power(jnp.maximum(enorm, 1e-10), -0.2), 0.2, 5.0
        )
        h_next = jnp.clip(h_eff * factor, 1e-12, jnp.asarray(np.inf, dt_))
        t = jnp.where(accept, t + h_eff, t)
        y = jnp.where(accept, y_new, y)
        k = jnp.where(accept, k_new, k)
        return t, y, h_next, k, steps + 1, naccept + accept

    k0 = f(t0, y0, theta)
    h0 = jnp.minimum(jnp.asarray(h0, dt_), jnp.maximum(t1 - t0, 1e-12))
    t, y, h, _, steps, _ = jax.lax.while_loop(
        cond, body, (t0, y0, h0, k0, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    )
    y = jnp.where(steps >= max_steps, jnp.full_like(y, jnp.nan), y)
    return y, h


def _rk4_step(f, t, y, h, theta):
    k1 = f(t, y, theta)
    k2 = f(t + 0.5 * h, y + 0.5 * h * k1, theta)
    k3 = f(t + 0.5 * h, y + 0.5 * h * k2, theta)
    k4 = f(t + h, y + h * k3, theta)
    return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def _integrate_segment_adams(f, y0, t0, t1, theta, rtol, atol, h0, max_steps):
    """Adams-Bashforth-Moulton PECE(4) with restart-on-step-change.

    ref: the CVODES CV_ADAMS path of ``cvodes_integrator.hpp``.  Classic
    fixed-coefficient 4th-order predictor-corrector over a uniform local
    grid; the Milne device (19/270)|corr - pred| drives step control.  A
    step-size change invalidates the uniform history, so it triggers an
    RK4 restart (3 fixed substeps) — the standard ODEPACK-lite scheme,
    expressed as a 3-way ``lax.switch`` inside one while_loop so the
    whole integration stays a single compiled program.
    """
    dt_ = y0.dtype
    dim = y0.shape[-1]

    def cond(carry):
        t, y, h, hist, have, steps = carry
        return (t < t1 - 1e-12 * jnp.abs(t1)) & (steps < max_steps)

    def abm_branch(carry):
        t, y, h, hist, have, steps = carry
        f0, f1, f2, f3 = hist[0], hist[1], hist[2], hist[3]  # oldest..newest
        pred = y + (h / 24.0) * (55.0 * f3 - 59.0 * f2 + 37.0 * f1 - 9.0 * f0)
        fp = f(t + h, pred, theta)
        corr = y + (h / 24.0) * (9.0 * fp + 19.0 * f3 - 5.0 * f2 + f1)
        enorm = _error_norm((19.0 / 270.0) * (corr - pred), y, corr, rtol, atol)
        enorm = jnp.where(jnp.isnan(enorm), jnp.inf, enorm)
        accept = enorm <= 1.0
        fc = f(t + h, corr, theta)  # PECE final evaluation
        t_new = jnp.where(accept, t + h, t)
        y_new = jnp.where(accept, corr, y)
        hist_new = jnp.where(accept, jnp.stack([f1, f2, f3, fc]), hist)
        # quantized step control: grow/shrink kills the uniform history
        shrink = enorm > 1.0
        grow = accept & (enorm < 0.02)
        h_new = jnp.where(shrink, 0.5 * h, jnp.where(grow, 2.0 * h, h))
        have_new = have & ~(shrink | grow)
        return t_new, y_new, h_new, hist_new, have_new, steps + 1

    def build_branch(carry):
        # (re)build the uniform 4-point history with 3 RK4 substeps.  After
        # a Milne rejection h is NOT automatically safe (stiff transients),
        # so the first substep is error-checked by step-doubling
        # (Richardson, order 4 ⇒ err ≈ (y_2half − y_full)/15); on failure
        # halve h again and retry the build next iteration.
        t, y, h, hist, have, steps = carry
        y1_full = _rk4_step(f, t, y, h, theta)
        y_half = _rk4_step(f, t, y, 0.5 * h, theta)
        y1 = _rk4_step(f, t + 0.5 * h, y_half, 0.5 * h, theta)
        enorm = _error_norm((y1 - y1_full) / 15.0, y, y1, rtol, atol)
        enorm = jnp.where(jnp.isnan(enorm), jnp.inf, enorm)
        ok = enorm <= 1.0
        f0 = f(t, y, theta)
        f1 = f(t + h, y1, theta)
        y2 = _rk4_step(f, t + h, y1, h, theta)
        f2 = f(t + 2 * h, y2, theta)
        y3 = _rk4_step(f, t + 2 * h, y2, h, theta)
        f3 = f(t + 3 * h, y3, theta)
        hist_new = jnp.where(ok, jnp.stack([f0, f1, f2, f3]), hist)
        t_new = jnp.where(ok, t + 3 * h, t)
        y_new = jnp.where(ok, y3, y)
        h_new = jnp.where(ok, h, 0.5 * h)
        return t_new, y_new, h_new, hist_new, ok, steps + 3

    def finish_branch(carry):
        # near t1 (or h overshoots): single adaptive DP5 step clamped to t1
        t, y, h, hist, have, steps = carry
        h_eff = jnp.minimum(h, t1 - t)
        k0 = f(t, y, theta)
        y_new, err, _ = _dopri_step(f, t, y, h_eff, theta, k0)
        enorm = _error_norm(err, y, y_new, rtol, atol)
        enorm = jnp.where(jnp.isnan(enorm), jnp.inf, enorm)
        accept = enorm <= 1.0
        factor = jnp.clip(
            0.9 * jnp.power(jnp.maximum(enorm, 1e-10), -0.2), 0.2, 5.0
        )
        t_new = jnp.where(accept, t + h_eff, t)
        y_new = jnp.where(accept, y_new, y)
        return t_new, y_new, h_eff * factor, hist, jnp.asarray(False), steps + 1

    def body(carry):
        t, y, h, hist, have, steps = carry
        room = t + 4.0 * h < t1
        idx = jnp.where(room & have, 0, jnp.where(room, 1, 2))
        return jax.lax.switch(
            idx, [abm_branch, build_branch, finish_branch], carry
        )

    h_init = jnp.minimum(jnp.asarray(h0, dt_), jnp.maximum(t1 - t0, 1e-12))
    hist0 = jnp.zeros((4, dim), dt_)
    t, y, h, _, _, steps = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(t0, dt_),
            y0,
            h_init,
            hist0,
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        ),
    )
    y = jnp.where(steps >= max_steps, jnp.full_like(y, jnp.nan), y)
    return y, h


_SEGMENT_FNS = {"dopri": _integrate_segment, "adams": _integrate_segment_adams}


def _forward(f, y0, t0, ts, theta, rtol, atol, max_steps, method="dopri"):
    """ys[i] = y(ts[i]); sequential over the (static-length) output grid."""
    segment = _SEGMENT_FNS[method]

    def scan_body(carry, t_next):
        y, t, h = carry
        y_new, h_new = segment(
            f, y, t, t_next, theta, rtol, atol, h, max_steps
        )
        return (y_new, t_next, h_new), y_new

    dt_ = jnp.result_type(y0.dtype)
    h_init = jnp.asarray(0.1, dt_) * jnp.ones((), dt_)
    (_, _, _), ys = jax.lax.scan(
        scan_body, (y0, jnp.asarray(t0, dt_), h_init), jnp.asarray(ts, dt_)
    )
    return ys


@partial(jax.custom_vjp, nondiff_argnums=(0, 5, 6, 7, 8))
def odeint_adjoint(f, y0, t0, ts, theta, rtol=1e-6, atol=1e-8, max_steps=10_000,
                   method="dopri"):
    """Solve y' = f(t, y, theta) at times ts with adjoint gradients."""
    return _forward(f, y0, t0, ts, theta, rtol, atol, max_steps, method)


def _odeint_fwd(f, y0, t0, ts, theta, rtol, atol, max_steps, method):
    ys = _forward(f, y0, t0, ts, theta, rtol, atol, max_steps, method)
    return ys, (y0, t0, ts, theta, ys)


def _odeint_bwd(f, rtol, atol, max_steps, method, res, g):
    y0, t0, ts, theta, ys = res
    dt_ = ys.dtype
    n = ys.shape[0]

    def aug_dyn(t, aug, args):
        y = aug["y"]
        lam = aug["lam"]
        theta = args
        fy, vjp = jax.vjp(lambda yy, th: f(t, yy, th), y, theta)
        dlam, dmu = vjp(lam)
        return {"y": fy, "lam": -dlam, "mu": -dmu}

    # flatten the aug pytree into one vector so the solver stays array-typed
    def pack(y, lam, mu):
        return jnp.concatenate([y, lam, mu])

    dim = ys.shape[-1]
    pdim = theta.shape[-1]

    def aug_f(t, z, theta):
        y = z[:dim]
        lam = z[dim : 2 * dim]
        fy, vjp = jax.vjp(lambda yy, th: f(t, yy, th), y, theta)
        dlam, dmu = vjp(lam)
        return jnp.concatenate([fy, -dlam, -dmu])

    # integrate backward in time via time reversal s = -t
    def aug_f_rev(s, z, theta):
        return -aug_f(-s, z, theta)

    segment = _SEGMENT_FNS[method]

    def scan_body(carry, xs):
        lam, mu, h = carry
        y_k, g_k, t_k, t_km1 = xs
        lam = lam + g_k
        z0 = pack(y_k, lam, mu)
        z1, h_new = segment(
            aug_f_rev, z0, -t_k, -t_km1, theta, rtol, atol, h, max_steps
        )
        return (z1[dim : 2 * dim], z1[2 * dim :], h_new), None

    t_prev = jnp.concatenate([jnp.asarray([t0], dt_), jnp.asarray(ts[:-1], dt_)])
    xs = (ys[::-1], g[::-1], jnp.asarray(ts, dt_)[::-1], t_prev[::-1])
    lam0 = jnp.zeros((dim,), dt_)
    mu0 = jnp.zeros((pdim,), dt_)
    (lam, mu, _), _ = jax.lax.scan(
        scan_body, (lam0, mu0, jnp.asarray(0.1, dt_)), xs
    )
    # cotangents: y0, t0, ts, theta
    return lam, jnp.zeros((), dt_), jnp.zeros_like(jnp.asarray(ts, dt_)), mu


odeint_adjoint.defvjp(_odeint_fwd, _odeint_bwd)


def integrate_ode_rk45(
    f: Callable,
    y0,
    t0,
    ts,
    theta,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_num_steps: int = 10_000,
):
    """Stan-named wrapper (ref: integrate_ode_rk45.hpp:80-140)."""
    y0 = jnp.asarray(y0)
    theta = jnp.asarray(theta)
    return odeint_adjoint(f, y0, t0, jnp.asarray(ts), theta, rtol, atol, max_num_steps)


def integrate_ode_adams(f, y0, t0, ts, theta, rtol=1e-8, atol=1e-10,
                        max_num_steps=100_000):
    """Non-stiff CVODES-Adams equivalent (ref: cvodes_integrator.hpp
    CV_ADAMS): Adams-Bashforth-Moulton PECE(4) multistep with Milne-device
    step control; the continuous adjoint integrates backward with the
    same method."""
    y0 = jnp.asarray(y0)
    theta = jnp.asarray(theta)
    return odeint_adjoint(
        f, y0, t0, jnp.asarray(ts), theta, rtol, atol, max_num_steps,
        method="adams",
    )


def integrate_ode_bdf(f, y0, t0, ts, theta, rtol=1e-6, atol=1e-9,
                      max_num_steps=100_000):
    """Stiff-path API (ref: cvodes_integrator.hpp CV_BDF).

    Backed by the implicit L-stable TR-BDF2 solver with Newton stages and
    a TR-BDF2 adjoint backward pass (``ops.ode_stiff``)."""
    from math_tpu.ops.ode_stiff import integrate_ode_trbdf2

    return integrate_ode_trbdf2(f, y0, t0, ts, theta, rtol, atol, max_num_steps)


def integrate_dae(
    f: Callable,
    g: Callable,
    y0,
    z0,
    t0,
    ts,
    theta,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_num_steps: int = 10_000,
    newton_iters: int = 20,
):
    """Semi-explicit index-1 DAE (ref: ``integrate_dae`` / IDAS):

        y' = f(t, y, z, theta),    0 = g(t, y, z, theta)

    TPU-native reduction: the algebraic variables are eliminated inside the
    RHS by a damped-Newton solve with implicit-function-theorem gradients
    (``lax.custom_root``), turning the DAE into an ODE in ``y`` that the
    adjoint DP5 core integrates.  Valid when dg/dz is nonsingular along the
    trajectory (the index-1 condition IDAS also requires).

    Returns (ys, zs) at the requested times.
    """
    from math_tpu.ops.solve import algebra_solver_newton

    y0 = jnp.asarray(y0)
    z0 = jnp.asarray(z0)
    theta = jnp.asarray(theta)
    nz = z0.shape[-1]

    ny = y0.shape[-1]

    def solve_z(t, y, th, z_guess):
        # pack (t, y, theta) into the solver's parameter vector; everything
        # traced must flow through arguments — the rhs closure is a static
        # argnum of the adjoint custom_vjp, so captured tracers would leak.
        packed = jnp.concatenate([jnp.reshape(t, (1,)), y, th])

        def resid(z, packed):
            t = packed[0]
            y = packed[1 : 1 + ny]
            th = packed[1 + ny :]
            return g(t, y, z, th)

        return algebra_solver_newton(
            resid, z_guess, packed, max_iter=newton_iters, tol=10 * atol
        )

    def rhs(t, y, th):
        z = solve_z(t, y, th, z0)
        return f(t, y, z, th)

    ys = odeint_adjoint(rhs, y0, t0, jnp.asarray(ts), theta, rtol, atol,
                        max_num_steps)
    zs = jax.vmap(lambda t, y: solve_z(t, y, theta, z0))(
        jnp.asarray(ts, ys.dtype), ys
    )
    return ys, zs


def ode_rk4_fixed(f: Callable, y0, t0, ts, theta, steps_per_interval: int = 16):
    """Fixed-grid RK4 via scan — fully differentiable by tracing, the
    cross-check oracle for the adjoint path (and the fast choice when the
    dynamics are smooth and step count can be tuned offline)."""
    y0 = jnp.asarray(y0)
    ts = jnp.asarray(ts)
    dt_ = y0.dtype

    def interval(carry, t_next):
        y, t = carry
        h = (t_next - t) / steps_per_interval

        def step(y_t, _):
            y, t = y_t
            k1 = f(t, y, theta)
            k2 = f(t + 0.5 * h, y + 0.5 * h * k1, theta)
            k3 = f(t + 0.5 * h, y + 0.5 * h * k2, theta)
            k4 = f(t + h, y + h * k3, theta)
            y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            return (y, t + h), None

        (y, _), _ = jax.lax.scan(step, (y, t), None, length=steps_per_interval)
        return (y, t_next), y

    (_, _), ys = jax.lax.scan(interval, (y0, jnp.asarray(t0, dt_)), ts)
    return ys
