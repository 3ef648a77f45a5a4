"""Algebraic equation solvers with implicit-function-theorem gradients.

Reference: ``algebra_solver_newton`` / ``algebra_solver_fp`` (KINSOL,
``rev/mat/functor/algebra_solver_newton.hpp:59-72``) and
``algebra_solver_powell`` (Eigen dogleg).  Gradients in all cases come from
the implicit function theorem (``algebra_system.hpp``):

    f(x*, theta) = 0   =>   dx*/dtheta = -(df/dx)^{-1} df/dtheta

TPU-native: damped Newton with a fixed iteration budget inside
``lax.custom_root`` — JAX supplies the IFT vjp through the tangent solve,
which is precisely the reference's formula without materializing Jacobians.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _newton_solve(f, x0, theta, max_iter, tol, damping):
    def fx(x):
        return f(x, theta)

    def body(carry):
        x, it, _ = carry
        r = fx(x)
        J = jax.jacfwd(fx)(x)
        step = jnp.linalg.solve(J, r)
        # backtracking damping: halve until the residual shrinks (3 tries)
        def try_step(alpha):
            xn = x - alpha * step
            return xn, jnp.linalg.norm(fx(xn))

        r0 = jnp.linalg.norm(r)
        x1, n1 = try_step(1.0)
        x2, n2 = try_step(0.5)
        x3, n3 = try_step(0.25)
        pick2 = (n1 > r0) & (n2 <= n1)
        pick3 = (n1 > r0) & (n2 > n1)
        xn = jnp.where(pick3, x3, jnp.where(pick2, x2, x1))
        rn = jnp.where(pick3, n3, jnp.where(pick2, n2, n1))
        return xn, it + 1, rn

    def cond(carry):
        _, it, rn = carry
        return (it < max_iter) & (rn > tol)

    r0 = jnp.linalg.norm(fx(x0))
    x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.asarray(0, jnp.int32), r0))
    return x


def algebra_solver_newton(
    f: Callable,
    x0,
    theta,
    *,
    max_iter: int = 100,
    tol: float = 1e-10,
):
    """Solve f(x, theta) = 0 starting from x0; IFT gradients wrt theta.

    ``f(x, theta) -> residual`` with x and residual the same shape.
    (ref: algebra_solver_newton.hpp)
    """
    x0 = jnp.asarray(x0)
    theta = jnp.asarray(theta)

    def solve(g, x_init):
        # custom_root calls solve(g, x0) where g(x) = f(x, theta-closure)
        return _newton_solve(lambda x, _: g(x), x_init, None, max_iter, tol, True)

    def tangent_solve(g, y):
        # solve J u = y for the (possibly matrix-valued) linearization g
        if y.ndim == 0:
            return y / g(jnp.ones_like(y))
        J = jax.jacfwd(g)(y)
        return jnp.linalg.solve(J, y)

    return jax.lax.custom_root(
        lambda x: f(x, theta), x0, solve, tangent_solve
    )


def _dogleg_solve(f, x0, theta, max_iter, tol):
    """Powell hybrid: trust-region dogleg between the Cauchy and Newton
    steps on 1/2 |f|^2 (ref: algebra_solver_powell.hpp -> Eigen
    HybridNonLinearSolver).  Branchless step selection + radius update in
    one while_loop."""

    def fx(x):
        return f(x, theta)

    def body(carry):
        x, delta, it, _ = carry
        r = fx(x)
        J = jax.jacfwd(fx)(x)
        g = J.T @ r  # gradient of 1/2|f|^2
        p_newton = -jnp.linalg.solve(J, r)
        Jg = J @ g
        alpha = jnp.sum(g * g) / jnp.maximum(jnp.sum(Jg * Jg), 1e-300)
        p_cauchy = -alpha * g
        npn = jnp.linalg.norm(p_newton)
        npc = jnp.linalg.norm(p_cauchy)
        # dogleg blend: tau solves |p_c + tau (p_n - p_c)| = delta
        d = p_newton - p_cauchy
        a = jnp.sum(d * d)
        b = 2.0 * jnp.sum(p_cauchy * d)
        c = jnp.sum(p_cauchy * p_cauchy) - delta * delta
        disc = jnp.maximum(b * b - 4 * a * c, 0.0)
        tau = (-b + jnp.sqrt(disc)) / jnp.maximum(2.0 * a, 1e-300)
        p_blend = p_cauchy + jnp.clip(tau, 0.0, 1.0) * d
        p = jnp.where(
            npn <= delta,
            p_newton,
            jnp.where(npc >= delta, (delta / jnp.maximum(npc, 1e-300)) * p_cauchy, p_blend),
        )
        # actual vs predicted reduction of 1/2|f|^2
        xn = x + p
        rn = fx(xn)
        ared = 0.5 * (jnp.sum(r * r) - jnp.sum(rn * rn))
        Jp = J @ p
        pred = -jnp.sum(r * Jp) - 0.5 * jnp.sum(Jp * Jp)
        rho = ared / jnp.where(jnp.abs(pred) < 1e-300, 1e-300, pred)
        accept = rho > 1e-4
        x_next = jnp.where(accept, xn, x)
        delta_next = jnp.where(
            rho < 0.25,
            0.25 * delta,
            jnp.where(rho > 0.75, jnp.maximum(delta, 2.0 * jnp.linalg.norm(p)), delta),
        )
        res_next = jnp.where(accept, jnp.linalg.norm(rn), jnp.linalg.norm(r))
        return x_next, jnp.maximum(delta_next, 1e-12), it + 1, res_next

    def cond(carry):
        _, _, it, res = carry
        return (it < max_iter) & (res > tol)

    r0 = jnp.linalg.norm(fx(x0))
    delta0 = jnp.maximum(jnp.linalg.norm(x0), 1.0)
    x, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, delta0, jnp.asarray(0, jnp.int32), r0)
    )
    return x


def algebra_solver_powell(
    f: Callable,
    x0,
    theta,
    *,
    max_iter: int = 200,
    tol: float = 1e-10,
):
    """Powell dogleg root solve with IFT gradients (ref:
    ``algebra_solver_powell.hpp``); more robust than plain Newton far from
    the root, identical gradients via ``lax.custom_root``."""
    x0 = jnp.asarray(x0)
    theta = jnp.asarray(theta)

    def solve(g, x_init):
        return _dogleg_solve(lambda x, t: g(x), x_init, None, max_iter, tol)

    def tangent_solve(g, y):
        J = jax.jacfwd(g)(y)
        return jnp.linalg.solve(J, y)

    return jax.lax.custom_root(
        lambda x: f(x, theta), x0, solve, tangent_solve
    )


# Stan's bare `algebra_solver` is the Powell variant (algebra_solver.hpp)
algebra_solver = algebra_solver_powell


def algebra_solver_fp(
    f: Callable,
    x0,
    theta,
    *,
    max_iter: int = 500,
    tol: float = 1e-10,
):
    """Fixed-point solve x = f(x, theta) (ref: algebra_solver_fp.hpp /
    KINSOL KIN_FP), with IFT gradients via custom_root on x - f(x)."""
    x0 = jnp.asarray(x0)
    theta = jnp.asarray(theta)

    def residual(x):
        return x - f(x, theta)

    def solve(g, x_init):
        def body(carry):
            x, it = carry
            return x - g(x), it + 1

        def cond(carry):
            x, it = carry
            return (it < max_iter) & (jnp.linalg.norm(g(x)) > tol)

        x, _ = jax.lax.while_loop(cond, body, (x_init, jnp.asarray(0, jnp.int32)))
        return x

    def tangent_solve(g, y):
        J = jax.jacfwd(g)(y)
        return jnp.linalg.solve(J, y)

    return jax.lax.custom_root(residual, x0, solve, tangent_solve)
