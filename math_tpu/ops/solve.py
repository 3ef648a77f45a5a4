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


# Powell's dogleg in the reference is another root-finder over the same
# system; the damped-Newton core covers its use cases on TPU.
algebra_solver_powell = algebra_solver_newton
algebra_solver = algebra_solver_newton


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
