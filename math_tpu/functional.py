"""Higher-order AD drivers and parallel-map functionals.

Reference: ``rev/mat/functor/{gradient,jacobian}.hpp``,
``mix/mat/functor/{hessian,grad_hessian,hessian_times_vector,...}.hpp``,
``prim/mat/functor/map_rect*.hpp``, ``rev/mat/functor/adj_jac_apply.hpp``,
``prim/mat/functor/finite_diff_gradient_auto.hpp``.

On TPU these collapse onto JAX transforms — the value of this module is the
Stan-shaped API (names, composition, return conventions) so downstream code
ports mechanically:

  reference                          here
  -----------------------------------------------------------------
  gradient(f, x, fx, grad)           fx, grad = gradient(f, x)
  jacobian(f, x, fx, J)              fx, J    = jacobian(f, x)
  hessian(f, x, fx, grad, H)         fx, g, H = hessian(f, x)
  grad_hessian (fvar<fvar<var>>)     grad_hessian(f, x) (3rd order)
  hessian_times_vector               hessian_times_vector(f, x, v) (HVP
                                     via fwd-over-rev; no Hessian formed)
  map_rect<cid, F>                   map_rect(f, shared, job_params, ...)
  adj_jac_apply<F>                   adj_jac_apply(f, mjac)(args...)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from math_tpu.testing import finite_diff_gradient  # re-export ground truth


def gradient(f: Callable, x):
    """(f(x), grad f(x)) — one reverse sweep (ref: gradient.hpp:42-57)."""
    return jax.value_and_grad(f)(jnp.asarray(x))


def jacobian(f: Callable, x, mode: str = "rev"):
    """(f(x), J) with J_ij = df_i/dx_j (ref: jacobian.hpp both modes)."""
    x = jnp.asarray(x)
    jac = jax.jacrev(f)(x) if mode == "rev" else jax.jacfwd(f)(x)
    return f(x), jac


def hessian(f: Callable, x):
    """(f, grad, H) via forward-over-reverse (ref: mix hessian.hpp:42-66)."""
    x = jnp.asarray(x)
    fx, g = jax.value_and_grad(f)(x)
    H = jax.jacfwd(jax.grad(f))(x)
    return fx, g, H


def grad_hessian(f: Callable, x):
    """(f, H, grad-of-H) third-order (ref: mix grad_hessian.hpp)."""
    x = jnp.asarray(x)
    H = jax.hessian(f)(x)
    gH = jax.jacfwd(jax.hessian(f))(x)
    return f(x), H, gH


def hessian_times_vector(f: Callable, x, v):
    """H v without materializing H (ref: mix hessian_times_vector.hpp)."""
    x = jnp.asarray(x)
    v = jnp.asarray(v)
    return jax.jvp(jax.grad(f), (x,), (v,))[1]


def grad_tr_mat_times_hessian(f: Callable, x, m):
    """grad of tr(M H(x)) (ref: mix grad_tr_mat_times_hessian.hpp)."""
    x = jnp.asarray(x)
    m = jnp.asarray(m)

    def tr_mh(xx):
        return jnp.sum(m * jax.hessian(f)(xx))

    return jax.grad(tr_mh)(x)


def derivative(f: Callable, x):
    """(f(x), f'(x)) for scalar x (ref: mix derivative.hpp)."""
    x = jnp.asarray(x)
    return f(x), jax.grad(f)(x)


def partial_derivative(f: Callable, x, i: int):
    """(f(x), df/dx_i) (ref: mix partial_derivative.hpp)."""
    x = jnp.asarray(x)
    return f(x), jax.grad(f)(x)[i]


def finite_diff_hessian(f: Callable, x, h=1e-4):
    """Finite-difference Hessian (ref: finite_diff_hessian.hpp)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    n = x.size
    H = np.zeros((n, n))
    for i in range(n):
        def gi(xx, i=i):
            return finite_diff_gradient(f, xx)[i]

        H[i] = finite_diff_gradient(gi, x, h=h)
    return 0.5 * (H + H.T)


def finite_diff_grad_hessian(f: Callable, x, h=1e-3):
    """Finite-difference gradient-of-Hessian, shape (n, n, n)
    (ref: finite_diff_grad_hessian.hpp; the _auto variant's exact-Hessian
    core here is ``hessian``, differenced over each coordinate)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    n = x.size
    out = np.zeros((n, n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = h
        hp = np.asarray(hessian(f, x + e)[2])
        hm = np.asarray(hessian(f, x - e)[2])
        out[i] = (hp - hm) / (2.0 * h)
    return out


def map_rect(
    f: Callable,
    shared_params,
    job_params,
    x_r=None,
    x_i=None,
    *,
    axis_name: Optional[str] = None,
):
    """Map-reduce over independent jobs (ref: map_rect.hpp:123).

    ``f(shared, job_param, x_r_j, x_i_j) -> vector``; jobs ride ``vmap``
    (the thread-DP successor) and concatenate, exactly like the reference's
    per-job output stacking (``map_rect_combine.hpp:65-91``).  For
    device-sharded jobs wrap the call in ``shard_map`` and pass
    ``axis_name`` — outputs then need no gather because log-density
    consumers reduce with ``psum`` anyway.
    """
    job_params = jnp.asarray(job_params)
    n_jobs = job_params.shape[0]
    if x_r is None:
        x_r = jnp.zeros((n_jobs, 0), job_params.dtype)
    if x_i is None:
        x_i = jnp.zeros((n_jobs, 0), jnp.int32)
    outs = jax.vmap(f, in_axes=(None, 0, 0, 0))(shared_params, job_params, x_r, x_i)
    return outs.reshape(-1)


def adj_jac_apply(f: Callable, multiply_adjoint_jacobian: Callable):
    """Custom-VJP builder (ref: adj_jac_apply.hpp:618).

    ``f(*args) -> out``; ``multiply_adjoint_jacobian(ctx, adj) -> tuple of
    cotangents`` where ``ctx`` is whatever ``f`` needs saved (here: the
    primal args, mirroring the reference's operand storage on the vari).
    """

    @jax.custom_vjp
    def wrapped(*args):
        return f(*args)

    def fwd(*args):
        return f(*args), args

    def bwd(args, adj):
        return tuple(multiply_adjoint_jacobian(args, adj))

    wrapped.defvjp(fwd, bwd)
    return wrapped
