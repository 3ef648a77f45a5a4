"""Finite-difference AD test harness.

TPU-native analog of the reference's v3.0.0 AD testing framework
(``test/unit/math/test_ad.hpp``): where the reference instantiates a
function at 5 scalar types (``var``, ``fvar<double>``, ``fvar<var>``, ...)
and compares against finite differences of the ``double`` version, here we
compare JAX's transform stack — ``grad`` (reverse), ``jacfwd`` (forward),
``hessian`` (mixed), under ``jit`` and ``vmap`` — against central finite
differences of the plain function.  Requires x64 (enable in test conftest).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def expect_near_rel(a, b, tol=1e-8, msg=""):
    """Relative comparison handling inf/nan/near-zero.

    Mirrors ``test/unit/math/expect_near_rel.hpp``: exact match required for
    non-finite values; relative tolerance scaled by max(|a|,|b|,1) otherwise.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"{msg}: shape {a.shape} != {b.shape}"
    nfa, nfb = ~np.isfinite(a), ~np.isfinite(b)
    if nfa.any() or nfb.any():
        assert np.array_equal(nfa, nfb), f"{msg}: non-finite mismatch {a} vs {b}"
        assert np.array_equal(a[nfa], b[nfb]), f"{msg}: {a} vs {b}"
    fa, fb = a[~nfa], b[~nfb]
    scale = np.maximum(np.maximum(np.abs(fa), np.abs(fb)), 1.0)
    err = np.abs(fa - fb) / scale
    assert (err <= tol).all(), (
        f"{msg}: max rel err {err.max():.3e} > {tol:.1e}\n a={fa}\n b={fb}"
    )


def finite_diff_gradient(f, x, h=None):
    """Central finite-difference gradient of scalar f at 1-D x.

    Reference behavior: ``prim/mat/functor/finite_diff_gradient_auto.hpp``
    (stepsize scaled per coordinate).
    """
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        hi = h if h is not None else 1e-6 * max(1.0, abs(x.flat[i]))
        xp, xm = x.copy(), x.copy()
        xp.flat[i] += hi
        xm.flat[i] -= hi
        fp, fm = float(f(jnp.asarray(xp))), float(f(jnp.asarray(xm)))
        g.flat[i] = (fp - fm) / (2 * hi)
    return g


def _flatten_f(f, args):
    """View f(*args) as g(x) with x the concatenation of all float args."""
    flats = [np.atleast_1d(np.asarray(a, dtype=np.float64)) for a in args]
    sizes = [a.size for a in flats]
    shapes = [np.shape(a) for a in args]
    splits = np.cumsum(sizes)[:-1]

    def g(x):
        parts = jnp.split(x, splits)
        rebuilt = [
            p.reshape(s) if s else p[0] for p, s in zip(parts, shapes)
        ]
        return f(*rebuilt)

    x0 = np.concatenate([a.ravel() for a in flats])
    return g, x0


def expect_ad(f, *args, tol=1e-5, hessian=False, hess_tol=1e-4):
    """Check value/gradient(/hessian) consistency of ``f`` at ``args``.

    - value: plain == jit
    - reverse grad == forward jacfwd == central finite differences
    - vmap(f) at the same point == f
    - optionally hessian vs finite differences of the AD gradient

    All float args are treated as differentiable (the Stan harness likewise
    sweeps every argument through ``var``).
    """
    g, x0 = _flatten_f(f, args)
    x0j = jnp.asarray(x0)

    v_plain = g(x0j)
    v_jit = jax.jit(g)(x0j)
    expect_near_rel(v_plain, v_jit, 1e-12, "jit value")

    if not np.isfinite(np.asarray(v_plain)):
        return  # gradient comparisons undefined off support

    g_rev = jax.grad(g)(x0j)
    g_fwd = jax.jacfwd(g)(x0j)
    expect_near_rel(g_rev, g_fwd, 1e-10, "rev vs fwd grad")

    g_fd = finite_diff_gradient(g, x0)
    expect_near_rel(g_rev, g_fd, tol, "grad vs finite diff")

    g_jit = jax.jit(jax.grad(g))(x0j)
    expect_near_rel(g_rev, g_jit, 1e-12, "jit grad")

    vb = jax.vmap(g)(jnp.stack([x0j, x0j]))
    expect_near_rel(np.asarray(vb), np.asarray([v_plain, v_plain]), 1e-12, "vmap value")

    if hessian:
        # fwd-over-rev, the reference's fvar<var> instantiation
        # (test_ad.hpp:113-130 compares Hessians against finite differences)
        h_ad = np.asarray(jax.jacfwd(jax.grad(g))(x0j))
        # rev-over-rev must agree (the fvar<fvar<var>> analog is covered by
        # the two independent composition orders agreeing)
        h_rr = np.asarray(jax.jacrev(jax.grad(g))(x0j))
        expect_near_rel(h_ad, h_rr, 1e-8, "fwd-over-rev vs rev-over-rev")
        jg = jax.jit(jax.grad(g))
        cols = []
        for i in range(x0.size):
            hi = 1e-6 * max(1.0, abs(x0.flat[i]))
            xp, xm = x0.copy(), x0.copy()
            xp.flat[i] += hi
            xm.flat[i] -= hi
            cols.append(
                (np.asarray(jg(jnp.asarray(xp))) - np.asarray(jg(jnp.asarray(xm))))
                / (2 * hi)
            )
        h_fd = np.stack(cols, axis=-1)
        expect_near_rel(h_ad, h_fd, hess_tol, "hessian vs finite diff")


def expect_ad_vectorized(f, *args, tol=1e-5):
    """Sweep scalar/vector/broadcast shape combinations of the arguments.

    Analog of ``expect_ad_vectorized`` / the prob-test generator's argument
    instantiation sweep (``test/prob/generate_tests.cpp``): each float
    argument is instantiated as {scalar, length-3 vector} (all combinations)
    and the summed result must be consistent with the all-scalar evaluation
    summed over the broadcast; gradients are fd-checked at one mixed combo.
    """
    import itertools

    base = [np.asarray(a, dtype=np.float64) for a in args]
    n_args = len(base)

    def lift(a, kind):
        return np.full(3, a) if kind == 1 else a

    scalar_val = float(np.asarray(f(*base)))
    for kinds in itertools.product([0, 1], repeat=n_args):
        if not any(kinds):
            continue
        lifted = [lift(a, k) for a, k in zip(base, kinds)]
        got = float(np.asarray(f(*lifted)))
        expect_near_rel(got, 3.0 * scalar_val, 1e-10, f"broadcast {kinds}")
    mixed = [lift(a, i % 2) for i, a in enumerate(base)]
    expect_ad(f, *mixed, tol=tol)


def expect_all_throw_or_invalid(f, *args):
    """Invalid input must yield -inf or nan from every transform.

    Analog of the reference's exception-consistency check
    (``test_ad.hpp expect_all_throw``): XLA can't throw, so the contract is
    that invalid inputs poison the result instead.
    """
    g, x0 = _flatten_f(f, args)
    v = np.asarray(g(jnp.asarray(x0)))
    assert not np.isfinite(v).all(), f"expected non-finite value, got {v}"
