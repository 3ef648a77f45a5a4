"""Fused Pallas GLM kernel: parity vs the XLA path (interpret mode on CPU).

Analog of the reference's OpenCL-vs-CPU parity suite (SURVEY.md §4.5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu import dists
from math_tpu.ops.pallas_glm import (
    bernoulli_logit_glm_fused,
    bernoulli_logit_glm_lpmf_chains,
)

RNG = np.random.default_rng(0)
N, K, C = 3000, 7, 5
X = jnp.asarray(RNG.normal(size=(N, K)), jnp.float32)
Y = jnp.asarray(RNG.integers(0, 2, N), jnp.float32)
B = jnp.asarray(RNG.normal(size=(K, C)) * 0.2, jnp.float32)
A = jnp.asarray(RNG.normal(size=(C,)) * 0.2, jnp.float32)


def _xla_ref(a, b):
    return jax.vmap(
        lambda aa, bb: dists.bernoulli_logit_glm_lpmf(Y, X, aa, bb, propto=True),
        in_axes=(0, 1),
    )(a, b)


def test_fused_value_parity():
    got = np.asarray(bernoulli_logit_glm_fused(Y, X, A, B, True))
    want = np.asarray(_xla_ref(A, B))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_fused_grad_parity():
    g_f = jax.grad(
        lambda a, b: jnp.sum(bernoulli_logit_glm_fused(Y, X, a, b, True)),
        argnums=(0, 1),
    )(A, B)
    g_x = jax.grad(lambda a, b: jnp.sum(_xla_ref(a, b)), argnums=(0, 1))(A, B)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_x[0]), rtol=3e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_x[1]), rtol=3e-4, atol=1e-3)


def test_fused_row_masking():
    """N not a multiple of the block size: padded rows must not contribute."""
    n_odd = 1537
    Xo, Yo = X[:n_odd], Y[:n_odd]
    got = np.asarray(bernoulli_logit_glm_fused(Yo, Xo, A, B, True))
    want = np.asarray(
        jax.vmap(
            lambda aa, bb: dists.bernoulli_logit_glm_lpmf(Yo, Xo, aa, bb, propto=True),
            in_axes=(0, 1),
        )(A, B)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_dispatch_thresholds():
    # small problem: dispatches to XLA path (values match exactly)
    got = np.asarray(bernoulli_logit_glm_lpmf_chains(Y, X, A, B))
    want = np.asarray(_xla_ref(A, B))
    np.testing.assert_allclose(got, want, rtol=1e-6)
