"""Log-density program layer.

The reference stops at ``∇ log p`` primitives and delegates the "model" to
the downstream Stan compiler; here we provide the typed equivalent: declare
named parameter blocks with constraint transforms, supply ``log_prob`` on
constrained values, and get back a flat unconstrained log-density

    lp(theta) = log_prob(constrain(theta)) + sum log|det J|

that NUTS/ADVI/SMC consume.  This mirrors how generated Stan model code
reads parameters off the unconstrained vector via ``*_constrain(..., lp)``
calls (reference behavior: ``prim/mat/fun/*_constrain.hpp``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.transforms import Transform


def _size(shape: Tuple[int, ...]) -> int:
    return int(np.prod(shape)) if shape else 1


@dataclasses.dataclass(frozen=True)
class LogDensity:
    """Flat unconstrained log-density with parameter packing metadata."""

    param_specs: Tuple[Tuple[str, Transform], ...]
    log_prob_fn: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray]
    dim: int

    def unravel(self, theta):
        """Split flat unconstrained theta into named unconstrained blocks."""
        out = {}
        pos = 0
        for name, tr in self.param_specs:
            n = _size(tr.unconstrained_shape)
            block = theta[..., pos : pos + n]
            out[name] = block.reshape(theta.shape[:-1] + tuple(tr.unconstrained_shape))
            pos += n
        return out

    def ravel_constrained(self, values: Dict[str, jnp.ndarray]):
        """Inverse: free each constrained value and concatenate."""
        parts = []
        for name, tr in self.param_specs:
            x = tr.free(jnp.asarray(values[name]))
            parts.append(jnp.reshape(x, (-1,)))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    def constrain(self, theta):
        """Named constrained values (no Jacobian)."""
        blocks = self.unravel(theta)
        return {
            name: tr.constrain(blocks[name]) for name, tr in self.param_specs
        }

    def constrain_lp(self, theta):
        blocks = self.unravel(theta)
        lp = jnp.zeros((), dtype=theta.dtype)
        out = {}
        for name, tr in self.param_specs:
            y, lj = tr.constrain_lp(blocks[name])
            out[name] = y
            lp = lp + lj
        return out, lp

    def logp(self, theta, *data):
        """Log density; extra ``*data`` args are forwarded to log_prob_fn.

        Pass large datasets this way (and through the samplers' ``args=``)
        so they remain XLA parameters instead of baked trace constants.
        """
        values, lp_jac = self.constrain_lp(theta)
        return self.log_prob_fn(values, *data) + lp_jac

    def logp_unadjusted(self, theta, *data):
        """Log density WITHOUT the change-of-variables adjustment — the
        objective of Stan's ``optimize`` method (jacobian=false), whose
        optimum is the constrained-space MAP."""
        return self.log_prob_fn(self.constrain(theta), *data)

    def logp_and_grad(self, theta):
        return jax.value_and_grad(self.logp)(theta)

    def transform_draws(self, positions):
        """Constrain a batch of draws: (..., dim) -> dict of (..., *shape).

        The "generated quantities" bridge: feed ``ChainResult.position``
        (chains, draws, dim) and get named constrained parameter arrays.
        """
        flat = jnp.reshape(jnp.asarray(positions), (-1, self.dim))
        cons = jax.vmap(self.constrain)(flat)
        lead = jnp.shape(positions)[:-1]
        return {
            name: jnp.reshape(v, lead + v.shape[1:]) for name, v in cons.items()
        }

    def initial_positions(self, key, num_chains, init_radius=2.0):
        """Stan-style uniform(-2, 2) unconstrained inits."""
        return jax.random.uniform(
            key, (num_chains, self.dim), minval=-init_radius, maxval=init_radius
        )

    def generate_quantities(self, gq_fn, positions, *data, key=None):
        """Standalone generated quantities over saved draws (the Stan
        ``standalone_gqs`` service: re-run a generated-quantities block
        against an existing posterior sample without re-sampling).

        ``gq_fn(params_dict, *data) -> pytree`` — or, when ``key=`` is
        given, ``gq_fn(params_dict, draw_key, *data)`` with a per-draw
        PRNG key (counter-based fold, reproducible) for ``*_rng``
        quantities such as posterior-predictive replicates.  ``positions``
        is any (..., dim) batch of unconstrained draws; every draw runs in
        ONE jitted vmap and ``data`` stays an XLA operand (never a baked
        constant).  Returns the pytree with the draw axes prepended.
        """
        pos = jnp.asarray(positions)
        lead = pos.shape[:-1]
        flat = pos.reshape(-1, self.dim)
        nd = len(data)
        if key is None:

            def one(theta, *d):
                return gq_fn(self.constrain(theta), *d)

            out = jax.jit(jax.vmap(one, in_axes=(0,) + (None,) * nd))(
                flat, *data
            )
        else:

            def one(theta, k, *d):
                return gq_fn(self.constrain(theta), k, *d)

            keys = jax.vmap(
                lambda i: jax.random.fold_in(key, i)
            )(jnp.arange(flat.shape[0]))
            out = jax.jit(jax.vmap(one, in_axes=(0, 0) + (None,) * nd))(
                flat, keys, *data
            )
        return jax.tree.map(
            lambda v: jnp.reshape(v, lead + v.shape[1:]), out
        )


def make_log_density(
    params: Dict[str, Transform],
    log_prob_fn: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray],
) -> LogDensity:
    specs = tuple(params.items())
    dim = sum(_size(tr.unconstrained_shape) for _, tr in specs)
    return LogDensity(param_specs=specs, log_prob_fn=log_prob_fn, dim=dim)
