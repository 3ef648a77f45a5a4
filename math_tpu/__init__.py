"""math_tpu — a TPU-native probabilistic-programming math + inference engine.

A from-scratch JAX/XLA/Pallas re-imagination of the capabilities of the Stan
Math Library (reference: ``stan/math.hpp`` in martinmodrak/math v3.0.0), plus
the inference layer Stan delegates downstream (NUTS/HMC, ADVI, SMC).

Design inversion vs the reference (see SURVEY.md §7): Stan Math spends most
of its code making one CPU gradient evaluation cheap (arena tape, fused
manual partials, template dispatch over 5 scalar types).  Here the tape is
``jax.vjp`` at trace time; performance comes from fused log-density kernels,
``vmap`` over thousands of chains, and sharding over a TPU mesh.

Layout (mirrors the reference's layer map, SURVEY.md §1):

- ``math_tpu.special``    — scalar special functions (ref: prim/scal/fun)
- ``math_tpu.transforms`` — constraint transforms (ref: *_constrain/_free)
- ``math_tpu.dists``      — distributions lpdf/lpmf/cdf/rng (ref: prim/*/prob)
- ``math_tpu.ops``        — linalg + Pallas kernels (ref: rev/mat/fun, opencl/)
- ``math_tpu.model``      — log-density program layer (ref: downstream stan)
- ``math_tpu.infer``      — NUTS/HMC, ADVI, SMC (extends reference scope)
- ``math_tpu.parallel``   — mesh/sharding utilities (ref: §2.5 backends)
- ``math_tpu.diagnostics``— ESS / R-hat
- ``math_tpu.testing``    — finite-difference AD harness (ref: test_ad.hpp)
"""

__version__ = "0.1.0"

from math_tpu import special  # noqa: F401
from math_tpu import transforms  # noqa: F401
from math_tpu import dists  # noqa: F401
from math_tpu.utils.propto import include_summand, is_autodiff  # noqa: F401
