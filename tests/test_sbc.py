"""Simulation-based calibration (diagnostics.sbc).

Statistical validation of the rank machinery against EXACT posterior
samplers (where uniformity is a theorem), a mis-calibrated posterior
(must be flagged), and one real NUTS-sampled SBC loop on the conjugate
normal model.
"""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.diagnostics import sbc_rank, sbc_uniformity


def _exact_sbc_ranks(M, L, scale=1.0, rng=None):
    """theta ~ N(0,1); y ~ N(theta,1); exact posterior N(y/2, 1/2) with
    the posterior sd multiplied by ``scale`` (1.0 = calibrated)."""
    rng = rng or np.random.default_rng(0)
    theta = rng.normal(size=M)
    y = theta + rng.normal(size=M)
    ranks = np.empty((M, 1), dtype=int)
    for j in range(M):
        post = rng.normal(y[j] / 2, scale * np.sqrt(0.5), size=L)
        ranks[j] = sbc_rank(theta[j : j + 1], post[:, None])
    return ranks


def test_exact_sampler_is_calibrated():
    L = 63
    ranks = _exact_sbc_ranks(4000, L)
    res = sbc_uniformity(ranks, L, n_bins=16)
    assert res.counts.sum() == 4000
    assert res.p_value[0] > 0.01  # uniform ranks: no flag
    # ranks cover the full range
    assert ranks.min() == 0 and ranks.max() == L


def test_underdispersed_posterior_flagged():
    L = 63
    ranks = _exact_sbc_ranks(4000, L, scale=0.6)  # too-tight posterior
    res = sbc_uniformity(ranks, L, n_bins=16)
    assert res.p_value[0] < 1e-6  # U-shaped histogram: decisively flagged
    # U shape: extreme bins overloaded relative to uniform expectation
    expected = 4000 / 16
    assert res.counts[0, 0] > 1.5 * expected
    assert res.counts[0, -1] > 1.5 * expected


def test_nuts_sbc_on_conjugate_model():
    """20 SBC replications of NUTS on theta ~ N(0,1), y | theta ~ N(theta,1)
    with thinned draws; the ranks must not be degenerate (all-0 / all-max)
    and the chi2 must not explode (this is a smoke-level calibration
    check — full SBC power needs hundreds of replications)."""
    from math_tpu.infer import sample_nuts

    def logp(z, y):
        return -0.5 * z[0] ** 2 - 0.5 * (y - z[0]) ** 2

    rng = np.random.default_rng(1)
    M, L = 20, 32
    ranks = np.empty((M, 1), dtype=int)
    for j in range(M):
        theta = rng.normal()
        y = theta + rng.normal()
        # num_samples counts RETAINED draws; thin=4 puts 4 transitions
        # between each, giving L near-independent draws
        res = sample_nuts(
            logp, jax.random.PRNGKey(j), dim=1,
            args=(jnp.asarray(y),),
            num_warmup=100, num_samples=L, num_chains=1, thin=4,
        )
        post = np.asarray(res.position).reshape(-1, 1)
        assert post.shape[0] == L
        ranks[j] = sbc_rank(np.array([theta]), post)
    res = sbc_uniformity(ranks, L, n_bins=4)
    # smoke thresholds: 20 uniform multinomials over 4 bins have
    # chi2 ~ 3 +- a few; > 16 would be a catastrophic miscalibration
    assert res.chi2[0] < 16.0
    assert 0 < ranks.mean() < L


def test_nondivisible_bins_use_exact_expectations():
    """When n_bins does not divide L+1, integer-edge bins hold different
    numbers of rank values; the chi2 must use exact per-bin expectations
    (a flat M/n_bins expectation read chi2 bias ~12 at L=63, 12 bins,
    M=3000 from a PERFECTLY calibrated sampler)."""
    rng = np.random.default_rng(4)
    L, M = 63, 3000
    ranks = rng.integers(0, L + 1, size=(M, 1))  # exactly uniform
    res = sbc_uniformity(ranks, L, n_bins=12)  # 12 does not divide 64
    assert res.p_value[0] > 0.001
    assert res.counts.sum() == M
    # binning never exceeds the number of distinct rank values
    tiny = sbc_uniformity(rng.integers(0, 4, size=(500, 1)), 3, n_bins=20)
    assert tiny.n_bins == 4
