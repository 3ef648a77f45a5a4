"""ADVI and SMC: moment recovery on analytic targets + eight-schools."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu.infer.advi import advi, advi_sample
from math_tpu.infer.smc import smc_tempered, systematic_resample
from math_tpu.models import eight_schools


def _gauss_target(mu, cov):
    prec = np.linalg.inv(cov)

    def ld(z, *args):
        d = z - jnp.asarray(mu)
        return -0.5 * d @ jnp.asarray(prec) @ d

    return ld


MU = np.array([1.0, -2.0, 0.5])
COV = np.diag([2.0, 0.5, 1.0])


def test_advi_meanfield_gaussian():
    res = advi(
        _gauss_target(MU, COV),
        jax.random.PRNGKey(0),
        3,
        num_steps=6000,
        learning_rate=1.0,  # Stan-scale eta (schedule divides by sqrt(s))
        # |ELBO| ~ 2.8 on this toy target, so the default 100-sample ELBO
        # estimate has ~1-3% relative MC noise — right AT Stan's 1% tol;
        # a tighter estimate lets the Stan rule terminate cleanly
        num_elbo_mc=2000,
    )
    np.testing.assert_allclose(np.asarray(res.mu), MU, atol=0.1)
    np.testing.assert_allclose(
        np.exp(2 * np.asarray(res.omega)), np.diag(COV), rtol=0.25
    )
    # Stan termination rule fired before the step cap
    assert res.converged and res.num_steps_run < 6000
    # ELBO trace (one entry per eval_elbo window) improved
    tr = np.asarray(res.elbo_trace)
    assert tr[-1] > tr[0]


def test_advi_fullrank_correlated():
    A = np.array([[1.0, 0.0], [0.9, 0.5]])
    cov = A @ A.T
    res = advi(
        _gauss_target(np.zeros(2), cov),
        jax.random.PRNGKey(1),
        2,
        method="fullrank",
        num_steps=8000,
        learning_rate=1.0,
    )
    got_cov = np.asarray(res.L @ res.L.T)
    np.testing.assert_allclose(got_cov, cov, atol=0.25)
    s = np.asarray(advi_sample(jax.random.PRNGKey(2), res, 40_000))
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.25)


def test_advi_eta_search_runs():
    res = advi(
        _gauss_target(MU, COV),
        jax.random.PRNGKey(3),
        3,
        num_steps=300,
    )
    assert np.isfinite(float(res.final_elbo))


def test_advi_eight_schools():
    model = eight_schools.make()
    res = advi(
        model.logp,
        jax.random.PRNGKey(4),
        model.dim,
        num_steps=8000,
        learning_rate=1.0,
    )
    s = np.asarray(advi_sample(jax.random.PRNGKey(5), res, 4000))
    cons = model.constrain(jnp.asarray(s))
    mu = np.asarray(cons["mu"])
    # mean-field underestimates variance but the location should be right
    assert abs(mu.mean() - 4.4) < 1.2, mu.mean()


def test_systematic_resample_unbiased():
    lw = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = np.asarray(systematic_resample(jax.random.PRNGKey(i), lw))
        counts += np.bincount(idx, minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_smc_gaussian_moments_and_evidence():
    # target: N(mu, I*0.5^2) times... use unnormalized -||z-mu||^2/(2*0.25)
    mu = np.array([1.5, -0.5])

    def ld(z, *args):
        return -0.5 * jnp.sum(jnp.square(z - jnp.asarray(mu)) / 0.25)

    res = smc_tempered(
        ld, jax.random.PRNGKey(0), 2, num_particles=2048, mutation_steps=3
    )
    p = np.asarray(res.particles)
    np.testing.assert_allclose(p.mean(0), mu, atol=0.08)
    np.testing.assert_allclose(p.var(0), [0.25, 0.25], rtol=0.3)
    # evidence: integral of exp(ld) = (2 pi 0.25)^{d/2}; reference N(0,1):
    # Z_target / Z_ref ... log_evidence estimates log int exp(ld) dz minus
    # log int exp(ref) dz = log((2pi*0.25)^1 / (2pi)^1) = log(0.25)
    want = np.log(0.25)
    assert abs(float(res.log_evidence) - want) < 0.15, res.log_evidence
    assert int(res.num_stages) >= 2


def test_smc_eight_schools():
    model = eight_schools.make()
    res = smc_tempered(
        model.logp,
        jax.random.PRNGKey(1),
        model.dim,
        num_particles=2048,
        mutation_steps=5,
        init_scale=2.0,
    )
    p = np.asarray(res.particles)
    cons = model.constrain(jnp.asarray(p))
    mu = np.asarray(cons["mu"])
    assert abs(mu.mean() - 4.4) < 1.0, mu.mean()


def test_smc_stagewise_bit_identical():
    """smc_tempered_stagewise (host-driven, one dispatch per stage) must
    reproduce the monolithic while_loop driver particle-for-particle: the
    stage body and key folding are shared, so dispatch boundaries cannot
    change the stream."""
    from math_tpu.infer.smc import smc_tempered_stagewise

    model = eight_schools.make()
    kw = dict(num_particles=256, mutation_steps=2, max_depth=4,
              init_scale=2.0)
    ref = smc_tempered(model.logp, jax.random.PRNGKey(3), model.dim, **kw)
    ladder = []
    got = smc_tempered_stagewise(
        model.logp, jax.random.PRNGKey(3), model.dim,
        progress_fn=lambda s, t, lz: ladder.append((s, t)), **kw)
    np.testing.assert_array_equal(
        np.asarray(ref.particles), np.asarray(got.particles))
    assert float(ref.log_evidence) == float(got.log_evidence)
    assert int(ref.num_stages) == int(got.num_stages) == len(ladder)
    assert ladder[-1][1] == 1.0  # adaptive ladder reached the posterior


def test_smc_particle_batch_matches_unbatched():
    """particle_batch (lax.map sub-batching for memory) must not change the
    math: same seeds, same particles up to float-reassociation noise."""
    model = eight_schools.make()
    kw = dict(num_particles=128, mutation_steps=2, max_depth=4,
              init_scale=2.0)
    a = smc_tempered(model.logp, jax.random.PRNGKey(5), model.dim, **kw)
    b = smc_tempered(model.logp, jax.random.PRNGKey(5), model.dim,
                     particle_batch=32, **kw)
    np.testing.assert_allclose(
        np.asarray(a.particles), np.asarray(b.particles), rtol=1e-8,
        atol=1e-8)
    np.testing.assert_allclose(
        float(a.log_evidence), float(b.log_evidence), rtol=1e-10)
