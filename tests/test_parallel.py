"""Sharded inference on the virtual 8-device CPU mesh.

The reference tests MPI with `mpirun -np N` on localhost (SURVEY.md §4.4);
we test SPMD with xla_force_host_platform_device_count=8 (conftest).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from math_tpu import dists
from math_tpu.models import eight_schools
from math_tpu.parallel import chain_mesh, sample_nuts_sharded, sharded_data_logdensity
from math_tpu.infer.pooled import run_pooled_chains


def test_mesh_has_8_devices():
    mesh = chain_mesh()
    assert mesh.devices.size == 8


def test_sharded_nuts_eight_schools():
    model = eight_schools.make()
    res = sample_nuts_sharded(
        model.logp,
        jax.random.PRNGKey(0),
        model.dim,
        num_chains=32,
        num_warmup=400,
        num_samples=300,
        target_accept=0.9,
        dtype=jnp.float64,
    )
    pos = np.asarray(res.position)  # (32, 300, dim)
    assert pos.shape == (32, 300, model.dim)
    cons = model.constrain(jnp.asarray(pos.reshape(-1, model.dim)))
    mu = np.asarray(cons["mu"])
    tau = np.asarray(cons["tau"])
    assert abs(mu.mean() - 4.4) < 0.6, mu.mean()
    assert abs(tau.mean() - 3.6) < 0.8, tau.mean()
    # pooled warmup: step size and metric are shared scalars/vectors
    assert np.ndim(res.step_size) == 0
    assert res.inv_mass.shape == (model.dim,)


def test_sharded_matches_local_pooled():
    """Same seed, same chain count: mesh-sharded == local vmap-pooled."""
    model = eight_schools.make()
    key = jax.random.PRNGKey(1)
    key, k_init = jax.random.split(key)
    z0 = jax.random.uniform(k_init, (8, model.dim), minval=-2, maxval=2,
                            dtype=jnp.float64)
    keys = jax.random.split(key, 8)

    local = run_pooled_chains(
        keys, z0, model.logp, num_warmup=100, num_samples=50
    )

    mesh = chain_mesh()
    sharded = jax.jit(
        jax.shard_map(
            lambda k, z: run_pooled_chains(
                k, z, model.logp, num_warmup=100, num_samples=50,
                axis_name="chain",
            ),
            mesh=mesh,
            in_specs=(P("chain"), P("chain")),
            out_specs=jax.tree.map(
                lambda _: P("chain"),
                local,
            )._replace(step_size=P(), inv_mass=P(), max_depth=P()),
        )
    )(keys, z0)

    # Pooling across 8 single-chain shards equals local 8-chain pooling up
    # to psum-vs-mean float reduction order; NUTS trajectories are chaotic,
    # so tiny differences amplify — compare adaptation results and moments
    # statistically, not bitwise.
    np.testing.assert_allclose(
        np.asarray(sharded.step_size), np.asarray(local.step_size), rtol=0.3
    )
    np.testing.assert_allclose(
        np.asarray(sharded.inv_mass), np.asarray(local.inv_mass), rtol=0.6
    )
    sp_ = np.asarray(sharded.position).reshape(-1, model.dim)
    lp_ = np.asarray(local.position).reshape(-1, model.dim)
    assert np.abs(sp_.mean(0) - lp_.mean(0)).max() < 0.8


def test_sharded_data_logdensity_glm():
    """Observation sharding: psum of shard contributions == unsharded value,
    gradients included (the map_rect successor)."""
    rng = np.random.default_rng(0)
    n, k = 64, 3
    X = rng.normal(size=(n, k))
    beta_true = np.array([0.5, -1.0, 0.3])
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-(X @ beta_true)))).astype(np.float64)

    mesh = chain_mesh(axis="obs")

    def term(theta, shard):
        Xs, ys = shard
        return dists.bernoulli_logit_glm_lpmf(ys, Xs, 0.0, theta, propto=True)

    lp, _ = sharded_data_logdensity(term, (X, y), mesh, axis="obs")

    theta = jnp.asarray([0.2, -0.5, 0.1])
    want = float(
        dists.bernoulli_logit_glm_lpmf(y, X, 0.0, theta, propto=True)
    )
    got = float(jax.jit(lp)(theta))
    np.testing.assert_allclose(got, want, rtol=1e-10)

    gw = np.asarray(
        jax.grad(lambda t: dists.bernoulli_logit_glm_lpmf(y, X, 0.0, t, propto=True))(theta)
    )
    gg = np.asarray(jax.jit(jax.grad(lp))(theta))
    np.testing.assert_allclose(gg, gw, rtol=1e-9)


def test_chunked_pooled_bit_identical():
    """run_pooled_chains_chunked must reproduce run_pooled_chains draw-for-
    draw: the segment machine folds keys by the global step counter, so
    dispatch boundaries cannot change the stream (the property the GP/LV
    benches rely on when sizing dispatches under the remote worker's
    ~90 s single-dispatch kill window)."""
    from math_tpu.infer.pooled import run_pooled_chains_chunked

    model = eight_schools.make()
    n_chains, warm, samp = 8, 30, 20
    keys = jax.random.split(jax.random.PRNGKey(3), n_chains)
    z0 = jax.random.uniform(
        jax.random.PRNGKey(4), (n_chains, model.dim), minval=-1.0, maxval=1.0
    )
    kw = dict(num_warmup=warm, num_samples=samp, max_depth=5, target_accept=0.85)
    ref = jax.jit(
        lambda k, z: run_pooled_chains(k, z, model.logp, **kw)
    )(keys, z0)
    # uneven chunk sizes on purpose: 30 = 7+7+7+7+2, 20 = 6+6+6+2
    got = run_pooled_chains_chunked(
        keys, z0, model.logp, warmup_chunk=7, sample_chunk=6, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(ref.position), np.asarray(got.position)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.n_leapfrog), np.asarray(got.n_leapfrog)
    )
    assert float(ref.step_size) == float(got.step_size)


def test_chunked_pooled_sharded_bit_identical():
    """The chunked driver on a mesh (mesh=) must reproduce the monolithic
    shard_map-ped run_pooled_chains draw-for-draw on the same mesh: the
    multi-chip resume path cannot change the stream either."""
    from math_tpu.infer.pooled import run_pooled_chains_chunked

    model = eight_schools.make()
    n_chains, warm, samp = 16, 25, 14
    keys = jax.random.split(jax.random.PRNGKey(5), n_chains)
    z0 = jax.random.uniform(
        jax.random.PRNGKey(6), (n_chains, model.dim), minval=-1.0, maxval=1.0
    )
    kw = dict(num_warmup=warm, num_samples=samp, max_depth=5,
              target_accept=0.85)
    mesh = chain_mesh()

    probe = run_pooled_chains(keys[:2], z0[:2], model.logp, **kw)
    ref = jax.jit(
        jax.shard_map(
            lambda k, z: run_pooled_chains(
                k, z, model.logp, axis_name="chain", **kw
            ),
            mesh=mesh,
            in_specs=(P("chain"), P("chain")),
            out_specs=jax.tree.map(lambda _: P("chain"), probe)._replace(
                step_size=P(), inv_mass=P(), max_depth=P()
            ),
        )
    )(keys, z0)

    got = run_pooled_chains_chunked(
        keys, z0, model.logp, warmup_chunk=6, sample_chunk=5,
        mesh=mesh, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(ref.position), np.asarray(got.position)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.n_leapfrog), np.asarray(got.n_leapfrog)
    )
    assert float(ref.step_size) == float(got.step_size)


def test_chunked_pooled_args_are_operands():
    """Data passed via args= must flow through the chunked segment
    dispatches as traced OPERANDS in BOTH the local and the mesh path
    (regression: closure-captured data bakes into the compiled program).

    Detection is direct: a trace counter inside logp.  After the first
    dataset compiles the segments, a SECOND same-shaped dataset must
    execute with ZERO new traces (constants would force a retrace) while
    still changing the posterior (the data really flows)."""
    from math_tpu.infer.pooled import run_pooled_chains_chunked

    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(120, 3)))
    bt = jnp.asarray([0.8, -0.5, 0.2])
    y = jnp.asarray(
        (rng.uniform(size=120) < 1 / (1 + np.exp(-np.asarray(X @ bt)))).astype(float)
    )

    traces = {"n": 0}

    def logp(beta, X, y):
        traces["n"] += 1  # host side effect: fires once per (re)trace
        return dists.bernoulli_logit_glm_lpmf(
            y, X, 0.0, beta, propto=True
        ) + dists.normal_lpdf(beta, 0.0, 1.0, propto=True)

    keys = jax.random.split(jax.random.PRNGKey(1), 16)
    z0 = jnp.asarray(rng.normal(size=(16, 3)) * 0.1)
    kw = dict(args=(X, y), num_warmup=60, num_samples=60, max_depth=6,
              warmup_chunk=25, sample_chunk=25)
    local = run_pooled_chains_chunked(keys, z0, logp, **kw)
    sh = run_pooled_chains_chunked(keys, z0, logp, mesh=chain_mesh(), **kw)
    for r in (local, sh):
        pos = np.asarray(r.position).reshape(-1, 3)
        assert np.isfinite(pos).all()
        assert np.abs(pos.mean(0) - np.asarray(bt)).max() < 0.6

    # args-as-operands proof: a different same-shaped dataset must run
    # with ZERO new traces of logp...
    bt2 = jnp.asarray([-0.6, 0.9, -0.1])
    y2 = jnp.asarray(
        (rng.uniform(size=120) < 1 / (1 + np.exp(-np.asarray(X @ bt2)))).astype(float)
    )
    n_before = traces["n"]
    kw2 = dict(kw)
    kw2["args"] = (X, y2)
    local2 = run_pooled_chains_chunked(keys, z0, logp, **kw2)
    assert traces["n"] == n_before, (
        "changing args retraced the segments: data was baked as constants"
    )
    # ...while actually changing the result (the operands really flow)
    pos2 = np.asarray(local2.position).reshape(-1, 3)
    assert np.abs(pos2.mean(0) - np.asarray(bt2)).max() < 0.6
    assert np.abs(pos2.mean(0) - np.asarray(local.position).reshape(-1, 3).mean(0)).max() > 0.3
