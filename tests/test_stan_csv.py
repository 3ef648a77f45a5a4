"""CmdStan-format CSV writer/reader (io.stan_csv)."""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.io.stan_csv import _flat_names, read_stan_csv, write_stan_csv


def test_flat_names_column_major_like_stan():
    # Stan emits containers with the FIRST index fastest
    assert _flat_names("v", (3,)) == ["v.1", "v.2", "v.3"]
    assert _flat_names("m", (2, 3)) == [
        "m.1.1", "m.2.1", "m.1.2", "m.2.2", "m.1.3", "m.2.3",
    ]
    assert _flat_names("s", ()) == ["s"]


def test_round_trip_with_sampler_stats(tmp_path):
    rng = np.random.default_rng(0)
    chains, draws = 3, 40
    cons = {
        "mu": rng.normal(size=(chains, draws)),
        "theta": rng.normal(size=(chains, draws, 4)),
        "Sigma": rng.normal(size=(chains, draws, 2, 2)),
    }
    stats = {
        "lp": rng.normal(size=(chains, draws)),
        "tree_depth": rng.integers(1, 6, size=(chains, draws)),
        "diverging": np.zeros((chains, draws)),
    }
    base = str(tmp_path / "out")
    paths = write_stan_csv(
        base, cons, sampler_stats=stats, step_size=0.37,
        inv_mass=np.ones(9),
    )
    assert [p.endswith(f"_{i + 1}.csv") for i, p in enumerate(paths)] == [
        True, True, True,
    ]
    names, mat = read_stan_csv(paths[1])
    assert mat.shape == (draws, len(names))
    assert names[:7] == [
        "lp__", "accept_stat__", "stepsize__", "treedepth__",
        "n_leapfrog__", "divergent__", "energy__",
    ]
    np.testing.assert_allclose(mat[:, names.index("lp__")], stats["lp"][1],
                               rtol=1e-6)
    np.testing.assert_allclose(mat[:, names.index("stepsize__")], 0.37)
    np.testing.assert_allclose(
        mat[:, names.index("treedepth__")], stats["tree_depth"][1]
    )
    # Fortran-order flattening round-trips the matrix param
    j = names.index("Sigma.1.1")
    assert names[j : j + 4] == ["Sigma.1.1", "Sigma.2.1", "Sigma.1.2",
                                "Sigma.2.2"]
    np.testing.assert_allclose(
        mat[:, j:j + 4],
        cons["Sigma"][1].reshape(draws, 4, order="F"), rtol=1e-6,
    )
    # the adaptation block stansummary expects is present
    text = open(paths[0]).read()
    assert "# Step size = 0.37" in text
    assert "# Diagonal elements of inverse mass matrix:" in text


def test_end_to_end_from_sampler(tmp_path):
    from math_tpu.infer import sample_nuts
    from math_tpu.models import eight_schools

    m = eight_schools.make()
    res = sample_nuts(
        m.logp, jax.random.PRNGKey(0), dim=m.dim,
        num_warmup=150, num_samples=100, num_chains=2,
    )
    cons = {k: np.asarray(v) for k, v in m.transform_draws(res.position).items()}
    lp = np.asarray(
        jax.vmap(jax.vmap(m.logp))(jnp.asarray(res.position))
    )
    paths = write_stan_csv(
        str(tmp_path / "fit"), cons,
        sampler_stats={
            "lp": lp,
            "accept_prob": np.asarray(res.stats.accept_prob),
            "tree_depth": np.asarray(res.stats.tree_depth),
            "n_leapfrog": np.asarray(res.stats.n_leapfrog),
            "diverging": np.asarray(res.stats.diverging),
            "energy": np.asarray(res.stats.energy),
        },
        step_size=np.asarray(res.step_size),
        inv_mass=np.asarray(res.inv_mass),
    )
    names, mat = read_stan_csv(paths[0])
    assert mat.shape[0] == 100
    mu_col = mat[:, names.index("mu")]
    np.testing.assert_allclose(mu_col, cons["mu"][0], rtol=1e-6)
    # tau is the constrained (positive) value
    assert (mat[:, names.index("tau")] > 0).all()
