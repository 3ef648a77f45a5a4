"""ESS / R-hat estimator sanity on processes with known answers."""

import numpy as np

from math_tpu.diagnostics import ess, ess_bulk, ess_tail, rhat, split_rhat, summary


def _ar1(rng, m, n, phi):
    x = np.zeros((m, n))
    e = rng.normal(size=(m, n))
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + np.sqrt(1 - phi**2) * e[:, t]
    return x


def test_iid_ess_near_total():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 2000))
    e = ess(x)
    assert 0.75 * 8000 < e < 1.35 * 8000
    assert 0.7 * 8000 < ess_bulk(x) < 1.4 * 8000


def test_ar1_ess_matches_theory():
    rng = np.random.default_rng(1)
    phi = 0.8
    x = _ar1(rng, 8, 8000, phi)
    # tau = (1+phi)/(1-phi) = 9 -> ESS ~ total/9
    total = 8 * 8000
    want = total * (1 - phi) / (1 + phi)
    got = ess(x)
    assert 0.6 * want < got < 1.6 * want, (got, want)


def test_rhat_mixed_vs_unmixed():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 1000))
    assert rhat(x) < 1.01
    assert split_rhat(x) < 1.01
    y = x + np.array([0.0, 0.0, 3.0, 3.0])[:, None]
    assert rhat(y) > 1.5
    assert split_rhat(y) > 1.5


def test_within_chain_trend_detected_by_split():
    # a strong within-chain trend: plain rhat over whole chains misses it
    n = 1000
    x = np.linspace(-3, 3, n)[None, :].repeat(4, axis=0)
    x = x + np.random.default_rng(3).normal(size=(4, n)) * 0.1
    assert split_rhat(x) > 1.5


def test_ess_tail_and_summary():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 500, 3))
    t = ess_tail(x)
    assert t.shape == (3,)
    assert (t > 200).all()
    rows = summary(x, names=["a", "b", "c"])
    assert rows[0]["name"] == "a"
    assert abs(rows[1]["mean"]) < 0.1
    assert all(r["rhat"] < 1.02 for r in rows)
