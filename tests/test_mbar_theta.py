"""Direct validation of the MBAR uncertainty estimator (theta).

Round-1 verdict: theta was only exercised indirectly through 6-sigma
thresholds. Here the asymptotic covariance is pinned two independent
ways on analytically tractable gaussian states:

* against a BOOTSTRAP of the full MBAR estimate over resampled data
  (the model-free uncertainty), and
* against the spread of the MBAR point estimate over many independent
  replications (the true sampling error).

The reference keeps pymbar as its uncertainty oracle (SURVEY §2.2);
pymbar is not in this image, so the replication test plays that role.
"""
import math

import numpy as np
import pytest

from openmmtools_tpu.multistate.mbar import mbar_free_energies

K_VALS = np.asarray([1.0, 2.5, 6.0])
N_PER_STATE = 800


def _draw_u_kn(rng, n=N_PER_STATE):
    xs = [rng.normal(0, 1.0 / math.sqrt(k), n) for k in K_VALS]
    x = np.concatenate(xs)
    u_kn = np.stack([0.5 * k * x**2 for k in K_VALS])
    n_k = np.full(len(K_VALS), n)
    return u_kn, n_k


def test_theta_matches_bootstrap():
    rng = np.random.default_rng(0)
    u_kn, n_k = _draw_u_kn(rng)
    res = mbar_free_energies(u_kn, n_k)
    df, ddf = res.delta_f(0, len(K_VALS) - 1)
    analytic = -0.5 * math.log(K_VALS[0] / K_VALS[-1])
    assert abs(float(df) - analytic) < 6 * max(float(ddf), 1e-3)

    # bootstrap: resample within each state block, re-solve MBAR
    n_boot = 60
    dfs = []
    n = N_PER_STATE
    for b in range(n_boot):
        cols = np.concatenate([
            k * n + rng.integers(0, n, n) for k in range(len(K_VALS))])
        res_b = mbar_free_energies(u_kn[:, cols], n_k, compute_theta=False)
        f = np.asarray(res_b.free_energies)
        dfs.append(f[-1] - f[0])
    boot_std = float(np.std(dfs, ddof=1))
    # asymptotic theta and bootstrap agree within a factor ~1.6
    assert 0.6 * boot_std < float(ddf) < 1.6 * boot_std, (
        float(ddf), boot_std)


def test_theta_matches_replication_spread():
    rng = np.random.default_rng(1)
    n_rep = 40
    dfs, ddfs = [], []
    for r in range(n_rep):
        u_kn, n_k = _draw_u_kn(rng, n=400)
        res = mbar_free_energies(u_kn, n_k)
        df, ddf = res.delta_f(0, len(K_VALS) - 1)
        dfs.append(float(df))
        ddfs.append(float(ddf))
    true_std = float(np.std(dfs, ddof=1))
    mean_ddf = float(np.mean(ddfs))
    # the reported uncertainty tracks the true sampling error
    assert 0.6 * true_std < mean_ddf < 1.6 * true_std, (mean_ddf, true_std)
    # and the point estimates are unbiased within error
    analytic = -0.5 * math.log(K_VALS[0] / K_VALS[-1])
    assert abs(np.mean(dfs) - analytic) < 4 * true_std / math.sqrt(n_rep)
