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


def test_expectation_covariance_matches_bootstrap():
    """mbar_expectations' enthalpy errors (augmented-state covariance,
    VERDICT round-2 item 5b) match a bootstrap of <u_K>_K - <u_0>_0 and
    of the entropy combination on the gaussian ladder."""
    from openmmtools_tpu.multistate.mbar import mbar_expectations

    rng = np.random.default_rng(2)
    u_kn, n_k = _draw_u_kn(rng)
    res = mbar_free_energies(u_kn, n_k)
    h, cov_hh, cov_hf, t_ff = [np.asarray(a) for a in mbar_expectations(
        u_kn, n_k, res.free_energies, u_kn)]
    # analytic <u_k>_k for a 1-D gaussian: 0.5 kT
    np.testing.assert_allclose(h, 0.5, atol=0.05)
    i, j = 0, len(K_VALS) - 1
    dh = h[j] - h[i]
    var_dh = cov_hh[i, i] + cov_hh[j, j] - 2 * cov_hh[i, j]
    f = np.asarray(res.free_energies)
    ds = dh - (f[j] - f[i])
    var_df = t_ff[i, i] + t_ff[j, j] - 2 * t_ff[i, j]
    cov_cross = (cov_hf[j, j] - cov_hf[j, i] - cov_hf[i, j] + cov_hf[i, i])
    var_ds = var_dh + var_df - 2 * cov_cross

    # bootstrap both quantities
    n = N_PER_STATE
    dhs, dss = [], []
    for b in range(60):
        cols = np.concatenate([
            k * n + rng.integers(0, n, n) for k in range(len(K_VALS))])
        ub = u_kn[:, cols]
        rb = mbar_free_energies(ub, n_k, compute_theta=False)
        hb, _, _, _ = mbar_expectations(ub, n_k, rb.free_energies, ub)
        hb = np.asarray(hb)
        fb = np.asarray(rb.free_energies)
        dhs.append(hb[j] - hb[i])
        dss.append(hb[j] - hb[i] - (fb[j] - fb[i]))
    boot_dh = float(np.std(dhs, ddof=1))
    boot_ds = float(np.std(dss, ddof=1))
    assert 0.55 * boot_dh < math.sqrt(var_dh) < 1.8 * boot_dh, (
        math.sqrt(var_dh), boot_dh)
    assert 0.55 * boot_ds < math.sqrt(max(var_ds, 0.0)) < 1.8 * boot_ds, (
        math.sqrt(max(var_ds, 0.0)), boot_ds)


def _replication(mus, sigs, ns, reps=60, seed=0):
    """Replication spread + mean reported ddf for arbitrary gaussian states
    (states with n=0 contribute no samples — the zero-sample-column MBAR
    regime of real alchemical ladders)."""
    rng = np.random.default_rng(seed)
    dfs, ddfs = [], []
    for _ in range(reps):
        xs = [rng.normal(m, s, n) for m, s, n in zip(mus, sigs, ns) if n > 0]
        x = np.concatenate(xs)
        u_kn = np.stack([0.5 * ((x - m) / s) ** 2 + math.log(s)
                         for m, s in zip(mus, sigs)])
        res = mbar_free_energies(u_kn, np.asarray(ns, float))
        df, ddf = res.delta_f(0, len(mus) - 1)
        dfs.append(float(df))
        ddfs.append(float(ddf))
    return float(np.std(dfs, ddof=1)), float(np.mean(ddfs))


def test_theta_poor_overlap_regime():
    """Overlap << 0.1 (mean separation 6 sigma): the regime where real
    alchemical ladders live (VERDICT round-2 weak #7). The pinv-based
    estimator must stay within 2x of the true replication spread."""
    spread, ddf = _replication([0.0, 6.0], [1.0, 1.0], [200, 200], seed=3)
    assert 0.5 * spread < ddf < 2.0 * spread, (ddf, spread)


def test_theta_zero_sample_bridge_state():
    """An exact-zero n_k column in the middle of the ladder (unsampled
    bridge state) must not corrupt the endpoint uncertainty."""
    spread, ddf = _replication([0.0, 3.0, 6.0], [1.0, 1.0, 1.0],
                               [300, 0, 300], seed=4)
    assert 0.5 * spread < ddf < 2.0 * spread, (ddf, spread)


def test_theta_zero_sample_endpoint_state():
    """Pure-reweighting endpoint (n_K = 0, the unsampled endpoint-state
    use case): uncertainty within 2x of the replication spread."""
    spread, ddf = _replication([0.0, 2.0], [1.0, 1.0], [400, 0], seed=5)
    assert 0.5 * spread < ddf < 2.0 * spread, (ddf, spread)


def test_theta_no_overlap_fails_loud():
    """With essentially ZERO overlap (10 sigma separation) the f32
    cross-state weights underflow to exactly 0 — the sample graph is
    disconnected and the naive pinv returns a silently confident ~0
    covariance.  The estimator must detect the disconnection (null-space
    dim > 1) and report +inf / enormous ddf, never a small number."""
    spread, ddf = _replication([0.0, 10.0], [1.0, 1.0], [300, 300],
                               reps=10, seed=6)
    assert ddf > 10.0 or math.isinf(ddf) or math.isnan(ddf), ddf


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
