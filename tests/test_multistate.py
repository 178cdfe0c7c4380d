"""Multistate sampler validation (analog of reference tests/test_sampling.py):
analytic harmonic-oscillator free energies via MBAR, checkpoint/resume,
mixing, sharding."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.constants import kB
from openmmtools_tpu.mcmc import LangevinDynamicsMove
from openmmtools_tpu.models import HarmonicOscillator
from openmmtools_tpu.multistate import (
    MultiStateReporter,
    MultiStateSampler,
    MultiStateSamplerAnalyzer,
    ParallelTemperingSampler,
    ReplicaExchangeSampler,
    SAMSSampler,
    mbar_free_energies,
)
from openmmtools_tpu.multistate.mbar import bar_free_energy, exp_free_energy
from openmmtools_tpu.states import SamplerState, create_thermodynamic_state_protocol

TEMP = 300.0
KT = kB * TEMP

# soft oscillator ladder: K_k in kJ/mol/nm^2 (reference test_sampling.py:93
# uses a spring-constant ladder with analytically-known f_k)
K_LADDER = [100.0, 200.0, 400.0, 800.0]


def _analytic_f(K):
    """Dimensionless configurational free energy of a 3D harmonic well."""
    return -1.5 * math.log(2.0 * math.pi * KT / K)


def _make_states():
    ho = HarmonicOscillator(K=K_LADDER[0])
    ref = ho.thermodynamic_state(TEMP)
    states = create_thermodynamic_state_protocol(
        ref, protocol={"testsystems_HarmonicOscillator_K": K_LADDER})
    return ho, states


def _move(n_steps=20):
    return LangevinDynamicsMove(timestep=0.01, collision_rate=5.0,
                                n_steps=n_steps)


def test_mbar_analytic_gaussian():
    """MBAR on synthetic gaussian data reproduces analytic Delta f."""
    rng = np.random.default_rng(0)
    n = 2000
    k_vals = np.asarray([1.0, 4.0])
    # samples from 1D gaussians with variance kT/K (beta=1, kT=1 units)
    x0 = rng.normal(0, 1.0 / math.sqrt(k_vals[0]), n)
    x1 = rng.normal(0, 1.0 / math.sqrt(k_vals[1]), n)
    x = np.concatenate([x0, x1])
    u_kn = np.stack([0.5 * k * x**2 for k in k_vals])
    res = mbar_free_energies(u_kn, np.asarray([n, n]))
    df, ddf = res.delta_f(0, 1)
    analytic = -0.5 * math.log(k_vals[0] / k_vals[1])
    assert abs(float(df) - analytic) < 6 * max(float(ddf), 1e-3), (
        float(df), analytic, float(ddf))


def test_bar_and_exp_estimators():
    """BAR/EXP on gaussian work distributions: w ~ N(df + s^2/2, s^2)
    (Crooks) gives back df."""
    rng = np.random.default_rng(1)
    df_true, s = 2.0, 1.0
    w_f = rng.normal(df_true + s**2 / 2, s, 4000)
    w_r = rng.normal(-df_true + s**2 / 2, s, 4000)
    df, ddf = bar_free_energy(jnp.asarray(w_f), jnp.asarray(w_r))
    assert abs(float(df) - df_true) < 6 * max(float(ddf), 0.02)
    df_exp, _ = exp_free_energy(jnp.asarray(w_f))
    assert abs(float(df_exp) - df_true) < 0.3  # EXP is biased but close here


@pytest.mark.parametrize("scheme", ["swap-all", "swap-neighbors"])
def test_replica_exchange_harmonic_ladder(tmp_path, scheme):
    """REMD over a K-ladder reproduces analytic free energies (reference
    TestHarmonicOscillatorsMultiStateSampler, test_sampling.py:93-330)."""
    ho, states = _make_states()
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=300,
        replica_mixing_scheme=scheme, online_analysis_interval=None,
        rng_seed=42)
    reporter = MultiStateReporter(str(tmp_path / f"remd_{scheme}.h5"),
                                  checkpoint_interval=100)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    assert sampler.iteration == 300

    # swaps actually happened
    assert int(np.asarray(sampler._carry.n_proposed).sum()) > 0
    assert int(np.asarray(sampler._carry.n_accepted).sum()) > 0

    analyzer = MultiStateSamplerAnalyzer(reporter)
    df, ddf = analyzer.get_free_energy()
    for k in range(1, len(K_LADDER)):
        analytic = _analytic_f(K_LADDER[k]) - _analytic_f(K_LADDER[0])
        err = max(6 * ddf[0, k], 0.15)
        assert abs(df[0, k] - analytic) < err, (
            f"state {k}: df={df[0, k]:.3f} analytic={analytic:.3f} "
            f"+- {ddf[0, k]:.3f}")
    reporter.close()


def test_analyzer_enthalpy_entropy(tmp_path):
    """get_enthalpy / get_entropy on the harmonic ladder: <u>_k = 3/2
    exactly for EVERY stiffness K (equipartition in reduced units), so
    Delta H ~ 0 and Delta S ~ -Delta f analytically; errors come from the
    augmented-state MBAR expectation covariance (multistateanalyzer.py:
    1988-2024) and must be positive, finite, and honest at the 6-sigma
    level."""
    ho, states = _make_states()
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=300,
        online_analysis_interval=None, rng_seed=11)
    reporter = MultiStateReporter(str(tmp_path / "hs.h5"),
                                  checkpoint_interval=100)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()

    analyzer = MultiStateSamplerAnalyzer(reporter)
    df, ddf = analyzer.get_free_energy()
    dh, ddh = analyzer.get_enthalpy()
    ds, dds = analyzer.get_entropy()
    k_last = len(K_LADDER) - 1

    # identity: ds = dh - df entry-wise
    np.testing.assert_allclose(ds, dh - df, atol=1e-10)
    # error structure: zero diagonal, positive finite off-diagonal
    for name, err in (("ddh", ddh), ("dds", dds)):
        assert np.all(np.isfinite(err)), name
        assert np.allclose(np.diag(err), 0.0), name
        off = err[~np.eye(err.shape[0], dtype=bool)]
        assert np.all(off > 0), name
    # analytic: <u>_k = 3/2 for every K -> Delta H ~ 0
    assert abs(dh[0, k_last]) < max(6 * ddh[0, k_last], 0.2), (
        dh[0, k_last], ddh[0, k_last])
    # and Delta S ~ -Delta f
    analytic_df = _analytic_f(K_LADDER[k_last]) - _analytic_f(K_LADDER[0])
    assert abs(ds[0, k_last] + analytic_df) < max(6 * dds[0, k_last], 0.25)
    reporter.close()


def test_checkpoint_resume(tmp_path):
    ho, states = _make_states()
    path = str(tmp_path / "resume.h5")
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=60,
        online_analysis_interval=None, rng_seed=1)
    reporter = MultiStateReporter(path, checkpoint_interval=10)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run(40)
    energies_40 = sampler.energies_last_iteration
    reporter.close()

    reporter2 = MultiStateReporter(path, checkpoint_interval=10)
    resumed = ReplicaExchangeSampler.from_storage(reporter2)
    assert resumed.iteration == 40
    assert resumed.n_states == 4
    assert resumed.n_replicas == 4
    # online-analysis history restored from storage (VERDICT round-2
    # item 8): rows 0..40 present, matching the stored energies
    assert len(resumed._energy_history) == 41
    u_stored, _ = reporter2.read_energies(slice(0, 41))
    np.testing.assert_allclose(
        np.stack(resumed._energy_history), np.asarray(u_stored),
        rtol=1e-6)
    resumed.run(20)
    assert resumed.iteration == 60
    assert np.all(np.isfinite(resumed.energies_last_iteration))
    reporter2.close()


def test_reporter_uuid_mismatch(tmp_path):
    p1 = str(tmp_path / "a.h5")
    p2 = str(tmp_path / "b.h5")
    r1 = MultiStateReporter(p1).open("w")
    r2 = MultiStateReporter(p2).open("w")
    r1.close()
    r2.close()
    # cross-wire the checkpoint file
    bad = MultiStateReporter(p1, checkpoint_storage=str(
        tmp_path / "b_checkpoint.h5"))
    with pytest.raises(IOError):
        bad.open("r")


def test_sams_logZ_converges():
    """SAMS on the ladder: logZ estimates drift toward -f_k."""
    ho, states = _make_states()
    sampler = SAMSSampler(
        mcmc_moves=_move(), number_of_iterations=600,
        state_update_scheme="global-jump", flatness_criteria="minimum-visits",
        minimum_visits=20, weight_update_method="rao-blackwellized",
        gamma0=0.25, online_analysis_interval=None, rng_seed=3)
    sampler.create(states, SamplerState(positions=ho.positions))
    sampler.run()
    logZ = sampler.logZ
    assert np.all(np.isfinite(logZ))
    # logZ_k converges to -(f_k - f_0)
    f_expected = np.asarray([_analytic_f(K) - _analytic_f(K_LADDER[0])
                             for K in K_LADDER])
    assert np.all(np.diff(logZ) < 0), logZ  # tighter wells: lower logZ
    assert np.allclose(logZ, -f_expected, atol=0.5), (logZ, -f_expected)
    # adaptation should have produced a roughly flat histogram
    hist = sampler._histogram
    assert hist.min() > 0.5 * hist.mean()


def test_sams_batched_matches_host():
    """iterations_per_sync > 1 folds the SAMS logZ adaptation into the
    device program; same seed must reproduce the host-side per-iteration
    path (logZ to f32 accumulation, identical stage switches and
    histograms) — VERDICT round-2 item 6."""
    ho, states = _make_states()

    def make(ips):
        s = SAMSSampler(
            mcmc_moves=_move(n_steps=5), number_of_iterations=30,
            state_update_scheme="global-jump",
            flatness_criteria="minimum-visits", minimum_visits=2,
            weight_update_method="rao-blackwellized", gamma0=0.5,
            online_analysis_interval=None, rng_seed=7,
            iterations_per_sync=ips)
        s.create(states, SamplerState(positions=ho.positions))
        return s

    # (a) exact one-step equivalence: the device adapt step reproduces the
    # host update from the identical carry (iteration-level trajectories
    # diverge after a few steps because f32-vs-f64 weight rounding can
    # flip a categorical draw — chaotic, not a defect)
    host = make(1)
    dev = make(1)
    for step in range(3):
        import jax.numpy as jnp

        adapt = {
            "logZ_base": jnp.asarray(dev._logZ, jnp.float32),
            "logZ_delta": jnp.zeros(len(K_LADDER), jnp.float32),
            "hist": jnp.asarray(dev._histogram, jnp.int32),
            "stage": jnp.asarray(dev._stage, jnp.int32),
            "t0": jnp.asarray(dev._t0, jnp.int32),
            "t": jnp.asarray(dev._iteration, jnp.int32),
        }
        host.run(1)
        # replay the same post-iteration carry through the device step
        dev._carry = host._carry
        dev._iteration = host._iteration
        out = dev._adapt_step_device(adapt, host._carry)
        out["logZ"] = out["logZ_base"] + out["logZ_delta"]
        np.testing.assert_allclose(np.asarray(out["logZ"]), host._logZ,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out["hist"]),
                                      host._histogram)
        assert int(out["stage"]) == host._stage
        assert int(out["t0"]) == host._t0
        dev._logZ = np.asarray(out["logZ"], np.float64)
        dev._histogram = np.asarray(out["hist"], np.int64)
        dev._stage = int(out["stage"])
        dev._t0 = int(out["t0"])

    # (b) the batched program runs whole sync windows and adapts sanely
    batched = make(5)
    batched.run(20)
    assert batched._iteration == 20
    assert np.all(np.isfinite(batched.logZ))
    assert batched._histogram.sum() == 20 * len(K_LADDER)
    assert batched._stage == 1  # minimum-visits=2 reached within 20 iters

    # (c) late-stage underflow guard: with |logZ| ~ 100 and gamma ~ 1e-5
    # the f32 ulp equals the increment — the base+delta split must still
    # accumulate it (a single f32 accumulator silently stalls here)
    import jax.numpy as jnp

    k = len(K_LADDER)
    dev2 = make(5)
    big = np.zeros(k)
    big[1:] = -100.0
    t_now = 200_000
    adapt = {
        "logZ_base": jnp.asarray(big, jnp.float32),
        "logZ_delta": jnp.zeros(k, jnp.float32),
        "hist": jnp.full((k,), 100, jnp.int32),
        "stage": jnp.asarray(1, jnp.int32),
        "t0": jnp.asarray(100, jnp.int32),
        "t": jnp.asarray(t_now, jnp.int32),
    }
    out = dev2._adapt_step_device(adapt, dev2._carry)
    gamma = 1.0 / (t_now + 1 - 100 + 1.0 / dev2.gamma0)
    states = np.asarray(dev2._carry.replica_states)
    moved = np.unique(states[states > 0])  # state 0 is the re-reference
    delta = np.asarray(out["logZ_delta"])
    assert gamma < 2e-5  # the regime where f32 += stalls
    assert np.all(np.abs(delta[moved]) > 0.5 * gamma), (delta, moved)


def test_parallel_tempering_energy_path():
    """PT's O(N) beta-rescaled energies match the generic path."""
    ho = HarmonicOscillator(K=200.0)
    ref = ho.thermodynamic_state(TEMP)
    sampler = ParallelTemperingSampler(
        mcmc_moves=_move(), number_of_iterations=10,
        online_analysis_interval=None, rng_seed=4)
    sampler.create(ref, SamplerState(positions=ho.positions),
                   min_temperature=250.0, max_temperature=400.0,
                   n_temperatures=4)
    assert sampler.n_states == 4
    sampler.run()
    u = sampler.energies_last_iteration
    # cross-check: u[n, k] = beta_k * U_n
    temps = np.asarray(sampler._stacked_sampled.temperature)
    betas = 1.0 / (kB * temps)
    for n in range(sampler.n_replicas):
        U_n = u[n, 0] / betas[0]
        assert np.allclose(u[n], betas * U_n, rtol=1e-5)


def test_parallel_tempering_per_state_moves():
    """PT honors heterogeneous per-state moves via the same lax.switch
    dispatch as the base sampler (previously its O(N)-energy override
    silently propagated every state with moves[0])."""
    ho = HarmonicOscillator(K=200.0)
    ref = ho.thermodynamic_state(TEMP)
    moves = [_move(n_steps=2), _move(n_steps=4), _move(n_steps=6)]
    sampler = ParallelTemperingSampler(
        mcmc_moves=moves, number_of_iterations=4,
        online_analysis_interval=None, rng_seed=7)
    sampler.create(ref, SamplerState(positions=ho.positions),
                   min_temperature=250.0, max_temperature=400.0,
                   n_temperatures=3)
    sampler.run()
    u = sampler.energies_last_iteration
    assert np.all(np.isfinite(u))
    temps = np.asarray(sampler._stacked_sampled.temperature)
    betas = 1.0 / (kB * temps)
    for n in range(sampler.n_replicas):
        U_n = u[n, 0] / betas[0]
        assert np.allclose(u[n], betas * U_n, rtol=1e-5)


def test_sharded_replica_mesh():
    """8 replicas sharded over an 8-device CPU mesh run identically shaped
    programs (the dryrun_multichip pattern)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ho, states = _make_states()
    # 8 replicas over 4 states
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("replica",))
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(n_steps=5), number_of_iterations=3,
        online_analysis_interval=None, rng_seed=5)
    sampler.create(states, [SamplerState(positions=ho.positions)
                            for _ in range(8)],
                   initial_thermodynamic_states=[0, 1, 2, 3, 0, 1, 2, 3],
                   mesh=mesh)
    sampler.run()
    assert sampler.iteration == 3
    assert np.all(np.isfinite(sampler.energies_last_iteration))


def test_online_analysis_and_stop(tmp_path):
    ho, states = _make_states()
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=100,
        online_analysis_interval=20, online_analysis_minimum_iterations=20,
        online_analysis_target_error=50.0,  # absurdly loose -> early stop
        rng_seed=6)
    sampler.create(states, SamplerState(positions=ho.positions))
    sampler.run()
    # stopped early once online error (always < 50 kT) was evaluated
    assert sampler.iteration <= 40
    assert sampler._last_err_free_energy is not None


def test_unsampled_endpoint_states(tmp_path):
    """Unsampled (endpoint) thermodynamic states get energy columns and MBAR
    free energies with zero samples (multistateanalyzer.py:1479-1554 path)."""
    ho, states = _make_states()
    # unsampled endpoints: stiffer wells never simulated
    ref = states[0]
    unsampled = [ref.replace(global_params={
                    "testsystems_HarmonicOscillator_K": jnp.asarray(k)})
                 for k in (1600.0, 3200.0)]
    reporter = MultiStateReporter(str(tmp_path / "unsampled.h5"),
                                  checkpoint_interval=100)
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=300,
        online_analysis_interval=None, rng_seed=9)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter,
                   unsampled_thermodynamic_states=unsampled)
    sampler.run()
    assert sampler.energies_last_iteration.shape == (4, 6)

    analyzer = MultiStateSamplerAnalyzer(reporter)
    df, ddf = analyzer.get_free_energy()
    assert df.shape == (6, 6)
    for k_idx, K in ((4, 1600.0), (5, 3200.0)):
        analytic = _analytic_f(K) - _analytic_f(K_LADDER[0])
        err = max(6 * ddf[0, k_idx], 0.25)
        assert abs(df[0, k_idx] - analytic) < err, (
            k_idx, df[0, k_idx], analytic, ddf[0, k_idx])
    reporter.close()


def test_per_state_heterogeneous_moves():
    """A list of per-state moves (reference multistatesampler.py:63) is
    honored — each state propagates under its own move program (lax.switch
    in the fused iteration), not silently truncated to moves[0]."""
    from openmmtools_tpu.mcmc import GHMCMove

    ho, states = _make_states()
    moves = [
        _move(20), _move(25),
        LangevinDynamicsMove(timestep=0.005, collision_rate=2.0, n_steps=30),
        GHMCMove(timestep=0.005, collision_rate=5.0, n_steps=15),
    ]
    sampler = ReplicaExchangeSampler(
        mcmc_moves=moves, number_of_iterations=200,
        online_analysis_interval=None, rng_seed=3)
    sampler.create(states, SamplerState(positions=ho.positions))
    sampler.run()
    assert sampler.iteration == 200
    assert int(np.asarray(sampler._carry.n_accepted).sum()) > 0

    # distribution sanity: MBAR over the heterogeneous ladder still
    # reproduces the analytic free energies
    res = mbar_free_energies(
        np.asarray(sampler._energy_history).reshape(-1, 4).T,
        np.full(4, len(sampler._energy_history)))
    for k in range(1, len(K_LADDER)):
        analytic = _analytic_f(K_LADDER[k]) - _analytic_f(K_LADDER[0])
        df, ddf = res.delta_f(0, k)
        assert abs(float(df) - analytic) < max(6 * float(ddf), 0.2), (
            k, float(df), analytic)

    # wrong length is an error, not silent truncation
    bad = ReplicaExchangeSampler(mcmc_moves=moves[:2],
                                 number_of_iterations=1, rng_seed=3)
    with pytest.raises(ValueError):
        bad.create(states, SamplerState(positions=ho.positions))


def test_unsampled_endpoint_different_system(tmp_path):
    """Unsampled endpoint states whose SYSTEM differs structurally from the
    sampled one (the reference's expanded-cutoff endpoint trick,
    multistateanalyzer.py:1479-1554, multistatereporter.py:612): evaluated
    with their own bound energy functions outside the stacked vmap.

    Oracle: PowerOscillator(b=2) with U = K_p r^2 is a harmonic well with
    K_eq = 2 K_p, so the MBAR free energy of the unsampled endpoint is
    analytic."""
    from openmmtools_tpu.models import PowerOscillator

    ho, states = _make_states()
    po = PowerOscillator(K=2.0, b=2)     # K_eq = 2 * po.K kJ/mol/nm^2
    k_eq = 2.0 * po.K
    unsampled = [po.thermodynamic_state(TEMP)]
    assert ho.system.terms[0].expression != po.system.terms[0].expression

    reporter = MultiStateReporter(str(tmp_path / "uns_diff.h5"),
                                  checkpoint_interval=100)
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=300,
        online_analysis_interval=None, rng_seed=11)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter,
                   unsampled_thermodynamic_states=unsampled)
    assert sampler._unsampled_separate
    sampler.run()
    assert sampler.energies_last_iteration.shape == (4, 5)

    # the unsampled column is the endpoint state's own reduced potential
    for n, ss in enumerate(sampler.sampler_states):
        u_direct = float(unsampled[0].reduced_potential(ss))
        assert abs(sampler.energies_last_iteration[n, 4] - u_direct) < 1e-4

    analyzer = MultiStateSamplerAnalyzer(reporter)
    df, ddf = analyzer.get_free_energy()
    assert df.shape == (5, 5)
    analytic = _analytic_f(k_eq) - _analytic_f(K_LADDER[0])
    err = max(6 * ddf[0, 4], 0.25)
    assert abs(df[0, 4] - analytic) < err, (df[0, 4], analytic, ddf[0, 4])

    # resume round-trips the two different systems through storage
    resumed = ReplicaExchangeSampler.from_storage(reporter)
    assert resumed._unsampled_separate
    resumed.run(2)
    assert resumed.energies_last_iteration.shape == (4, 5)
    reporter.close()


def test_analysis_positions_stored(tmp_path):
    ho, states = _make_states()
    reporter = MultiStateReporter(str(tmp_path / "apos.h5"),
                                  checkpoint_interval=100,
                                  analysis_particle_indices=[0])
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=5,
        online_analysis_interval=None, rng_seed=2)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    pos = reporter.read_analysis_positions()
    assert pos.shape == (6, 4, 1, 3)  # iterations 0..5, 4 replicas, 1 atom
    reporter.close()


def test_restraint_unbiasing(tmp_path):
    """Restraint unbiasing: a harmonically-restrained free particle pair;
    removing the restraint analytically changes the reduced free energy, and
    the unbiased end state plus standard-state correction recovers it
    (multistateanalyzer.py:1556-1917 pipeline)."""
    from openmmtools_tpu.forces import HarmonicRestraintBondForce
    from openmmtools_tpu.models import IdealGas

    gas = IdealGas(nparticles=2)
    restraint = HarmonicRestraintBondForce(spring_constant=jnp.asarray(400.0),
                                           atom1=0, atom2=1)
    system = gas.system.replace(terms=gas.system.terms + (restraint,))
    from openmmtools_tpu.states import ThermodynamicState

    states = [ThermodynamicState(system, jnp.asarray(TEMP),
                                 global_params={"lambda_restraints": 1.0}),
              ThermodynamicState(system, jnp.asarray(TEMP),
                                 global_params={"lambda_restraints": 1.0})]
    reporter = MultiStateReporter(str(tmp_path / "rest.h5"),
                                  checkpoint_interval=100,
                                  analysis_particle_indices=[0, 1])
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(n_steps=20), number_of_iterations=200,
        online_analysis_interval=None, rng_seed=7)
    sampler.create(states, gas.sampler_state(), storage=reporter)
    sampler.run()

    analyzer = MultiStateSamplerAnalyzer(
        reporter, unbias_restraint=True,
        restraint_force=restraint, restraint_energy_cutoff=None)
    u_ln, n_k = analyzer._decorrelated_u_ln_and_n_k()
    assert u_ln.shape[0] == 4  # 2 sampled + 2 unbiased end states
    assert n_k[-1] == 0 and n_k[-2] == 0
    df, ddf = analyzer.get_free_energy()
    assert df.shape == (4, 4)
    assert np.all(np.isfinite(df))
    # unbiased state has LOWER reduced free energy... the restraint confines:
    # removing it increases entropy, so f_unbiased < f_biased... in reduced
    # potentials u_unbiased = u - u_rest <= u, so f decreases
    assert df[0, -1] < 0.5


def test_locality_windowed_energies():
    """locality=L: exactly the clipped 2L+1 window around each replica's
    state is computed; every other entry is +inf
    (multistatesampler.py:1263-1281 semantics)."""
    ho, states = _make_states()
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(n_steps=5), number_of_iterations=3,
        replica_mixing_scheme=None,  # keep replicas at their states
        locality=1, online_analysis_interval=None, rng_seed=11)
    sampler.create(states, SamplerState(positions=ho.positions))
    sampler.run()
    u = sampler.energies_last_iteration
    s = sampler.replica_states
    k_states, window = 4, 3
    for n in range(4):
        start = int(np.clip(s[n] - 1, 0, k_states - window))
        for k in range(k_states):
            if start <= k < start + window:
                assert np.isfinite(u[n, k]), (n, k, s[n])
            else:
                assert u[n, k] == np.inf, (n, k, s[n])
    # at least one replica's window is clipped away from some state
    assert np.any(~np.isfinite(u))


def test_swap_all_mixing_chi2_uniform():
    """Under zero energies the swap-all kernel's stationary distribution
    over (replica, state) assignments is uniform — chi^2 test mirroring
    reference tests/test_mixing.py:78-96."""
    from openmmtools_tpu.multistate.replicaexchange import _mix_all
    from scipy.stats import chi2

    n = 5
    u = jnp.zeros((n, n))
    states = jnp.arange(n, dtype=jnp.int32)
    counts = np.zeros((n, n))
    n_trials = 400
    acc = jnp.zeros((n, n), jnp.int32)
    key = jax.random.PRNGKey(0)
    mix = jax.jit(_mix_all)
    for t in range(n_trials):
        key, sub = jax.random.split(key)
        states, acc, _ = mix(sub, states, u, acc, acc)
        counts[np.arange(n), np.asarray(states)] += 1
    expected = n_trials / n
    chi2_stat = float(((counts - expected) ** 2 / expected).sum())
    dof = n * (n - 1)
    threshold = chi2.ppf(0.999, dof)
    assert chi2_stat < threshold, (chi2_stat, threshold, counts)


def test_swap_neighbors_n_replicas_ne_n_states():
    """swap-neighbors with n_replicas != n_states: replica-of-state must
    come from an explicit scatter with validity masking, not argsort of a
    non-permutation (VERDICT round-2 weak item 4)."""
    from openmmtools_tpu.multistate.replicaexchange import _mix_neighbors

    # 3 replicas over 5 states: states 1 and 4 are unoccupied
    k_s = 5
    states = jnp.asarray([0, 2, 3], jnp.int32)
    # energies strongly favor swapping (2,3): u[1,3]+u[2,2] << u[1,2]+u[2,3]
    u = jnp.zeros((3, k_s)).at[1, 3].set(-50.0).at[2, 2].set(-50.0)
    acc = jnp.zeros((k_s, k_s), jnp.int32)
    key = jax.random.PRNGKey(0)
    saw_swap = False
    for t in range(20):
        key, sub = jax.random.split(key)
        new_states, n_acc, n_prop = _mix_neighbors(
            sub, states, u, acc, acc)
        ns = np.asarray(new_states)
        # always a permutation of the occupied states
        assert sorted(ns.tolist()) == [0, 2, 3], ns
        # pairs with an unoccupied member ((0,1), (1,2), (3,4)) never count
        np_ = np.asarray(n_prop)
        assert np_[0, 1] == 0 and np_[1, 2] == 0 and np_[3, 4] == 0
        if ns.tolist() == [0, 3, 2]:
            saw_swap = True
    # the favorable (2,3) swap fires whenever parity=0 is drawn
    assert saw_swap

    # duplicate states (N > K): swaps still produce valid state vectors
    states_dup = jnp.asarray([0, 0, 1, 2], jnp.int32)
    u_dup = jnp.zeros((4, 3))
    acc_dup = jnp.zeros((3, 3), jnp.int32)
    for t in range(10):
        key, sub = jax.random.split(key)
        out, _, _ = _mix_neighbors(sub, states_dup, u_dup, acc_dup, acc_dup)
        out = np.asarray(out)
        assert set(out.tolist()) <= {0, 1, 2}
        assert out.shape == (4,)


def test_sams_adaptation_persistence_and_resume(tmp_path):
    """SAMS logZ/histogram/stage survive checkpoint/resume — adaptation
    continues instead of restarting (reference persists via online data +
    _StoredProperty, sams.py:237-289)."""
    from openmmtools_tpu.multistate import MultiStateReporter, SAMSSampler

    ho, states = _make_states()
    reporter = MultiStateReporter(str(tmp_path / "sams.h5"),
                                  checkpoint_interval=1)
    sampler = SAMSSampler(
        mcmc_moves=_move(n_steps=5), number_of_iterations=8,
        state_update_scheme="global-jump", gamma0=2.0,
        flatness_criteria="minimum-visits", minimum_visits=2,
        online_analysis_interval=None, rng_seed=3)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run(5)
    logZ_before = sampler.logZ.copy()
    hist_before = sampler._histogram.copy()
    stage_before = sampler._stage
    reporter.close()

    reporter2 = MultiStateReporter(str(tmp_path / "sams.h5"),
                                   checkpoint_interval=1)
    resumed = SAMSSampler.from_storage(reporter2)
    assert resumed._iteration == 5
    # adaptation state restored, options too
    np.testing.assert_allclose(resumed.logZ, logZ_before, atol=1e-12)
    np.testing.assert_array_equal(resumed._histogram, hist_before)
    assert resumed._stage == stage_before
    assert resumed.gamma0 == 2.0
    assert resumed.flatness_criteria == "minimum-visits"
    # and it continues adapting from there
    resumed.run(3)
    assert resumed._histogram.sum() > hist_before.sum()
    reporter2.close()


def test_sams_vectorized_rb_update_matches_loop():
    """The vectorized rao-blackwellized logZ update equals the reference's
    per-replica loop (sams.py:655-666) with iteration-start weights."""
    from scipy.special import logsumexp

    rng = np.random.default_rng(4)
    k, n_rep = 6, 5
    u = rng.normal(0, 2, (n_rep, k))
    log_w = rng.normal(0, 1, k)
    log_pi = np.full(k, -np.log(k))
    gamma = 0.3
    # loop version
    logZ_loop = np.zeros(k)
    for n in range(n_rep):
        logp = log_w - u[n]
        logp = logp - logsumexp(logp)
        logZ_loop += gamma * np.exp(logp) / np.exp(log_pi)
    # vectorized version (as in SAMSSampler._update_logZ_estimates)
    logp = log_w[None, :] - u
    logp = logp - logsumexp(logp, axis=1, keepdims=True)
    logZ_vec = gamma * np.exp(logp).sum(axis=0) / np.exp(log_pi)
    np.testing.assert_allclose(logZ_vec, logZ_loop, rtol=1e-12)


def test_analyzer_sams_log_weight_correction(tmp_path):
    """get_effective_energy_timeseries applies the SAMS log-weight
    correction (multistateanalyzer.py:1414-1477) when weights are stored."""
    from openmmtools_tpu.multistate import MultiStateReporter, SAMSSampler
    from openmmtools_tpu.multistate.analyzer import SAMSAnalyzer
    from scipy.special import logsumexp

    ho, states = _make_states()
    reporter = MultiStateReporter(str(tmp_path / "sams2.h5"),
                                  checkpoint_interval=2)
    sampler = SAMSSampler(
        mcmc_moves=_move(n_steps=5), number_of_iterations=6,
        state_update_scheme="global-jump", online_analysis_interval=None,
        rng_seed=5)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    reporter.close()

    reporter.open("r")
    analyzer = SAMSAnalyzer(reporter)
    series = analyzer.get_effective_energy_timeseries()
    # recompute expected: plain sum + correction
    u, s = reporter.read_energies()
    lw = reporter.read_log_weights()
    f_l = -np.asarray(reporter.read_logZ(-1))
    for t in (0, 3, u.shape[0] - 1):
        plain = u[t][np.arange(u.shape[1]), s[t]].sum()
        lw_t = lw[min(t, lw.shape[0] - 1)]
        expected = plain - lw_t[s[t]].sum() + logsumexp(-f_l + lw_t)
        assert abs(series[t] - expected) < 1e-8
    reporter.close()


def test_auto_restraint_cutoff_percentile():
    """'auto' restraint cutoffs = 99.9th percentile of the bound-state
    distribution (multistateanalyzer.py:1865)."""
    from openmmtools_tpu.multistate.analyzer import MultiStateSamplerAnalyzer

    analyzer = MultiStateSamplerAnalyzer.__new__(MultiStateSamplerAnalyzer)
    analyzer.restraint_energy_cutoff = "auto"
    analyzer.restraint_distance_cutoff = None
    rng = np.random.default_rng(0)
    u_rest = rng.exponential(2.0, 5000)
    s_flat = np.zeros(5000, dtype=int)
    s_flat[2500:] = 1
    e_cut, d_cut = analyzer._resolve_restraint_cutoffs(u_rest, None, s_flat)
    assert d_cut is None
    assert abs(e_cut - np.percentile(u_rest[:2500], 99.9)) < 1e-12
    # both auto with distances available -> distance cutoff wins
    analyzer.restraint_distance_cutoff = "auto"
    d = rng.uniform(0, 1, 5000)
    e_cut, d_cut = analyzer._resolve_restraint_cutoffs(u_rest, d, s_flat)
    assert e_cut is None
    assert abs(d_cut - np.percentile(d[:2500], 99.9)) < 1e-12


def test_reporter_multi_system_dedup(tmp_path):
    """States carrying different systems round-trip through the dedup
    storage (multistatereporter.py:612 analog)."""
    from openmmtools_tpu.forces import replace_reaction_field
    from openmmtools_tpu.models import LennardJonesFluid
    from openmmtools_tpu.multistate import MultiStateReporter
    from openmmtools_tpu.states import ThermodynamicState

    f = LennardJonesFluid(nparticles=8)
    sys_a = f.system
    sys_b = replace_reaction_field(sys_a, switch_width=0.05)
    states = [ThermodynamicState(system=sys_a, temperature=120.0),
              ThermodynamicState(system=sys_a, temperature=130.0)]
    unsampled = [ThermodynamicState(system=sys_b, temperature=120.0)]
    reporter = MultiStateReporter(str(tmp_path / "dedup.h5"))
    reporter.open("w")
    reporter.write_thermodynamic_states(states, unsampled)
    got, got_uns = reporter.read_thermodynamic_states()
    reporter.close()
    assert len(got) == 2 and len(got_uns) == 1
    # dedup: the two sampled states share one system object
    assert got[0].system is got[1].system
    assert got_uns[0].system is not got[0].system
    assert got_uns[0].system.terms[0].switch_width == 0.05
    assert float(got[1].temperature) == 130.0


def test_batched_iterations_match_single(tmp_path):
    """iterations_per_sync=k scans k iterations in one device program;
    the RNG chain is identical, so the trajectory must match the
    per-iteration path bit-for-bit."""
    ho, states = _make_states()

    def run(k_sync, tag):
        reporter = MultiStateReporter(str(tmp_path / f"b{tag}.h5"),
                                      checkpoint_interval=4)
        sampler = ReplicaExchangeSampler(
            mcmc_moves=_move(n_steps=5), number_of_iterations=8,
            online_analysis_interval=None, rng_seed=7,
            iterations_per_sync=k_sync)
        sampler.create(states, SamplerState(positions=ho.positions),
                       storage=reporter)
        sampler.run()
        u = np.stack(sampler._energy_history)
        s = np.stack(sampler._state_history)
        reporter.close()
        return u, s, sampler

    u1, s1, _ = run(1, "one")
    u4, s4, smp4 = run(4, "four")
    np.testing.assert_array_equal(s1, s4)
    np.testing.assert_allclose(u1, u4, rtol=0, atol=0)
    assert smp4.iteration == 8


def test_reporter_variable_type_round_trips(tmp_path):
    """Every reporter variable family round-trips (reference
    tests/test_sampling.py:488-1020 per-type reporter coverage)."""
    from openmmtools_tpu.mcmc import (
        LangevinDynamicsMove,
        MCDisplacementMove,
        SequenceMove,
    )

    rep = MultiStateReporter(str(tmp_path / "types.h5"),
                             checkpoint_interval=2)
    rep.open("w")
    # options: heterogeneous python types
    options = {"number_of_iterations": 7, "online_analysis_interval": None,
               "locality": 3, "target_error": 0.25, "flag": True,
               "name": "remd"}
    rep.write_options(options)
    got = rep.read_options()
    for k, v in options.items():
        assert got[k] == v, (k, got[k], v)

    # mcmc moves (nested container) as yaml dicts
    moves = SequenceMove([
        LangevinDynamicsMove(timestep=0.002, collision_rate=5.0, n_steps=10),
        MCDisplacementMove(displacement_sigma=0.1),
    ])
    rep.write_mcmc_moves(moves)
    got_moves = rep.read_mcmc_moves()
    assert type(got_moves).__name__ == "SequenceMove"
    assert type(got_moves.move_list[0]).__name__ == "LangevinDynamicsMove"
    assert got_moves.move_list[0].n_steps == 10
    assert np.isclose(got_moves.move_list[1].displacement_sigma, 0.1)

    # per-iteration arrays + slicing
    for it in range(4):
        rep.write_iteration(
            iteration=it, energies=np.full((3, 4), float(it)),
            replica_states=np.arange(3) + it,
            n_accepted=np.eye(3, dtype=int) * it,
            n_proposed=np.ones((3, 3), int))
    u_all, s_all = rep.read_energies()
    assert u_all.shape == (4, 3, 4) and s_all.shape == (4, 3)
    u_slice, s_slice = rep.read_energies(slice(1, 3))
    np.testing.assert_array_equal(u_slice, u_all[1:3])
    acc, prop = rep.read_mixing_statistics(2)
    assert acc[0, 0] == 2 and prop[1, 2] == 1

    # checkpoint incl. box vectors + resume point
    x = np.random.default_rng(0).normal(size=(3, 5, 3)).astype(np.float32)
    v = x * 0.1
    box = np.diag([2.0, 2.0, 2.0]).astype(np.float32)
    rep.write_checkpoint(iteration=2, positions=x, velocities=v,
                         box_vectors=np.stack([box] * 3))
    rep.write_last_iteration(3)
    ck = rep.read_checkpoint(3)
    assert ck["iteration"] == 2
    np.testing.assert_allclose(ck["positions"], x)
    np.testing.assert_allclose(ck["velocities"], v)
    assert rep.read_last_iteration() in (2, 3)

    # online analysis arrays
    rep.write_online_analysis(3, np.array([0.0, 1.5, 3.0, 4.2]), 0.07)
    online = rep.read_online_analysis()
    assert np.isclose(online["err_free_energy"], 0.07)
    np.testing.assert_allclose(online["f_k"], [0.0, 1.5, 3.0, 4.2])

    # real-time timing YAML
    rep.write_timing(3, {"iteration_seconds": 0.5, "ns_per_day": 12.0})
    import glob
    import os

    yamls = glob.glob(os.path.join(str(tmp_path), "*.yaml"))
    assert yamls, "real-time YAML not written"
    rep.close()


def test_observables_registry_and_cache_invalidation():
    """Full ObservablesRegistry (registration, error classes, propagation)
    + CachedProperty dependency-graph invalidation
    (multistateanalyzer.py:106-444)."""
    from openmmtools_tpu.multistate.analyzer import (
        CachedProperty,
        ObservablesRegistry,
    )

    reg = ObservablesRegistry()
    assert set(reg.observables_defined_by_two_states) == {
        "free_energy", "entropy", "enthalpy"}
    reg.register_one_state_observable("volume", error_class="linear")
    reg.register_phase_observable("standard_state_correction")
    assert "volume" in reg.observables
    assert reg.error_class("volume") == "linear"
    assert np.isclose(reg.propagate_error("volume", [0.1, 0.2]), 0.3)
    assert np.isclose(reg.propagate_error("free_energy", [3.0, 4.0]), 5.0)
    assert "standard_state_correction" not in reg.observables_with_error
    with pytest.raises(ValueError):
        reg.register_phase_observable("bad", error_class="cubic")

    # invalidation cascades along the pipeline DAG
    deps = CachedProperty.dependents_of("energies")
    assert {"equil", "mbar_input", "mbar"} <= deps
    assert "energies" not in deps
    assert CachedProperty.dependents_of("mbar_input") == {"mbar"}


def test_analyzer_invalidate_on_max_iterations(tmp_path):
    ho, states = _make_states()
    reporter = MultiStateReporter(str(tmp_path / "inval.h5"),
                                  checkpoint_interval=50)
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=40,
        online_analysis_interval=None, rng_seed=5)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    analyzer = MultiStateSamplerAnalyzer(reporter)
    assert analyzer.n_iterations == 40
    f_all, _ = analyzer.get_free_energy()
    analyzer.max_n_iterations = 20          # invalidates the whole chain
    assert analyzer.n_iterations == 20
    f_half, _ = analyzer.get_free_energy()
    assert f_half.shape == f_all.shape
    reporter.close()


def test_stored_property_validators():
    """Options are _StoredProperty descriptors with validators
    (multistatesampler.py:1225-1260): bad assignments raise, good ones
    persist through _stored_options."""
    s = ReplicaExchangeSampler(number_of_iterations=5,
                               online_analysis_interval=None)
    with pytest.raises(ValueError):
        s.number_of_iterations = -1
    with pytest.raises(ValueError):
        s.online_analysis_interval = 0
    with pytest.raises(ValueError):
        s.locality = 0
    with pytest.raises(ValueError):
        s.iterations_per_sync = 0
    s.online_analysis_interval = 50
    s.locality = 2
    s.number_of_iterations = float("inf")   # reference allows np.inf
    opts = s._stored_options()
    assert opts["online_analysis_interval"] == 50
    assert opts["locality"] == 2
    assert opts["iterations_per_sync"] == 1
    assert "rng_seed" in opts


# ---------------------------------------------------------------------------
# locality end-to-end (VERDICT r3 missing #2 / next-round item 5)
# ---------------------------------------------------------------------------

def test_locality_neighborhoods_stored_and_stitched_analysis(tmp_path):
    """A locality-restricted SAMS run round-trips through storage and
    offline analysis: the reporter stores the reference's 'neighborhoods'
    mask (multistatereporter.py:899-907), the analyzer detects locality,
    get_free_energy() stitches adjacent-pair BAR instead of global MBAR,
    and the result matches both the full-matrix MBAR run and the analytic
    ladder. Full-matrix-only observables raise LocalityAnalysisError (the
    reference refuses the whole analysis, multistateanalyzer.py:892)."""
    from openmmtools_tpu.multistate.analyzer import (
        LocalityAnalysisError,
        SAMSAnalyzer,
    )

    ho, states = _make_states()
    f_expected = np.asarray([_analytic_f(K) - _analytic_f(K_LADDER[0])
                             for K in K_LADDER])

    def run_sams(locality, path):
        sampler = SAMSSampler(
            mcmc_moves=_move(), number_of_iterations=800,
            state_update_scheme="local-jump" if locality else "global-jump",
            locality=locality, flatness_criteria="minimum-visits",
            minimum_visits=10, weight_update_method="rao-blackwellized",
            gamma0=0.25, online_analysis_interval=None, rng_seed=5)
        reporter = MultiStateReporter(str(path), checkpoint_interval=200)
        sampler.create(states, SamplerState(positions=ho.positions),
                       storage=reporter)
        sampler.run()
        return reporter

    rep_loc = run_sams(1, tmp_path / "sams_loc.h5")
    rep_full = run_sams(None, tmp_path / "sams_full.h5")

    # neighborhoods dataset: correct shape, zeros outside windows, ones on
    # the sampled diagonal
    nb = rep_loc.read_neighborhoods()
    u_all, s_all = rep_loc.read_energies()
    assert nb is not None and nb.shape == u_all.shape
    assert (nb == 0).any()
    t_idx = np.arange(nb.shape[0])[:, None]
    r_idx = np.arange(nb.shape[1])[None, :]
    assert np.all(nb[t_idx, r_idx, s_all] == 1)
    # mask matches energy finiteness exactly (iteration 0 stores the FULL
    # initial matrix, so its mask is all-ones)
    assert nb[0].all()
    assert np.array_equal(nb[1:].astype(bool), np.isfinite(u_all[1:]))
    assert rep_full.read_neighborhoods() is None

    ana_loc = SAMSAnalyzer(rep_loc)
    ana_full = SAMSAnalyzer(rep_full)
    assert ana_loc.is_locality_restricted
    assert not ana_full.is_locality_restricted

    df_loc, ddf_loc = ana_loc.get_free_energy()
    df_full, ddf_full = ana_full.get_free_energy()
    for k in range(1, len(K_LADDER)):
        sigma = max(float(ddf_loc[0, k]), 0.05)
        assert abs(df_loc[0, k] - f_expected[k]) < 6 * sigma, (
            k, df_loc[0, k], f_expected[k], sigma)
        # stitched vs full-matrix MBAR agreement
        tol = 6 * max(np.hypot(ddf_loc[0, k], ddf_full[0, k]), 0.05)
        assert abs(df_loc[0, k] - df_full[0, k]) < tol

    # full-matrix-only observables fail loudly, naming locality
    with pytest.raises(LocalityAnalysisError, match="locality"):
        ana_loc.get_enthalpy()
    with pytest.raises(LocalityAnalysisError, match="locality"):
        ana_loc.get_entropy()
    # ...but the full run supports everything
    dh, _ = ana_full.get_enthalpy()
    assert np.all(np.isfinite(dh))


def test_mixing_scheme_tag(tmp_path):
    """REMD tags its counters 'metropolis-swap', SAMS 'gibbs-jump'
    (VERDICT r3 weak #5): an acceptance rate computed from SAMS counters is
    a state-change rate, and the analyzer must say so."""
    ho, states = _make_states()

    remd = ReplicaExchangeSampler(
        mcmc_moves=_move(n_steps=5), number_of_iterations=3,
        online_analysis_interval=None, rng_seed=1)
    rep1 = MultiStateReporter(str(tmp_path / "remd.h5"))
    remd.create(states, SamplerState(positions=ho.positions), storage=rep1)
    remd.run()
    assert rep1.read_mixing_scheme() == "metropolis-swap"

    sams = SAMSSampler(
        mcmc_moves=_move(n_steps=5), number_of_iterations=3,
        state_update_scheme="global-jump",
        flatness_criteria="minimum-visits", minimum_visits=1,
        online_analysis_interval=None, rng_seed=1)
    rep2 = MultiStateReporter(str(tmp_path / "sams.h5"))
    sams.create(states, SamplerState(positions=ho.positions), storage=rep2)
    sams.run()
    assert rep2.read_mixing_scheme() == "gibbs-jump"

    stats = MultiStateSamplerAnalyzer(rep2).generate_mixing_statistics()
    assert stats.scheme == "gibbs-jump"
    assert stats.transition_matrix.shape == (len(K_LADDER), len(K_LADDER))


def test_equilibrate(tmp_path):
    """Reference test_sampling.py test_equilibrate: equilibration runs full
    iterations without advancing the iteration counter or writing storage;
    substituted equilibration moves are restored afterwards."""
    ho, states = _make_states()
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=5,
        online_analysis_interval=None, rng_seed=3)
    reporter = MultiStateReporter(str(tmp_path / "eq.h5"),
                                  checkpoint_interval=5)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    x0 = np.asarray(sampler._carry.positions).copy()
    production_moves = sampler.mcmc_moves

    # equilibrate with a DIFFERENT move than production
    eq_move = _move(n_steps=5)
    sampler.equilibrate(3, mcmc_moves=eq_move)
    assert sampler.iteration == 0
    assert reporter.read_last_iteration(last_checkpoint=False) in (0, -1, None)
    assert not np.allclose(np.asarray(sampler._carry.positions), x0)
    assert sampler.mcmc_moves is production_moves

    # wrong-length move list is an error (reference RuntimeError)
    with pytest.raises(RuntimeError):
        sampler.equilibrate(1, mcmc_moves=[eq_move, eq_move])

    # uncreated sampler is an error
    fresh = ReplicaExchangeSampler(mcmc_moves=_move(),
                                   number_of_iterations=1)
    with pytest.raises(RuntimeError):
        fresh.equilibrate(1)

    # production continues normally afterwards
    sampler.run(2)
    assert sampler.iteration == 2
    reporter.close()

def test_run_extend(tmp_path):
    """Reference test_run_extend (test_sampling.py:1930): run to the
    iteration limit, extend past it, storage and counters grow."""
    ho, states = _make_states()
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(5), number_of_iterations=6,
        online_analysis_interval=None, rng_seed=5)
    reporter = MultiStateReporter(str(tmp_path / "extend.h5"),
                                  checkpoint_interval=3)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    assert sampler.iteration == 6
    sampler.run(10)  # past the limit: run() clamps at number_of_iterations
    assert sampler.iteration == 6
    sampler.extend(4)
    assert sampler.iteration == 10
    assert sampler.number_of_iterations == 10
    reporter.open("r")
    u, _ = reporter.read_energies()
    reporter.close()
    assert u.shape[0] == 11  # iterations 0..10

    # resume from storage continues from the extended point
    sampler2 = ReplicaExchangeSampler.from_storage(reporter)
    assert sampler2.iteration in (9, 10)  # rolls back to last checkpoint


def test_create_with_storage_path_string(tmp_path):
    """Reference test_storage_reporter_and_string (test_sampling.py:2186):
    create() accepts a plain path; a default reporter is constructed."""
    ho, states = _make_states()
    path = str(tmp_path / "by_path.h5")
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(5), number_of_iterations=3,
        online_analysis_interval=None, rng_seed=1)
    sampler.create(states, SamplerState(positions=ho.positions), storage=path)
    sampler.run()
    assert os.path.exists(path)
    with MultiStateReporter(path).open("r") as rep:
        u, _ = rep.read_energies()
    assert u.shape == (4, len(K_LADDER), len(K_LADDER))


def test_analysis_opens_without_checkpoint(tmp_path):
    """Reference test_analysis_opens_without_checkpoint (:2173): the
    analyzer needs only the analysis file; a missing/moved checkpoint file
    must not block free-energy analysis."""
    ho, states = _make_states()
    path = str(tmp_path / "nockpt.h5")
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(), number_of_iterations=60,
        online_analysis_interval=None, rng_seed=3)
    reporter = MultiStateReporter(path, checkpoint_interval=10)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    reporter.close()
    ckpt = reporter._storage_checkpoint
    os.rename(ckpt, ckpt + ".moved")
    analyzer = MultiStateSamplerAnalyzer(MultiStateReporter(path))
    df, ddf = analyzer.get_free_energy()
    assert np.all(np.isfinite(df))


def test_real_time_yaml_appends_across_resume(tmp_path):
    """Reference test_real_time_analysis_yaml_restore (:2429): the
    real-time YAML keeps appending after a from_storage resume, with
    monotone iteration entries within each run."""
    import yaml

    ho, states = _make_states()
    path = str(tmp_path / "rt.h5")
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(5), number_of_iterations=4,
        online_analysis_interval=2, online_analysis_minimum_iterations=0,
        rng_seed=9)
    reporter = MultiStateReporter(path, checkpoint_interval=2)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    ypath = os.path.splitext(path)[0] + "_real_time.yaml"
    assert os.path.exists(ypath)
    with open(ypath) as fh:
        docs1 = yaml.safe_load(fh)
    assert docs1, "no real-time entries written"
    n1 = len(docs1)

    sampler2 = ReplicaExchangeSampler.from_storage(
        MultiStateReporter(path, checkpoint_interval=2))
    sampler2.extend(2)
    with open(ypath) as fh:
        docs2 = yaml.safe_load(fh)
    assert len(docs2) > n1
    iters = [d["iteration"] for d in docs2[n1:]]
    assert iters == sorted(iters)
    for d in docs2:
        assert "iter_per_sec" in d or "seconds_per_iteration" in d or len(d) > 1


def test_sams_state_histogram(tmp_path):
    """Reference TestSingleReplicaSAMS.test_state_histogram (:2757): the
    SAMS visit histogram counts every replica-state visit and sums to
    n_replicas * n_iterations."""
    ho, states = _make_states()
    sampler = SAMSSampler(
        mcmc_moves=_move(5), number_of_iterations=40,
        state_update_scheme="global-jump", flatness_criteria="minimum-visits",
        gamma0=1.0, online_analysis_interval=None, rng_seed=17)
    reporter = MultiStateReporter(str(tmp_path / "hist.h5"),
                                  checkpoint_interval=20)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    hist = np.asarray(sampler._histogram)
    assert hist.shape == (len(K_LADDER),)
    assert hist.sum() == sampler.n_replicas * 40
    assert (hist >= 0).all()

def test_energies_match_independent_recomputation():
    """Reference _compute_energies_independently (test_sampling.py:1112):
    the fused iteration program's N×K energy matrix equals a plain host
    loop of reduced potentials over the final replica configurations."""
    ho, states = _make_states()
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(10), number_of_iterations=5,
        online_analysis_interval=None, rng_seed=21)
    sampler.create(states, SamplerState(positions=ho.positions))
    sampler.run()
    u_fused = sampler.energies_last_iteration

    sstates = sampler.sampler_states
    sstates = sstates() if callable(sstates) else sstates
    u_indep = np.zeros_like(u_fused)
    for i, ss in enumerate(sstates):
        for k, ts in enumerate(states):
            u_indep[i, k] = float(ts.reduced_potential(ss))
    assert np.allclose(u_fused, u_indep, rtol=1e-5, atol=1e-4), (
        np.abs(u_fused - u_indep).max())

def test_resume_continues_rng_stream_bitwise(tmp_path):
    """Counter-based per-iteration keys (fold_in(base, iteration)) make a
    checkpoint resume CONTINUE the randomness instead of replaying
    iteration 0's keys: 3 iterations + resume + 3 must equal 6 straight
    iterations bitwise (reference resumes OpenMM's opaque RNG and can't
    test this; counter-based keys are the TPU-native upgrade, SURVEY §7
    'RNG discipline')."""
    ho, states = _make_states()

    def fresh(n_iter, storage=None):
        s = ReplicaExchangeSampler(
            mcmc_moves=_move(5), number_of_iterations=n_iter,
            online_analysis_interval=None, rng_seed=7)
        s.create(states, SamplerState(positions=ho.positions),
                 storage=storage)
        return s

    # straight 6-iteration run (no storage)
    sampler_a = fresh(6)
    sampler_a.run()
    u_a = np.asarray(sampler_a.energies_last_iteration)
    x_a = np.asarray(sampler_a._carry.positions)

    # 3 iterations, checkpoint, resume, 3 more
    path = str(tmp_path / "split.h5")
    reporter = MultiStateReporter(path, checkpoint_interval=1)
    sampler_b = fresh(6, storage=reporter)
    sampler_b.run(3)
    reporter.close()
    resumed = ReplicaExchangeSampler.from_storage(
        MultiStateReporter(path, checkpoint_interval=1))
    assert int(resumed._carry.iteration) == 3
    resumed.run(3)
    u_b = np.asarray(resumed.energies_last_iteration)
    x_b = np.asarray(resumed._carry.positions)

    np.testing.assert_array_equal(x_a, x_b)
    np.testing.assert_array_equal(u_a, u_b)

def test_reporter_position_velocity_intervals(tmp_path):
    """Reference test_writer_sampler_states_pos_interval
    (test_sampling.py:700): analysis positions/velocities honor their
    write intervals; 0 disables the stream entirely."""
    import h5py

    ho, states = _make_states()
    path = str(tmp_path / "intervals.h5")
    reporter = MultiStateReporter(
        path, checkpoint_interval=10,
        analysis_particle_indices=[0], analysis_velocities=True,
        position_interval=2, velocity_interval=0)
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(5), number_of_iterations=5,
        online_analysis_interval=None, rng_seed=3)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    reporter.close()
    with h5py.File(path, "r") as f:
        pos = f["analysis_positions"]
        # frames written at iterations 0, 2, 4 -> dataset reaches index 4
        assert pos.shape[0] == 5
        assert np.any(pos[4] != 0)
        assert not np.any(pos[3])  # gap rows stay empty
        assert "analysis_velocities" not in f


def test_last_iteration_rollback_read_semantics(tmp_path):
    """Reference test_last_iteration_functions (test_sampling.py:2080):
    after write_last_iteration rolls the file back, read_energies resolves
    ints, negative indices, and slices against the rolled-back end, and
    out-of-range access raises IndexError."""
    ho, states = _make_states()
    path = str(tmp_path / "rollback.h5")
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_move(5), number_of_iterations=10,
        online_analysis_interval=None, rng_seed=7)
    reporter = MultiStateReporter(path, checkpoint_interval=2)
    sampler.create(states, SamplerState(positions=ho.positions),
                   storage=reporter)
    sampler.run()
    reporter.close()

    reporter = MultiStateReporter(path, checkpoint_interval=2).open("a")
    all_energies, _ = reporter.read_energies()
    assert all_energies.shape[0] == 11  # iterations 0..10
    last_index = 4
    reporter.write_last_iteration(last_index)
    reporter.close()

    reporter = MultiStateReporter(path, checkpoint_interval=2).open("r")
    e1, _ = reporter.read_energies(1)
    np.testing.assert_array_equal(e1, all_energies[1])
    e_neg, _ = reporter.read_energies(-1)
    np.testing.assert_array_equal(e_neg, all_energies[last_index])
    e_all, _ = reporter.read_energies()
    np.testing.assert_array_equal(e_all, all_energies[:last_index + 1])
    e_rev, _ = reporter.read_energies(slice(-1, None, -1))
    np.testing.assert_array_equal(e_rev, all_energies[last_index::-1])
    with pytest.raises(IndexError):
        reporter.read_energies(7)
    reporter.close()


def test_analysis_particle_indices_stored_wins(tmp_path):
    """Reference test_analysis_particle_mismatch (test_sampling.py:816):
    the set stamped at file creation has priority over any set passed to a
    later reopen (in both directions: blank->set and set->other-set)."""
    blank_file = str(tmp_path / "blank.h5")
    MultiStateReporter(
        blank_file, analysis_particle_indices=()).open("w").close()
    reopened = MultiStateReporter(
        blank_file, analysis_particle_indices=(0, 1)).open("r")
    assert reopened.analysis_particle_indices.size == 0
    reopened.close()

    set1_file = str(tmp_path / "set1.h5")
    MultiStateReporter(
        set1_file, analysis_particle_indices=(0, 1)).open("w").close()
    for passed in ((), (0, 2)):
        reopened = MultiStateReporter(
            set1_file, analysis_particle_indices=passed).open("r")
        np.testing.assert_array_equal(
            reopened.analysis_particle_indices, [0, 1])
        reopened.close()


def test_parallel_tempering_min_max_ladder(tmp_path):
    """Reference TestParallelTempering.test_temperatures
    (test_sampling.py:2861): the min/max/n constructor produces exactly
    n states spanning [min, max] (logarithmic spacing)."""
    ho = HarmonicOscillator(K=K_LADDER[0])
    ref = ho.thermodynamic_state(300.0)
    sampler = ParallelTemperingSampler(
        mcmc_moves=_move(5), number_of_iterations=2,
        online_analysis_interval=None, rng_seed=11)
    sampler.create(ref, SamplerState(positions=ho.positions),
                   min_temperature=300.0, max_temperature=400.0,
                   n_temperatures=5)
    temps = [float(s.temperature) for s in sampler._thermodynamic_states]
    assert len(temps) == 5
    assert np.isclose(min(temps), 300.0)
    assert np.isclose(max(temps), 400.0)
    assert all(t2 > t1 for t1, t2 in zip(temps, temps[1:]))
    sampler.run()
    assert np.all(np.isfinite(sampler.energies_last_iteration))
