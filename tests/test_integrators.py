"""Integrator validation (analog of reference tests/test_integrators.py):
analytic-distribution checks, work/heat bookkeeping identities, constraints.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.constants import kB
from openmmtools_tpu.integrators import (
    AlchemicalNonequilibriumLangevinIntegrator,
    BAOABIntegrator,
    GHMCIntegrator,
    GeodesicBAOABIntegrator,
    LangevinIntegrator,
    PeriodicNonequilibriumIntegrator,
    VVVRIntegrator,
    VelocityVerletIntegrator,
    minimize,
    parse_splitting,
)
from openmmtools_tpu.integrators.langevin import IntegratorError
from openmmtools_tpu.models import Diatom, HarmonicOscillator
from openmmtools_tpu.states import SamplerState

TEMP = 300.0
KT = kB * TEMP


@pytest.fixture(scope="module")
def ho():
    return HarmonicOscillator()


def _sample_potential_mean(integrator, ho, n_burn=2000, n_chunks=60,
                           chunk=200, seed=0):
    """Mean potential over chunk endpoints after burn-in."""
    bound = integrator.bind(ho.system)
    key = jax.random.PRNGKey(seed)
    state = bound.initial_state(SamplerState(positions=ho.positions), key,
                                temperature=TEMP)
    state = bound.run(state, n_burn)
    us = []
    for _ in range(n_chunks):
        state = bound.run(state, chunk)
        us.append(float(sum(state.potentials)))
    return np.mean(us), np.std(us) / math.sqrt(len(us)), state


def test_parse_splitting_validation():
    parse_splitting("V R O R V")
    parse_splitting("O { V R V } O")
    parse_splitting("V0 V1 R O R V1 V0")
    with pytest.raises(IntegratorError):
        parse_splitting("V R X")
    with pytest.raises(IntegratorError):
        parse_splitting("{ O }")
    with pytest.raises(IntegratorError):
        parse_splitting("V { R")
    with pytest.raises(IntegratorError):
        parse_splitting("V V0 R O")


def test_baoab_samples_boltzmann(ho):
    """BAOAB on the harmonic oscillator: <U> = (3/2) kT within 6 sigma."""
    integ = BAOABIntegrator(temperature=TEMP, collision_rate=20.0,
                            timestep=0.002)
    mean_u, stderr, _ = _sample_potential_mean(integ, ho)
    expected = 1.5 * KT
    assert abs(mean_u - expected) < 6 * max(stderr, 0.02 * expected), (
        f"<U>={mean_u:.4f} expected {expected:.4f} ± {stderr:.4f}")


def test_vvvr_samples_boltzmann(ho):
    integ = VVVRIntegrator(temperature=TEMP, collision_rate=20.0,
                           timestep=0.002)
    mean_u, stderr, _ = _sample_potential_mean(integ, ho, seed=1)
    expected = 1.5 * KT
    assert abs(mean_u - expected) < 6 * max(stderr, 0.03 * expected)


def test_ghmc_exact_sampling(ho):
    """GHMC is Metropolized: exact Boltzmann stats even at larger timestep."""
    integ = GHMCIntegrator(temperature=TEMP, collision_rate=20.0,
                           timestep=0.004)
    mean_u, stderr, state = _sample_potential_mean(integ, ho, seed=2)
    expected = 1.5 * KT
    assert abs(mean_u - expected) < 6 * max(stderr, 0.02 * expected)
    rate = float(state.n_accepted) / float(state.n_proposed)
    assert 0.5 < rate <= 1.0
    assert int(state.n_proposed) == 2000 + 60 * 200


def test_velocity_verlet_energy_conservation(ho):
    """NVE total energy drift stays small over many periods."""
    integ = VelocityVerletIntegrator(timestep=0.001)
    bound = integ.bind(ho.system)
    key = jax.random.PRNGKey(3)
    state = bound.initial_state(SamplerState(positions=ho.positions), key,
                                temperature=TEMP)
    e0 = float(sum(state.potentials)) + 0.5 * ho.mass * float(
        jnp.sum(state.velocities**2))
    state = bound.run(state, 5000)
    e1 = float(sum(state.potentials)) + 0.5 * ho.mass * float(
        jnp.sum(state.velocities**2))
    assert abs(e1 - e0) < 0.01 * (abs(e0) + 1.5 * KT)


def test_velocity_verlet_analytic_trajectory(ho):
    """1D harmonic motion: x(t) = x0 cos(w t) reproduced to O(dt^2)."""
    integ = VelocityVerletIntegrator(timestep=0.0005)
    bound = integ.bind(ho.system)
    x0 = 0.1
    state = bound.initial_state(
        SamplerState(positions=jnp.asarray([[x0, 0.0, 0.0]]),
                     velocities=jnp.zeros((1, 3))),
        jax.random.PRNGKey(0), temperature=TEMP)
    n = 400
    state = bound.run(state, n)
    omega = math.sqrt(ho.K / ho.mass)
    t = n * 0.0005
    x_expected = x0 * math.cos(omega * t)
    assert abs(float(state.positions[0, 0]) - x_expected) < 5e-3


def test_heat_shadow_work_bookkeeping(ho):
    """Total energy change = heat + shadow_work for a pure Langevin splitting
    (reference tests/test_integrators.py:314-384 identity)."""
    integ = BAOABIntegrator(temperature=TEMP, collision_rate=5.0,
                            timestep=0.002, measure_heat=True,
                            measure_shadow_work=True)
    bound = integ.bind(ho.system)
    state = bound.initial_state(SamplerState(positions=ho.positions),
                                jax.random.PRNGKey(4), temperature=TEMP)
    e0 = float(sum(state.potentials)) + 0.5 * ho.mass * float(
        jnp.sum(state.velocities**2))
    state = bound.run(state, 1000)
    e1 = float(sum(state.potentials)) + 0.5 * ho.mass * float(
        jnp.sum(state.velocities**2))
    budget = float(state.heat) + float(state.shadow_work)
    assert abs((e1 - e0) - budget) < 1e-3 * max(1.0, abs(budget))


def test_gbaoab_constrained_diatom():
    """g-BAOAB keeps the constrained bond length exactly."""
    d = Diatom(constraint=True)
    integ = GeodesicBAOABIntegrator(K_r=2, temperature=TEMP,
                                    collision_rate=10.0, timestep=0.002)
    bound = integ.bind(d.system)
    state = bound.initial_state(d.sampler_state(), jax.random.PRNGKey(5),
                                temperature=TEMP)
    state = bound.run(state, 500)
    r = float(jnp.linalg.norm(state.positions[0] - state.positions[1]))
    assert abs(r - d.r0) / d.r0 < 1e-5
    # velocity along the bond is projected out
    dv = state.velocities[0] - state.velocities[1]
    dx = state.positions[0] - state.positions[1]
    assert abs(float(jnp.dot(dv, dx))) < 1e-6


def test_trailing_vproj_skip_parity():
    """The scan-interior step that drops the trailing velocity projection
    (BoundIntegrator._vproj_skip_eligible: P linear + idempotent at fixed x,
    so P(P(v+d1)+d2) == P(v+d1+d2)) must reproduce the always-project
    trajectory to fp tolerance, and the chunk output must still satisfy the
    velocity tangency conditions exactly."""
    from openmmtools_tpu.models import WaterBox

    wb = WaterBox(box_edge=1.2, cutoff=0.5)

    def run(force_full, n):
        integ = BAOABIntegrator(temperature=TEMP, collision_rate=1.0,
                                timestep=0.001)
        b = integ.bind(wb.system)
        assert b._vproj_skip  # BAOAB + constraints is eligible
        if force_full:
            b._vproj_skip = False
            b._step_fn_fast = b._step_fn
            b._run_cache.clear()
        s = b.initial_state(SamplerState(positions=wb.positions),
                            jax.random.PRNGKey(7), temperature=TEMP)
        return b.run(s, n)

    s_fast, s_full = run(False, 10), run(True, 10)
    assert float(jnp.abs(s_fast.positions - s_full.positions).max()) < 1e-4
    c = wb.system.constraints
    i, j = c.index[:, 0], c.index[:, 1]
    r = s_fast.positions[i] - s_fast.positions[j]
    dv = s_fast.velocities[i] - s_fast.velocities[j]
    assert float(jnp.abs(jnp.sum(dv * r, axis=-1)).max()) < 1e-5


def test_vproj_skip_guards():
    """The trailing-projection skip must not fire for subclassed step
    builders (HMC/Andersen/Nose-Hoover crash otherwise) or for per-substep
    KE measurements (shadow work/heat read KE at the NEXT step's leading
    substep, which would see unprojected velocities)."""
    from openmmtools_tpu.integrators import (
        AndersenVelocityVerletIntegrator,
        HMCIntegrator,
        LangevinIntegrator,
        NoseHooverChainVelocityVerletIntegrator,
    )

    d = Diatom(constraint=True)
    # subclassed builders bind cleanly and opt out of the skip
    for integ in (HMCIntegrator(temperature=TEMP),
                  AndersenVelocityVerletIntegrator(temperature=TEMP),
                  NoseHooverChainVelocityVerletIntegrator(
                      temperature=TEMP)):
        b = integ.bind(d.system)
        assert not b._vproj_skip
        s = b.initial_state(d.sampler_state(), jax.random.PRNGKey(1),
                            temperature=TEMP)
        s = b.run(s, 5)
        assert bool(jnp.all(jnp.isfinite(s.positions)))

    # KE-measuring splittings are ineligible (would bias shadow work ~15%)
    integ = LangevinIntegrator(temperature=TEMP, collision_rate=1.0,
                               timestep=0.001, splitting="V R O",
                               measure_shadow_work=True)
    assert not integ.bind(d.system)._vproj_skip
    integ = LangevinIntegrator(temperature=TEMP, collision_rate=1.0,
                               timestep=0.001, splitting="O R V",
                               measure_heat=True)
    assert not integ.bind(d.system)._vproj_skip


def test_blocked_mshake_matches_jacobi():
    """Cluster-direct M-SHAKE (block-space Newton recurrence, zero
    per-iteration gathers) converges to the same projection as the Jacobi
    SHAKE loop for CH3/NH2/X-H-like cluster topologies."""
    import numpy as np

    from openmmtools_tpu.ops.constraints import (
        analyze_clusters,
        mshake_positions,
        mrattle_velocities,
        shake_positions,
    )
    from openmmtools_tpu.system import Constraints

    rng = np.random.default_rng(0)
    idx, dist, n_atoms = [], [], 0
    for _ in range(20):          # CH3-like: central + 3 satellites
        c = n_atoms
        for h in range(3):
            idx.append((c, c + 1 + h))
            dist.append(0.109)
        n_atoms += 4
    for _ in range(10):          # X-H singles
        idx.append((n_atoms, n_atoms + 1))
        dist.append(0.101)
        n_atoms += 2
    masses = jnp.asarray(rng.uniform(1.0, 16.0, n_atoms))
    cons = Constraints(index=jnp.asarray(idx, jnp.int32),
                       distance=jnp.asarray(dist))
    x_ref = np.zeros((n_atoms, 3))
    a = 0
    for _ in range(20):
        x_ref[a] = rng.normal(size=3) * 2
        for h in range(3):
            d = rng.normal(size=3)
            x_ref[a + 1 + h] = x_ref[a] + 0.109 * d / np.linalg.norm(d)
        a += 4
    for _ in range(10):
        x_ref[a] = rng.normal(size=3) * 2
        d = rng.normal(size=3)
        x_ref[a + 1] = x_ref[a] + 0.101 * d / np.linalg.norm(d)
        a += 2
    x_ref = jnp.asarray(x_ref)
    x = x_ref + 0.005 * jnp.asarray(rng.normal(size=(n_atoms, 3)))

    spec = analyze_clusters(cons, masses)
    assert spec is not None
    x_m = mshake_positions(x, x_ref, cons, spec, masses)
    x_j = shake_positions(x, x_ref, cons, masses, tol=1e-12, max_iter=500)
    # 6 Newton iterations vs fully-converged Jacobi: agreement well below
    # the 1e-5 relative constraint tolerance MD uses
    assert float(jnp.abs(x_m - x_j).max()) < 2e-6

    v = jnp.asarray(rng.normal(size=(n_atoms, 3)))
    v_m = mrattle_velocities(x_m, v, cons, spec, masses)
    # the per-cluster solve is EXACT: every tangency condition is removed in
    # one pass (the Jacobi loop only reaches ~3e-4 here in 500 iterations —
    # slow linear convergence on stiff CH3 coupling — so exactness, not
    # Jacobi agreement, is the oracle)
    r = x_m[cons.index[:, 0]] - x_m[cons.index[:, 1]]
    dv = v_m[cons.index[:, 0]] - v_m[cons.index[:, 1]]
    assert float(jnp.abs(jnp.sum(dv * r, axis=-1)).max()) < 1e-7


def test_mts_splitting_runs(ho):
    """Force-group MTS splitting (V0/V1) integrates without error."""
    from openmmtools_tpu.models.testsystems import CustomExternalForcesTestSystem

    ts = CustomExternalForcesTestSystem(
        energy_expressions=("0.4*(x**2+y**2+z**2)", "0.6*(x**2+y**2+z**2)"),
        n_particles=16)
    integ = LangevinIntegrator(temperature=TEMP, collision_rate=10.0,
                               timestep=0.002,
                               splitting="V1 V0 V0 R O R V0 V0 V1")
    bound = integ.bind(ts.system)
    state = bound.initial_state(ts.sampler_state(), jax.random.PRNGKey(6),
                                temperature=TEMP)
    state = bound.run(state, 200)
    assert bool(jnp.all(jnp.isfinite(state.positions)))


def test_alchemical_nonequilibrium_protocol(ho):
    """H steps ramp lambda 0 -> 1 over n_steps_neq and accumulate the analytic
    work for a K(lambda) harmonic oscillator held at x=0... protocol work for
    an oscillator at the origin is U0(lambda) changes only."""
    # lambda scales an offset U0: U = U0 * lambda ; work = U0 at any x.
    functions = {"testsystems_HarmonicOscillator_U0": "5.0*lambda"}
    integ = AlchemicalNonequilibriumLangevinIntegrator(
        alchemical_functions=functions, splitting="O { V R H R V } O",
        temperature=TEMP, collision_rate=10.0, timestep=0.002, n_steps_neq=50)
    bound = integ.bind(ho.system)
    state = bound.initial_state(SamplerState(positions=ho.positions),
                                jax.random.PRNGKey(7), temperature=TEMP,
                                global_params=integ.initial_params())
    state = bound.run(state, 50)
    # U0 enters the energy additively: total protocol work = 5.0 kJ/mol
    assert np.isclose(float(state.protocol_work), 5.0, atol=1e-3)
    assert np.isclose(float(state.lambda_), 1.0)
    # next step starts a new cycle: work resets
    state = bound.run(state, 1)
    assert float(state.protocol_work) < 5.0


def test_periodic_nonequilibrium_schedule():
    integ = PeriodicNonequilibriumIntegrator(
        alchemical_functions={"testsystems_HarmonicOscillator_U0": "lambda"},
        n_steps_eq=2, n_steps_neq=4, temperature=TEMP, timestep=0.002)
    nH = 1
    lams = [float(integ._schedule(jnp.asarray(s), nH)) for s in range(12)]
    assert lams[0] == 0.0 and lams[1] == 0.0  # eq dwell
    assert lams[6] == 1.0 and lams[7] == 1.0  # hold at 1
    assert lams[-1] == 0.0 or lams[-1] < 0.3  # ramp back down


def test_minimize(ho):
    ss = SamplerState(positions=jnp.asarray([[0.5, -0.4, 0.3]]))
    state = ho.thermodynamic_state(TEMP)
    out = minimize(state, ss, max_iterations=200)
    assert float(state.potential_energy(out)) < 1e-2 * float(
        state.potential_energy(ss))


def test_lbfgs_minimizer():
    """L-BFGS (the OpenMM LocalEnergyMinimizer analog / FIRE fallback,
    multistatesampler.py:1414-1420) lowers the energy and stays finite."""
    from openmmtools_tpu.integrators.minimize import (
        fire_minimize,
        lbfgs_minimize,
    )
    from openmmtools_tpu.models import LennardJonesCluster

    ts = LennardJonesCluster()
    x0 = ts.sampler_state().positions
    u0 = float(ts.system.energy(x0))
    x_l, u_l = jax.jit(
        lambda x: lbfgs_minimize(ts.system, x, max_steps=150))(x0)
    assert np.isfinite(float(u_l)) and float(u_l) < u0
    # comparable to FIRE on a well-behaved landscape
    _, u_f = jax.jit(
        lambda x: fire_minimize(ts.system, x, max_steps=150))(x0)
    assert float(u_l) <= float(u_f) + 1.0

def test_temperature_change_mid_run(ho):
    """Reference test_temperature_getter_setter (test_integrators.py:831):
    the thermostat temperature is mutable mid-run. Here kT is a *traced*
    field of IntegratorState, so retargeting the thermostat is a
    state.replace(kT=...) — same compiled program (no retrace), and the
    sampled potential ⟨U⟩ = (3/2) kT_new tracks the NEW temperature."""
    integ = BAOABIntegrator(temperature=TEMP, collision_rate=20.0,
                            timestep=0.002)
    bound = integ.bind(ho.system)
    state = bound.initial_state(SamplerState(positions=ho.positions),
                                jax.random.PRNGKey(3), temperature=TEMP)
    assert np.isclose(float(state.temperature), TEMP, rtol=1e-6)
    state = bound.run(state, 2000)
    fn_before = bound._run_cache.get(2000)

    t_new = 450.0
    state = state.replace(kT=jnp.asarray(kB * t_new, dtype=state.kT.dtype))
    assert np.isclose(float(state.temperature), t_new, rtol=1e-6)
    state = bound.run(state, 2000)  # re-equilibrate at the new temperature
    assert bound._run_cache.get(2000) is fn_before  # no retrace

    us = []
    for _ in range(60):
        state = bound.run(state, 200)
        us.append(float(sum(state.potentials)))
    mean_u, sem = np.mean(us), np.std(us) / math.sqrt(len(us))
    expect = 1.5 * kB * t_new   # 3 quadratic dofs
    assert abs(mean_u - expect) < max(6 * sem, 0.08 * expect), (mean_u, expect)


def test_pretty_print_program(ho):
    """PrettyPrintableIntegrator analog (reference integrators.py:58,
    test_pretty_formatting :264): every token appears in the listing."""
    integ = GHMCIntegrator(temperature=TEMP)
    bound = integ.bind(ho.system)
    text = bound.pretty_print()
    assert "Metropolize" in text and "sqrt(kT/m)" in text
    assert text.splitlines()[0].startswith("# splitting:")
    mts = LangevinIntegrator(splitting="V0 V1 R O R V1 V0",
                             temperature=TEMP).bind(ho.system)
    assert "F[0]" in mts.pretty_print() and "F[1]" in mts.pretty_print()
