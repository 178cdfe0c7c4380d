"""Nonequilibrium work / NCMC validation (reference tests/test_integrators.py
:895-1040): BAR over forward/reverse switching work reproduces the analytic
free-energy difference of a harmonic-oscillator deformation within 6 sigma.
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
)
from openmmtools_tpu.models import HarmonicOscillator
from openmmtools_tpu.multistate.mbar import bar_free_energy
from openmmtools_tpu.states import SamplerState

TEMP = 300.0
KT = kB * TEMP

# protocol: scale the spring constant K -> 2K; analytic
# Delta f = (3/2) ln(K1/K0) in kT (configurational partition function)
K0 = 400.0
K1 = 800.0
DF_ANALYTIC = 1.5 * math.log(K1 / K0)

N_PROTOCOLS = 150
N_STEPS_NEQ = 60


def _work_samples(forward: bool, seed: int):
    """Run N_PROTOCOLS nonequilibrium switches as a vmapped batch (the
    TPU-native replacement for the reference's serial 200-protocol loop)."""
    ho = HarmonicOscillator(K=K0)
    k_start, k_end = (K0, K1) if forward else (K1, K0)
    functions = {"testsystems_HarmonicOscillator_K":
                 f"{k_start} + ({k_end} - {k_start})*lambda"}
    integ = AlchemicalNonequilibriumLangevinIntegrator(
        alchemical_functions=functions, splitting="V R H R V O",
        temperature=TEMP, collision_rate=10.0, timestep=0.002,
        n_steps_neq=N_STEPS_NEQ)
    bound = integ.bind(ho.system)

    # equilibrate a batch of replicas at the START state
    # soft well + strong friction is overdamped (tau = gamma/omega^2 ~ 2 ps):
    # moderate gamma + long equilibration, or <r^2> starts biased low
    eq = BAOABIntegrator(temperature=TEMP, collision_rate=5.0, timestep=0.002)
    eq_bound = eq.bind(ho.system)
    keys = jax.random.split(jax.random.PRNGKey(seed), N_PROTOCOLS)

    def one_protocol(key):
        k_eq, k_neq = jax.random.split(key)
        ss = SamplerState(positions=jnp.zeros((1, 3)))
        eq_state = eq_bound.initial_state(
            ss, k_eq, temperature=TEMP,
            global_params={"testsystems_HarmonicOscillator_K": k_start})
        eq_state = eq_bound.run_program(4000)(eq_state)
        ss2 = SamplerState(positions=eq_state.positions,
                           velocities=eq_state.velocities)
        neq_state = bound.initial_state(
            ss2, k_neq, temperature=TEMP,
            global_params={"testsystems_HarmonicOscillator_K": k_start})
        neq_state = bound.run_program(N_STEPS_NEQ)(neq_state)
        return neq_state.protocol_work / (kB * TEMP)

    return np.asarray(jax.jit(jax.vmap(one_protocol))(keys))


@pytest.mark.slow
def test_ncmc_bar_free_energy():
    w_f = _work_samples(forward=True, seed=10)
    w_r = _work_samples(forward=False, seed=11)
    assert np.all(np.isfinite(w_f)) and np.all(np.isfinite(w_r))
    # Jarzynski direction check: <w_f> >= Delta f >= -<w_r>
    assert w_f.mean() > DF_ANALYTIC - 0.2
    assert -w_r.mean() < DF_ANALYTIC + 0.2
    df, ddf = bar_free_energy(jnp.asarray(w_f), jnp.asarray(w_r))
    err = max(6.0 * float(ddf), 0.1)
    assert abs(float(df) - DF_ANALYTIC) < err, (
        f"BAR df={float(df):.3f} +- {float(ddf):.3f}, "
        f"analytic {DF_ANALYTIC:.3f}")


def test_ncmc_work_accumulates_and_resets():
    """Fast smoke test of the H-step machinery (non-slow variant)."""
    w = _work_samples(forward=True, seed=1)[:8]
    assert np.all(np.isfinite(w))
    assert w.mean() > 0  # switching to a stiffer well costs work


# ---------------------------------------------------------------------------
# Reference-parity protocol matrix (tests/test_integrators.py:895-1046):
# the x0-displacement + U0-offset harmonic protocol, Delta f = 1 kT exactly
# (the displacement does not change Z; the offset adds exactly 1 kT),
# validated over three splitting shapes x {instantaneous, 1, 10} neq steps.
# ---------------------------------------------------------------------------
T298 = 298.0
KT298 = kB * T298
SIGMA = 0.1                      # nm
K_REF = KT298 / SIGMA ** 2       # kJ/mol/nm^2
MASS = 39.948
PERIOD = math.sqrt(MASS / K_REF)         # ps (reference's convention)
DT_REF = 0.05 * PERIOD
GAMMA_REF = 1.0 / PERIOD

X0U0_ENDPOINTS = {
    "testsystems_HarmonicOscillator_x0": (0.0, 2 * SIGMA),
    "testsystems_HarmonicOscillator_U0": (0.0, KT298),
}
DF_X0U0 = 1.0  # kT


def _x0u0_functions(forward: bool):
    return {name: (f"(1-lambda)*{a} + lambda*{b}" if forward
                   else f"(1-lambda)*{b} + lambda*{a}")
            for name, (a, b) in X0U0_ENDPOINTS.items()}


def _x0u0_work(splitting, n_steps_neq, forward, seed, n_protocols=200):
    from openmmtools_tpu.integrators import (
        AlchemicalNonequilibriumLangevinIntegrator as NCMC,
    )

    ho = HarmonicOscillator(K=K_REF, mass=MASS)
    integ = NCMC(alchemical_functions=_x0u0_functions(forward),
                 splitting=splitting, temperature=T298,
                 collision_rate=GAMMA_REF, timestep=DT_REF,
                 n_steps_neq=n_steps_neq)
    bound = integ.bind(ho.system)
    eq = BAOABIntegrator(temperature=T298, collision_rate=GAMMA_REF,
                         timestep=DT_REF)
    eq_bound = eq.bind(ho.system)
    start = integ.initial_params()
    x_start = start["testsystems_HarmonicOscillator_x0"]
    keys = jax.random.split(jax.random.PRNGKey(seed), n_protocols)

    def one_protocol(key):
        k_eq, k_neq = jax.random.split(key)
        ss = SamplerState(positions=jnp.asarray([[x_start, 0.0, 0.0]]))
        eq_state = eq_bound.initial_state(ss, k_eq, temperature=T298,
                                          global_params=dict(start))
        eq_state = eq_bound.run_program(1500)(eq_state)
        ss2 = SamplerState(positions=eq_state.positions,
                           velocities=eq_state.velocities)
        neq_state = bound.initial_state(ss2, k_neq, temperature=T298,
                                        global_params=dict(start))
        neq_state = bound.run_program(max(1, n_steps_neq))(neq_state)
        # total work = protocol + shadow (reference get_total_work); the
        # shadow term is zero unless measured, and these splittings at
        # dt = period/20 have negligible shadow work
        return neq_state.protocol_work / KT298

    return np.asarray(jax.jit(jax.vmap(one_protocol))(keys))


@pytest.mark.slow
@pytest.mark.parametrize("splitting", [
    "O V R H R V O",
    "H R V O V R H",
    "O { V R H R V } O",     # the reference NCMC default (metropolized)
])
@pytest.mark.parametrize("n_steps_neq", [0, 1, 10])
def test_ncmc_bar_splitting_matrix(splitting, n_steps_neq):
    """BAR over forward/reverse work reproduces Delta f = 1 kT within 6
    sigma for every splitting shape x protocol length (reference
    test_alchemical_langevin_integrator matrix)."""
    w_f = _x0u0_work(splitting, n_steps_neq, forward=True, seed=100)
    w_r = _x0u0_work(splitting, n_steps_neq, forward=False, seed=200)
    assert np.all(np.isfinite(w_f)) and np.all(np.isfinite(w_r))
    df, ddf = bar_free_energy(jnp.asarray(w_f), jnp.asarray(w_r))
    nsigma = abs(float(df) - DF_X0U0) / max(float(ddf), 1e-6)
    assert nsigma < 6.0, (
        f"splitting={splitting!r} n={n_steps_neq}: BAR df={float(df):.3f} "
        f"+- {float(ddf):.3f} kT vs analytic {DF_X0U0} ({nsigma:.1f} sigma)")


def test_instantaneous_switching_work_identity():
    """n_steps_neq=0: one step completes the protocol
    (integrators.py:1776-1782,1833) and for a pure-H splitting the work is
    exactly U(lambda=1, x) - U(lambda=0, x) at fixed x."""
    from openmmtools_tpu.integrators import (
        AlchemicalNonequilibriumLangevinIntegrator as NCMC,
    )

    ho = HarmonicOscillator(K=K_REF, mass=MASS)
    integ = NCMC(alchemical_functions=_x0u0_functions(True),
                 splitting="H", temperature=T298, timestep=DT_REF,
                 n_steps_neq=0)
    bound = integ.bind(ho.system)
    x = np.array([[0.05, -0.03, 0.08]], np.float64)
    state = bound.initial_state(
        SamplerState(positions=jnp.asarray(x)), jax.random.PRNGKey(0),
        temperature=T298, global_params=integ.initial_params())
    state = bound.run(state, 1)
    d = 2 * SIGMA
    du = (0.5 * K_REF * ((x[0, 0] - d) ** 2 - x[0, 0] ** 2) + KT298)
    assert np.isclose(float(state.protocol_work), du, rtol=1e-5)
    assert float(state.lambda_) == 1.0
    # the next step starts a new cycle: work resets, lambda restarts
    state = bound.run(state, 1)
    assert np.isclose(float(state.protocol_work), du, rtol=1e-5)


def test_metropolized_block_shadow_work_criterion():
    """The { } Metropolis test uses SHADOW work (integrators.py:1550), not
    raw dE: a pure-U0 protocol (zero force change, large energy offsets)
    must be accepted ~always — charging the lambda-jump energy to the
    acceptance test would suppress it by exp(-2 kT) per step."""
    from openmmtools_tpu.integrators import (
        AlchemicalNonequilibriumLangevinIntegrator as NCMC,
    )

    ho = HarmonicOscillator(K=K_REF, mass=MASS)
    funcs = {"testsystems_HarmonicOscillator_U0": f"lambda*{8 * KT298}"}
    integ = NCMC(alchemical_functions=funcs, splitting="O { V R H R V } O",
                 temperature=T298, collision_rate=GAMMA_REF,
                 timestep=DT_REF, n_steps_neq=4)
    bound = integ.bind(ho.system)

    def one(key):
        state = bound.initial_state(
            SamplerState(positions=jnp.zeros((1, 3))), key,
            temperature=T298, global_params=integ.initial_params())
        state = bound.run_program(4)(state)
        return (state.n_accepted, state.n_proposed,
                state.protocol_work / KT298)

    keys = jax.random.split(jax.random.PRNGKey(3), 32)
    acc, prop, w = jax.jit(jax.vmap(one))(keys)
    assert int(np.sum(prop)) == 32 * 4
    assert np.sum(np.asarray(acc)) / np.sum(np.asarray(prop)) > 0.9
    assert np.allclose(np.asarray(w), 8.0, atol=1e-3)  # work still charged


def test_block_rejection_force_cache_consistency():
    """After a rejected metropolized step whose block advanced lambda, the
    carried force/potential caches must match a fresh evaluation at the
    (reverted) positions under the CURRENT parameters — not the stale
    old-lambda values."""
    from openmmtools_tpu.integrators import (
        AlchemicalNonequilibriumLangevinIntegrator as NCMC,
    )

    ho = HarmonicOscillator(K=K_REF, mass=MASS)
    # stiffening protocol at a reckless timestep: plenty of rejections
    funcs = {"testsystems_HarmonicOscillator_K":
             f"{K_REF} + lambda*{40 * K_REF}"}
    integ = NCMC(alchemical_functions=funcs, splitting="{ V R H R V }",
                 temperature=T298, collision_rate=GAMMA_REF,
                 timestep=8.0 * DT_REF, n_steps_neq=30)
    bound = integ.bind(ho.system)
    state = bound.initial_state(
        SamplerState(positions=jnp.asarray([[0.13, -0.07, 0.11]])),
        jax.random.PRNGKey(11), temperature=T298,
        global_params=integ.initial_params())
    state = bound.run(state, 30)
    assert int(state.n_proposed) == 30
    assert int(state.n_accepted) < 30, "test needs at least one rejection"
    u_ref, f_ref = bound._eval_group(bound.groups[0], state.positions,
                                     state.box, state.global_params)
    np.testing.assert_allclose(np.asarray(state.forces[0]),
                               np.asarray(f_ref), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(state.potentials[0]), float(u_ref),
                               rtol=1e-5)


def test_external_perturbation_work_identity():
    """ExternalPerturbationLangevinIntegrator semantics
    (integrators.py:2058): work from externally-changed parameters is
    exactly the potential-energy difference at fixed configuration,
    accumulated across perturbations; plain MD steps add none."""
    from openmmtools_tpu.integrators import (
        ExternalPerturbationLangevinIntegrator as Ext,
    )

    ho = HarmonicOscillator(K=K_REF, mass=MASS)
    integ = Ext(splitting="V R O R V", temperature=T298,
                collision_rate=GAMMA_REF, timestep=DT_REF)
    bound = integ.bind(ho.system)
    params0 = {"testsystems_HarmonicOscillator_K": K_REF,
               "testsystems_HarmonicOscillator_x0": 0.0,
               "testsystems_HarmonicOscillator_U0": 0.0}
    state = bound.initial_state(
        SamplerState(positions=jnp.asarray([[0.07, 0.02, -0.04]])),
        jax.random.PRNGKey(5), temperature=T298, global_params=params0)
    state = bound.run(state, 25)
    assert float(state.protocol_work) == 0.0

    expected = 0.0
    for i, knew in enumerate([2.0 * K_REF, 0.5 * K_REF]):
        x = np.asarray(state.positions)
        kold = float(state.global_params["testsystems_HarmonicOscillator_K"])
        r2 = float((x ** 2).sum())
        expected += 0.5 * (knew - kold) * r2
        state = bound.perturb(
            state, {**params0, "testsystems_HarmonicOscillator_K": knew})
        assert np.isclose(float(state.protocol_work), expected, rtol=1e-5)
        state = bound.run(state, 10)  # plain steps: no additional work
        assert np.isclose(float(state.protocol_work), expected, rtol=1e-5)


@pytest.mark.slow
def test_periodic_bar_free_energy():
    """PeriodicNonequilibriumIntegrator: forward/reverse works extracted
    from protocol-work differences across each cycle's four phases
    reproduce Delta f = 1 kT by BAR (reference
    test_periodic_langevin_integrator, tests/test_integrators.py:1046)."""
    from openmmtools_tpu.integrators import PeriodicNonequilibriumIntegrator

    n_eq, n_neq, n_cycles, n_rep = 200, 100, 6, 16
    ho = HarmonicOscillator(K=K_REF, mass=MASS)
    integ = PeriodicNonequilibriumIntegrator(
        alchemical_functions=_x0u0_functions(True),
        splitting="H V R O R V H", temperature=T298,
        collision_rate=GAMMA_REF, timestep=DT_REF,
        n_steps_eq=n_eq, n_steps_neq=n_neq)
    bound = integ.bind(ho.system)
    run_eq = bound.run_program(n_eq)
    run_neq = bound.run_program(n_neq)

    def one_cycle(s, _):
        s = run_eq(s)                 # dwell at lambda=0
        w0 = s.protocol_work
        s = run_neq(s)                # ramp 0 -> 1
        w1 = s.protocol_work
        s = run_eq(s)                 # dwell at lambda=1
        w2 = s.protocol_work
        s = run_neq(s)                # ramp 1 -> 0
        w3 = s.protocol_work
        return s, ((w1 - w0) / KT298, (w3 - w2) / KT298)

    def replica(key):
        state = bound.initial_state(
            SamplerState(positions=jnp.zeros((1, 3))), key,
            temperature=T298, global_params=integ.initial_params())
        state, works = jax.lax.scan(one_cycle, state, None, length=n_cycles)
        return works

    keys = jax.random.split(jax.random.PRNGKey(42), n_rep)
    w_f, w_r = jax.jit(jax.vmap(replica))(keys)
    w_f = np.asarray(w_f).ravel()
    w_r = np.asarray(w_r).ravel()
    assert np.all(np.isfinite(w_f)) and np.all(np.isfinite(w_r))
    df, ddf = bar_free_energy(jnp.asarray(w_f), jnp.asarray(w_r))
    nsigma = abs(float(df) - DF_X0U0) / max(float(ddf), 1e-6)
    assert nsigma < 6.0, (
        f"periodic BAR df={float(df):.3f} +- {float(ddf):.3f} kT "
        f"vs analytic {DF_X0U0} ({nsigma:.1f} sigma)")


def test_periodic_lambda_schedule_through_md():
    """lambda dwells/ramps tracked through actual MD steps (reference
    asserts the per-step schedule, tests/test_integrators.py:1157-1196)."""
    from openmmtools_tpu.integrators import PeriodicNonequilibriumIntegrator

    n_eq, n_neq = 3, 4
    ho = HarmonicOscillator(K=K_REF, mass=MASS)
    integ = PeriodicNonequilibriumIntegrator(
        alchemical_functions=_x0u0_functions(True),
        splitting="H V R O R V H", temperature=T298,
        collision_rate=GAMMA_REF, timestep=DT_REF,
        n_steps_eq=n_eq, n_steps_neq=n_neq)
    bound = integ.bind(ho.system)
    state = bound.initial_state(
        SamplerState(positions=jnp.zeros((1, 3))), jax.random.PRNGKey(1),
        temperature=T298, global_params=integ.initial_params())
    cycle = 2 * n_eq + 2 * n_neq
    lams = []
    for _ in range(2 * cycle):
        state = bound.run(state, 1)
        lams.append(float(state.lambda_))
    expect_one = ([0.0] * n_eq
                  + [(i + 1) / n_neq for i in range(n_neq)][:-1] + [1.0]
                  + [1.0] * n_eq
                  + [1 - (i + 1) / n_neq for i in range(n_neq)][:-1] + [0.0])
    np.testing.assert_allclose(lams, expect_one * 2, atol=1e-6)


def test_protocol_work_accumulation_alchemical_waterbox():
    """Reference test_protocol_work_accumulation_waterbox
    (tests/test_integrators.py:695): on an AlchemicalWaterBox (rigid TIP3P,
    reaction field, SETTLE constraints) externally stepping
    lambda_electrostatics 1 -> 0 during MD, the integrator's protocol work
    must equal the independently-accumulated fixed-configuration Delta U.
    (The reference's barostat variant is N/A here: the MC barostat is an
    MCMC move, not an in-integrator hook, so box changes cannot interleave
    with integrator steps inside one bound program.)"""
    from openmmtools_tpu.integrators import (
        ExternalPerturbationLangevinIntegrator as Ext,
    )
    from openmmtools_tpu.models import AlchemicalWaterBox

    wb = AlchemicalWaterBox(box_edge=1.2, cutoff=0.55)
    integ = Ext(splitting="V R O R V", temperature=T298,
                collision_rate=90.0, timestep=0.001)
    bound = integ.bind(wb.system)
    params0 = {"lambda_electrostatics": 1.0, "lambda_sterics": 1.0}
    state = bound.initial_state(wb.sampler_state(), jax.random.PRNGKey(11),
                                temperature=T298, global_params=params0)
    state = bound.run(state, 1)
    box = wb.system.default_box

    def group_energy(x, params):
        return sum(float(bound._eval_group(g, x, box, params)[0])
                   for g in bound.groups)

    external = 0.0        # same evaluation path as perturb: tight identity
    external_dense = 0.0  # independent dense-path sum: f32 cross-program
    #                       floor (~1e-5 relative of the ~700 kJ/mol RF
    #                       energy per eval, XLA fusion/FMA order)
    nsteps = 10
    for step in range(nsteps):
        lam = 1.0 - float(step + 1) / nsteps
        pold = dict(state.global_params)
        pnew = {**pold, "lambda_electrostatics": lam}
        x = state.positions
        external += group_energy(x, pnew) - group_energy(x, pold)
        external_dense += float(wb.system.energy(x, box, params=pnew)
                                - wb.system.energy(x, box, params=pold))
        state = bound.perturb(state, pnew)
        state = bound.run(state, 1)
        w = float(state.protocol_work)
        assert np.isclose(w, external, rtol=1e-5, atol=5e-4), (
            step, w, external)
        assert np.isclose(w, external_dense, rtol=1e-3, atol=2e-2), (
            step, w, external_dense)
