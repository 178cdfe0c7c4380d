"""Nose-Hoover / Andersen / Metropolis-MC / MTS integrator tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.constants import kB
from openmmtools_tpu.integrators import (
    AndersenVelocityVerletIntegrator,
    MetropolisMonteCarloIntegrator,
    MTSIntegrator,
    NoseHooverChainVelocityVerletIntegrator,
)
from openmmtools_tpu.models import HarmonicOscillator, HarmonicOscillatorArray
from openmmtools_tpu.states import SamplerState

TEMP = 300.0


def _mean_u(bound, ho, n_burn=2000, n_samples=80, chunk=100, seed=0):
    s = bound.initial_state(SamplerState(positions=ho.positions),
                            jax.random.PRNGKey(seed), temperature=TEMP)
    s = bound.run(s, n_burn)
    us = []
    for _ in range(n_samples):
        s = bound.run(s, chunk)
        us.append(float(sum(s.potentials)))
    stderr = np.std(us) / np.sqrt(len(us) / 4.0)  # crude correlation factor
    return np.mean(us), stderr, s


def test_andersen_thermostat():
    ho = HarmonicOscillator()
    integ = AndersenVelocityVerletIntegrator(temperature=TEMP,
                                             timestep=0.001)
    mean_u, stderr, s = _mean_u(integ.bind(ho.system), ho)
    expected = 1.5 * kB * TEMP
    assert abs(mean_u - expected) < max(6 * stderr, 0.1 * expected), (
        mean_u, expected, stderr)


def test_metropolis_mc_integrator():
    ho = HarmonicOscillator()
    integ = MetropolisMonteCarloIntegrator(temperature=TEMP,
                                           displacement_sigma=0.01)
    mean_u, stderr, s = _mean_u(integ.bind(ho.system), ho)
    expected = 1.5 * kB * TEMP
    assert abs(mean_u - expected) < max(6 * stderr, 0.1 * expected)
    rate = float(s.n_accepted) / float(s.n_proposed)
    assert 0.05 < rate < 1.0


def test_nose_hoover_bath_conservation():
    """NHC conserved quantity (system + bath energy) drifts slowly."""
    # multi-oscillator system is more ergodic than a single particle
    arr = HarmonicOscillatorArray(N=5)
    integ = NoseHooverChainVelocityVerletIntegrator(
        temperature=TEMP, timestep=0.001, collision_frequency=50.0)
    bound = integ.bind(arr.system)
    s = bound.initial_state(SamplerState(positions=arr.positions),
                            jax.random.PRNGKey(1), temperature=TEMP)

    def conserved(s):
        ke_b, pe_b = bound.bath_energy(s)
        ke = 0.5 * float(jnp.sum(arr.system.masses[:, None]
                                 * s.velocities**2))
        return float(sum(s.potentials)) + ke + float(ke_b) + float(pe_b)

    s = bound.run(s, 100)
    e0 = conserved(s)
    s = bound.run(s, 2000)
    e1 = conserved(s)
    scale = max(abs(e0), 5 * kB * TEMP)
    assert abs(e1 - e0) < 0.05 * scale, (e0, e1)


def test_nose_hoover_temperature():
    arr = HarmonicOscillatorArray(N=5)
    integ = NoseHooverChainVelocityVerletIntegrator(
        temperature=TEMP, timestep=0.001, collision_frequency=100.0)
    bound = integ.bind(arr.system)
    s = bound.initial_state(SamplerState(positions=arr.positions),
                            jax.random.PRNGKey(2), temperature=TEMP)
    s = bound.run(s, 2000)
    kes = []
    for _ in range(30):
        s = bound.run(s, 100)
        kes.append(0.5 * float(jnp.sum(arr.system.masses[:, None]
                                       * s.velocities**2)))
    t_mean = 2 * np.mean(kes) / (arr.ndof * kB)
    assert abs(t_mean - TEMP) < 0.2 * TEMP, t_mean


def test_mts_integrator():
    from openmmtools_tpu.models.testsystems import CustomExternalForcesTestSystem

    ts = CustomExternalForcesTestSystem(
        energy_expressions=("0.75*(x**2+y**2+z**2)",
                            "0.25*(x**2+y**2+z**2)"),
        n_particles=8)
    integ = MTSIntegrator(timestep=0.002, groups=[(0, 1), (1, 4)],
                          temperature=TEMP)
    bound = integ.bind(ts.system)
    # splitting must contain both groups with group 1 nested more often
    assert "V0" in integ.splitting and "V1" in integ.splitting
    s = bound.initial_state(ts.sampler_state(), jax.random.PRNGKey(3),
                            temperature=TEMP)
    s = bound.run(s, 200)
    assert bool(jnp.all(jnp.isfinite(s.positions)))


def test_hmc_integrator():
    """HMC integrator samples the harmonic oscillator at the right <U>
    with healthy acceptance (integrators.py:885)."""
    from openmmtools_tpu.integrators import HMCIntegrator

    ho = HarmonicOscillator()
    integ = HMCIntegrator(temperature=TEMP, nsteps=10, timestep=0.001)
    bound = integ.bind(ho.system)
    s = bound.initial_state(SamplerState(positions=ho.positions),
                            jax.random.PRNGKey(0), temperature=TEMP)
    s = bound.run(s, 500)
    us = []
    for _ in range(60):
        s = bound.run(s, 20)
        us.append(float(sum(s.potentials)))
    rate = float(s.n_accepted) / float(s.n_proposed)
    assert 0.3 < rate <= 1.0, rate
    expected = 1.5 * kB * TEMP
    stderr = np.std(us) / np.sqrt(len(us) / 4.0)
    assert abs(np.mean(us) - expected) < max(6 * stderr, 0.15 * expected), (
        np.mean(us), expected, stderr)


def test_stabilities_all_presets():
    """Reference test_integrators.py test_stabilities: every preset
    integrator propagates a bonded + nonbonded system to finite state."""
    from openmmtools_tpu.integrators import (
        BAOABIntegrator,
        GeodesicBAOABIntegrator,
        GHMCIntegrator,
        HMCIntegrator,
        LangevinIntegrator,
        VelocityVerletIntegrator,
        VVVRIntegrator,
    )
    from openmmtools_tpu.models import Diatom, LennardJonesFluid

    presets = [
        LangevinIntegrator(temperature=TEMP, timestep=0.001),
        BAOABIntegrator(temperature=TEMP, timestep=0.001),
        GeodesicBAOABIntegrator(temperature=TEMP, timestep=0.001),
        VVVRIntegrator(temperature=TEMP, timestep=0.001),
        GHMCIntegrator(temperature=TEMP, timestep=0.001),
        VelocityVerletIntegrator(timestep=0.0005),
        NoseHooverChainVelocityVerletIntegrator(temperature=TEMP,
                                                timestep=0.001),
        AndersenVelocityVerletIntegrator(temperature=TEMP, timestep=0.001),
        MetropolisMonteCarloIntegrator(temperature=TEMP),
        HMCIntegrator(temperature=TEMP, nsteps=5, timestep=0.0005),
    ]
    systems = [Diatom(), LennardJonesFluid(nparticles=64, reduced_density=0.05)]
    for ts in systems:
        for integ in presets:
            bound = integ.bind(ts.system)
            s = bound.initial_state(SamplerState(positions=ts.positions),
                                    jax.random.PRNGKey(7), temperature=TEMP)
            s = bound.run(s, 100)
            name = type(integ).__name__
            assert bool(jnp.all(jnp.isfinite(s.positions))), (name, ts)
            assert bool(jnp.all(jnp.isfinite(s.velocities))), (name, ts)
            assert np.isfinite(float(sum(s.potentials))), (name, ts)


def test_minimizer_across_testsystems():
    """Reference test_mcmc.py test_minimizer_all_testsystems: minimize
    never increases the energy and returns finite positions, across system
    families (bonded, LJ, water, implicit-solvent)."""
    from openmmtools_tpu.integrators import minimize
    from openmmtools_tpu.models import (
        Diatom,
        HarmonicOscillator,
        LennardJonesCluster,
        LennardJonesFluid,
        SodiumChlorideCrystal,
        WaterCluster,
    )
    from openmmtools_tpu.states import ThermodynamicState

    systems = [HarmonicOscillator(), Diatom(), LennardJonesCluster(),
               LennardJonesFluid(nparticles=64, reduced_density=0.05),
               SodiumChlorideCrystal(), WaterCluster(n_waters=4)]
    for ts in systems:
        thermo = ts.thermodynamic_state(temperature=TEMP)
        ss = SamplerState(positions=jnp.asarray(ts.positions) +
                          0.005 * jax.random.normal(
                              jax.random.PRNGKey(11),
                              jnp.asarray(ts.positions).shape))
        u0 = float(thermo.potential_energy(ss))
        out = minimize(thermo, ss, max_iterations=100)
        u1 = float(thermo.potential_energy(out))
        name = type(ts).__name__
        assert bool(jnp.all(jnp.isfinite(out.positions))), name
        assert u1 <= u0 + 1e-6, (name, u0, u1)
