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
