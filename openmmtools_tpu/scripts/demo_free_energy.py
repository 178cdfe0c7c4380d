"""Absolute LJ-particle decoupling free energy, two independent routes
(BASELINE config 4; the north-star accuracy workflow end-to-end).

Route A (equilibrium): replica exchange over a lambda_sterics ladder of
CompoundThermodynamicStates -> MBAR.
Route B (nonequilibrium): vmapped NCMC switching (H-step protocols,
forward + reverse) -> BAR.

The two estimators share no sampling machinery beyond the energy function,
so agreement within errors validates the alchemical factory, the compound
states, the multistate stack, the nonequilibrium integrator, and MBAR/BAR
at once. Run: python -m openmmtools_tpu.scripts.demo_free_energy
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.constants import kB

TEMP = 120.0
N_PARTICLES = 216
DENSITY = 0.30          # homogeneous supercritical-ish liquid-vapor-safe
N_STATES = 8
N_ITER = 600
STEPS_PER_ITER = 200
N_PROTOCOLS = 256
N_STEPS_NEQ = 6000
N_STEPS_EQ = 4000


def build():
    from openmmtools_tpu.alchemy import (
        AbsoluteAlchemicalFactory,
        AlchemicalRegion,
        AlchemicalState,
    )
    from openmmtools_tpu.models import LennardJonesFluid
    from openmmtools_tpu.states import (
        CompoundThermodynamicState,
        ThermodynamicState,
    )

    fluid = LennardJonesFluid(nparticles=N_PARTICLES,
                              reduced_density=DENSITY)
    factory = AbsoluteAlchemicalFactory()
    alch_system = factory.create_alchemical_system(
        fluid.system, AlchemicalRegion(alchemical_atoms=[0]))
    base = ThermodynamicState(alch_system, jnp.asarray(TEMP))
    compound = CompoundThermodynamicState(
        base_state=base, composable_states=[AlchemicalState(
            lambda_sterics=1.0, lambda_electrostatics=1.0)])
    return fluid, alch_system, compound


def route_a_remd(fluid, compound):
    from openmmtools_tpu.mcmc import LangevinSplittingDynamicsMove
    from openmmtools_tpu.multistate import ReplicaExchangeSampler
    from openmmtools_tpu.multistate.mbar import mbar_free_energies
    from openmmtools_tpu.states import (
        SamplerState,
        create_thermodynamic_state_protocol,
    )

    lambdas = np.linspace(1.0, 0.0, N_STATES)
    states = create_thermodynamic_state_protocol(
        compound, {"lambda_sterics": lambdas},
        constants={"lambda_electrostatics": 1.0})
    move = LangevinSplittingDynamicsMove(
        timestep=0.002, collision_rate=1.0, n_steps=STEPS_PER_ITER,
        splitting="V R O R V")
    sampler = ReplicaExchangeSampler(
        mcmc_moves=move, number_of_iterations=N_ITER,
        online_analysis_interval=None, rng_seed=1)
    sampler.create(states,
                   [SamplerState(positions=fluid.positions)
                    for _ in range(N_STATES)])
    t0 = time.perf_counter()
    sampler.run()
    dt = time.perf_counter() - t0
    print(f"REMD: {N_ITER} iterations in {dt:.0f}s "
          f"({dt / N_ITER * 1e3:.0f} ms/iter)", flush=True)

    # discard burn-in, stack (iteration, replica) samples -> MBAR
    burn = N_ITER // 3
    u_hist = np.asarray(sampler._energy_history[burn:])[::3]  # (T, N, K)
    s_hist = np.asarray(sampler._state_history[burn:])[::3]   # (T, N)
    u_kn = u_hist.reshape(-1, N_STATES).T                 # (K, n_samples)
    n_k = np.bincount(s_hist.ravel(), minlength=N_STATES)
    res = mbar_free_energies(jnp.asarray(u_kn), jnp.asarray(n_k))
    df, _ = res.delta_f(0, N_STATES - 1)
    # honest uncertainty: the asymptotic theta assumes independent samples
    # (replica trajectories are correlated) -> block analysis over time
    n_blocks = 4
    t_total = u_hist.shape[0]
    block_dfs = []
    for b in range(n_blocks):
        sl = slice(b * t_total // n_blocks, (b + 1) * t_total // n_blocks)
        u_b = u_hist[sl].reshape(-1, N_STATES).T
        n_b = np.bincount(s_hist[sl].ravel(), minlength=N_STATES)
        r = mbar_free_energies(jnp.asarray(u_b), jnp.asarray(n_b),
                               compute_theta=False)
        block_dfs.append(float(r.free_energies[-1]
                               - r.free_energies[0]))
    ddf = float(np.std(block_dfs) / np.sqrt(n_blocks))
    return float(df), ddf, res


def route_b_ncmc(fluid, alch_system, forward: bool, seed: int):
    from openmmtools_tpu.integrators import (
        AlchemicalNonequilibriumLangevinIntegrator,
        BAOABIntegrator,
    )
    from openmmtools_tpu.states import SamplerState

    lam_expr = "1.0 - lambda" if forward else "lambda"
    start = 1.0 if forward else 0.0
    integ = AlchemicalNonequilibriumLangevinIntegrator(
        alchemical_functions={"lambda_sterics": lam_expr},
        splitting="V R H R V O", temperature=TEMP, collision_rate=1.0,
        timestep=0.002, n_steps_neq=N_STEPS_NEQ)
    bound = integ.bind(alch_system)
    eq = BAOABIntegrator(temperature=TEMP, collision_rate=1.0,
                         timestep=0.002)
    eq_bound = eq.bind(alch_system)
    keys = jax.random.split(jax.random.PRNGKey(seed), N_PROTOCOLS)
    params0 = {"lambda_sterics": start, "lambda_electrostatics": 1.0}

    def one(key):
        k_eq, k_neq = jax.random.split(key)
        ss = SamplerState(positions=fluid.positions)
        es = eq_bound.initial_state(ss, k_eq, temperature=TEMP,
                                    global_params=params0)
        es = eq_bound.run_program(N_STEPS_EQ)(es)
        ss2 = SamplerState(positions=es.positions, velocities=es.velocities)
        ns = bound.initial_state(ss2, k_neq, temperature=TEMP,
                                 global_params=params0)
        ns = bound.run_program(N_STEPS_NEQ)(ns)
        return ns.protocol_work / (kB * TEMP)

    t0 = time.perf_counter()
    w = np.asarray(jax.jit(jax.vmap(one))(keys))
    print(f"NCMC {'fwd' if forward else 'rev'}: {N_PROTOCOLS} protocols "
          f"x {N_STEPS_EQ}+{N_STEPS_NEQ} steps in "
          f"{time.perf_counter() - t0:.0f}s; <w> = {w.mean():.3f} kT",
          flush=True)
    return w


def main():
    from openmmtools_tpu.multistate.mbar import bar_free_energy

    print(f"backend={jax.default_backend()}  N={N_PARTICLES} rho*={DENSITY} "
          f"T={TEMP}K  decoupling particle 0 sterics", flush=True)
    fluid, alch_system, compound = build()
    df_a, ddf_a, _ = route_a_remd(fluid, compound)
    print(f"Route A (REMD/MBAR):  dG = {df_a:.3f} +- {ddf_a:.3f} kT",
          flush=True)
    w_f = route_b_ncmc(fluid, alch_system, True, 21)
    w_r = route_b_ncmc(fluid, alch_system, False, 22)
    df_b, ddf_b = bar_free_energy(jnp.asarray(w_f), jnp.asarray(w_r))
    df_b, ddf_b = float(df_b), float(ddf_b)
    print(f"Route B (NCMC/BAR):   dG = {df_b:.3f} +- {ddf_b:.3f} kT",
          flush=True)
    sigma = max((ddf_a**2 + ddf_b**2) ** 0.5, 0.02)
    dev = abs(df_a - df_b) / sigma
    kcal = kB * TEMP / 4.184
    print(f"agreement: |dA - dB| = {abs(df_a - df_b):.3f} kT = "
          f"{abs(df_a - df_b) * kcal:.3f} kcal/mol ({dev:.1f} sigma)",
          flush=True)
    return 0 if dev < 6.0 else 1


if __name__ == "__main__":
    sys.exit(main())
