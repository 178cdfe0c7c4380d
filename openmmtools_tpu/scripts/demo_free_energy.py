"""Absolute LJ-particle decoupling free energy, three independent routes
(BASELINE config 4; the north-star accuracy workflow end-to-end).

Route A (equilibrium): replica exchange over a lambda_sterics ladder of
CompoundThermodynamicStates -> MBAR.
Route B (nonequilibrium): vmapped NCMC switching (H-step protocols,
forward + reverse) -> BAR.
Route C (ORACLE): Widom test-particle insertion — the exact identity
mu_ex = -kT ln <exp(-beta dU)>_{decoupled}.  At lambda=0 the ghost
particle is ideal, so under the thermostat its position is uniform in
the box and one-sided EXP from the decoupled ensemble IS the textbook
Widom chemical potential; dG(1->0) = -mu_ex.  This estimator shares no
alchemical-ladder/MBAR/BAR machinery with routes A/B — it is the
external answer the VERDICT round-2 item 4 asks the full stack to match
(the reference validates against pymbar-consistent overlap checks,
tests/test_alchemy.py:1496).

Run: python -m openmmtools_tpu.scripts.demo_free_energy
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


def route_c_widom(fluid, compound, seed=33, n_snapshots=400,
                  steps_between=100, n_insertions=64, n_eq=4000):
    """Widom insertion from the decoupled (lambda_sterics=0) ensemble.

    Samples the pure (N-1)-particle fluid by MD (the ghost is ideal), and
    for each snapshot evaluates the coupling energy dU = u(lambda=1) -
    u(lambda=0) at ``n_insertions`` uniform ghost positions.  Returns
    f(lambda=1) - f(lambda=0) = beta*mu_ex and a block-analysis error."""
    from openmmtools_tpu.integrators import BAOABIntegrator
    from openmmtools_tpu.states import SamplerState

    params0 = {"lambda_sterics": 0.0, "lambda_electrostatics": 1.0}
    params1 = {"lambda_sterics": 1.0, "lambda_electrostatics": 1.0}
    # energy difference via the resolved state's own reduced potential —
    # identical cutoff/switch/dispersion semantics to the route-A ladder
    base = compound.resolve()

    def du_fn(x):
        ss = SamplerState(positions=x)
        u1 = base.replace(global_params={**base.global_params, **params1}
                          ).reduced_potential(ss)
        u0 = base.replace(global_params={**base.global_params, **params0}
                          ).reduced_potential(ss)
        return u1 - u0

    eq = BAOABIntegrator(temperature=TEMP, collision_rate=1.0,
                         timestep=0.002)
    bound = eq.bind(compound.system)
    key = jax.random.PRNGKey(seed)
    k_init, k_ins = jax.random.split(key)
    es = bound.initial_state(SamplerState(positions=fluid.positions),
                             k_init, temperature=TEMP,
                             global_params=params0)
    run_prog = bound.run_program(steps_between)
    es = bound.run_program(n_eq)(es)

    box_l = float(np.asarray(fluid.system.default_box)[0, 0])
    ins_keys = jax.random.split(k_ins, n_snapshots)

    def snapshot_dus(carry, kk):
        es = run_prog(carry)
        r = jax.random.uniform(kk, (n_insertions, 3)) * box_l

        def one(ri):
            x = es.positions.at[0].set(ri)
            return du_fn(x)

        return es, jax.vmap(one)(r)

    t0 = time.perf_counter()
    es, dus = jax.jit(
        lambda es, ks: jax.lax.scan(snapshot_dus, es, ks))(es, ins_keys)
    dus = np.asarray(jax.block_until_ready(dus))       # (T, R)
    print(f"Widom: {n_snapshots} snapshots x {n_insertions} insertions "
          f"in {time.perf_counter() - t0:.0f}s; "
          f"min dU = {dus.min():.2f} kT", flush=True)

    # beta*mu_ex = -ln <exp(-dU)>; block over time for the error
    def f_of(block):
        m = np.exp(-block).mean()
        return -float(np.log(m))

    f_all = f_of(dus)
    n_blocks = 8
    t_tot = dus.shape[0]
    blocks = [f_of(dus[b * t_tot // n_blocks:(b + 1) * t_tot // n_blocks])
              for b in range(n_blocks)]
    err = float(np.std(blocks) / np.sqrt(n_blocks))
    return f_all, err


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
    # Widom gives f(1) - f(0); routes A/B measured f(0) - f(1)
    f_c, ddf_c = route_c_widom(fluid, compound)
    df_c = -f_c
    print(f"Route C (Widom EXP):  dG = {df_c:.3f} +- {ddf_c:.3f} kT "
          f"(beta*mu_ex = {f_c:.3f})", flush=True)
    kcal = kB * TEMP / 4.184
    worst = 0.0
    for name, (d1, e1), (d2, e2) in (
            ("A vs B", (df_a, ddf_a), (df_b, ddf_b)),
            ("A vs Widom", (df_a, ddf_a), (df_c, ddf_c)),
            ("B vs Widom", (df_b, ddf_b), (df_c, ddf_c))):
        sigma = max((e1**2 + e2**2) ** 0.5, 0.02)
        dev = abs(d1 - d2) / sigma
        worst = max(worst, dev)
        print(f"agreement {name}: |d| = {abs(d1 - d2):.3f} kT = "
              f"{abs(d1 - d2) * kcal:.3f} kcal/mol ({dev:.1f} sigma)",
              flush=True)
    return 0 if worst < 6.0 else 1


if __name__ == "__main__":
    sys.exit(main())
