"""128-replica alanine-dipeptide REMD throughput benchmark (BASELINE
config 5; reference multistatesampler.py telemetry analog).

Runs ReplicaExchangeSampler-style parallel tempering with 128 replicas on
one device (replicas vmapped into one fused iteration program; on a pod
slice the same program shards over the replica mesh — parallel/replica_mesh)
and prints seconds/iteration + iterations/hour.

Usage: python -m openmmtools_tpu.scripts.benchmark_remd [n_replicas] [steps]
"""
import sys
import time

import jax
import numpy as np


def main(n_replicas=128, n_steps_per_iter=250, n_iterations=5):
    from openmmtools_tpu.mcmc import LangevinSplittingDynamicsMove
    from openmmtools_tpu.models import AlanineDipeptideVacuum
    from openmmtools_tpu.multistate import ParallelTemperingSampler
    from openmmtools_tpu.states import SamplerState

    ala = AlanineDipeptideVacuum()
    ref = ala.thermodynamic_state(300.0)
    move = LangevinSplittingDynamicsMove(
        timestep=0.002, collision_rate=1.0, n_steps=n_steps_per_iter,
        splitting="V R O R V")
    sampler = ParallelTemperingSampler(
        mcmc_moves=move, number_of_iterations=n_iterations,
        online_analysis_interval=None, rng_seed=0)
    sampler.create(ref, SamplerState(positions=ala.positions),
                   min_temperature=270.0, max_temperature=600.0,
                   n_temperatures=n_replicas)
    print(f"{n_replicas} replicas x {ala.system.n_particles} atoms, "
          f"{n_steps_per_iter} MD steps/iter, backend={jax.default_backend()}",
          flush=True)

    t0 = time.perf_counter()
    sampler.extend(1)   # compile + first iteration
    t_compile = time.perf_counter() - t0
    print(f"compile + iter 1: {t_compile:.1f}s", flush=True)

    t0 = time.perf_counter()
    n_timed = n_iterations - 1
    sampler.extend(n_timed)
    dt = (time.perf_counter() - t0) / max(n_timed, 1)
    u = sampler.energies_last_iteration
    assert np.all(np.isfinite(u)), "non-finite energies"
    print(f"{dt*1e3:.1f} ms/iteration -> {3600.0/dt:,.0f} iterations/hour "
          f"({n_steps_per_iter/dt:,.0f} MD steps/s aggregate x {n_replicas} "
          f"replicas = {n_replicas*n_steps_per_iter/dt:,.0f} replica-steps/s)",
          flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
