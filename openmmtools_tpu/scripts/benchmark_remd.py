"""128-replica alanine-dipeptide REMD throughput benchmark (BASELINE
config 5; reference multistatesampler.py telemetry analog).

Runs ReplicaExchangeSampler-style parallel tempering with 128 replicas
(replicas vmapped into one fused iteration program; with ``--mesh N`` the
same program shards over an N-device replica mesh — on hardware that is a
pod slice over ICI, here it can be validated on a virtual CPU mesh).
``--sync K`` scans K whole iterations inside one device program before
the host syncs (iterations_per_sync), amortizing the ~0.1 s relay
dispatch per sync measured in round 1.

Usage:
    python -m openmmtools_tpu.scripts.benchmark_remd \
        [--replicas 128] [--steps 250] [--iters 6] [--sync 1] [--mesh N] \
        [--check]

``--mesh N`` forces a virtual N-device CPU mesh (sets
xla_force_host_platform_device_count before backend init).
``--check`` additionally re-runs single-device with the same seed and
verifies the sharded energies match (the MPI-aware re-verification
pattern of reference tests/test_sampling.py:1112).
"""
import argparse
import os
import sys
import time


def _force_cpu_mesh(n_devices):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()


def _build_sampler(n_replicas, n_steps_per_iter, n_iterations, sync, mesh):
    import jax

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
        online_analysis_interval=None, rng_seed=0,
        iterations_per_sync=sync)
    sampler.create(ref, SamplerState(positions=ala.positions),
                   min_temperature=270.0, max_temperature=600.0,
                   n_temperatures=n_replicas, mesh=mesh)
    return ala, sampler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--replicas", type=int, default=128)
    p.add_argument("--steps", type=int, default=250)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--sync", type=int, default=1)
    p.add_argument("--mesh", type=int, default=0)
    p.add_argument("--check", action="store_true")
    args = p.parse_args(argv)

    mesh = None
    if args.mesh:
        _force_cpu_mesh(args.mesh)
    import jax
    import numpy as np

    if args.mesh:
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu"
        devices = np.array(jax.devices()[: args.mesh])
        mesh = jax.sharding.Mesh(devices, ("replica",))

    ala, sampler = _build_sampler(args.replicas, args.steps, args.iters,
                                  args.sync, mesh)
    print(f"{args.replicas} replicas x {ala.system.n_particles} atoms, "
          f"{args.steps} MD steps/iter, sync={args.sync}, "
          f"mesh={args.mesh or 1}, backend={jax.default_backend()}",
          flush=True)

    t0 = time.perf_counter()
    sampler.extend(max(args.sync, 1))   # compile + first sync window
    t_compile = time.perf_counter() - t0
    print(f"compile + first window: {t_compile:.1f}s", flush=True)

    t0 = time.perf_counter()
    n_timed = args.iters - max(args.sync, 1)
    if n_timed > 0:
        sampler.extend(n_timed)
    dt = (time.perf_counter() - t0) / max(n_timed, 1)
    u = sampler.energies_last_iteration
    assert np.all(np.isfinite(u)), "non-finite energies"
    print(f"{dt*1e3:.1f} ms/iteration -> {3600.0/dt:,.0f} iterations/hour "
          f"({args.steps/dt:,.0f} MD steps/s aggregate x {args.replicas} "
          f"replicas = {args.replicas*args.steps/dt:,.0f} replica-steps/s)",
          flush=True)

    if args.check and mesh is not None:
        # re-verify the sharded program against single-device execution
        # (reference tests/test_sampling.py:1112 pattern). Trajectories
        # cannot be compared over many chaotic MD steps in f32 — different
        # XLA programs round differently and Lyapunov growth amplifies it —
        # so compare (a) the initial energy matrix exactly and (b) one
        # 1-step iteration loosely.
        _, sharded = _build_sampler(args.replicas, 1, 1, 1, mesh)
        _, single = _build_sampler(args.replicas, 1, 1, 1, None)
        u0_m = np.asarray(sharded.energies_last_iteration)
        u0_s = np.asarray(single.energies_last_iteration)
        err0 = float(np.max(np.abs(u0_m - u0_s)))
        sharded.extend(1)
        single.extend(1)
        err1 = float(np.max(np.abs(
            np.asarray(sharded.energies_last_iteration)
            - np.asarray(single.energies_last_iteration))))
        print(f"single-device re-verification: initial |du| = {err0:.2e}, "
              f"after 1 step |du| = {err1:.2e}", flush=True)
        # tolerances reflect f32 cancellation noise: alanine's vacuum
        # Coulomb sum runs through ~2e6 kJ/mol intermediates, so two
        # XLA compilations differ by ~0.25 kJ/mol (~0.1 kT) legitimately
        assert err0 < 0.3, "sharded initial energies diverge"
        assert err1 < 1.0, "sharded 1-step energies diverge"


if __name__ == "__main__":
    main(sys.argv[1:])
