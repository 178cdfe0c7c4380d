"""Parallel-tempering REMD on alanine dipeptide (BASELINE config 5 shape).

With more devices, pass ``mesh=replica_mesh(n)`` to ``create`` to shard
replicas over the chips.
"""
from openmmtools_tpu.mcmc import LangevinDynamicsMove
from openmmtools_tpu.models import AlanineDipeptideVacuum
from openmmtools_tpu.multistate import (
    MultiStateReporter,
    MultiStateSamplerAnalyzer,
    ParallelTemperingSampler,
)


def main():
    ala = AlanineDipeptideVacuum()
    sampler = ParallelTemperingSampler(
        mcmc_moves=LangevinDynamicsMove(timestep=0.001, collision_rate=10.0,
                                        n_steps=100),
        number_of_iterations=50, online_analysis_interval=None)
    reporter = MultiStateReporter("alanine_pt.h5", checkpoint_interval=10)
    sampler.create(ala.thermodynamic_state(300.0), ala.sampler_state(),
                   storage=reporter,
                   min_temperature=300.0, max_temperature=600.0,
                   n_temperatures=8)
    sampler.run()
    t_ij, mu2, tau = MultiStateSamplerAnalyzer(reporter)\
        .generate_mixing_statistics()
    print("subdominant eigenvalue:", mu2, " mixing time:", tau, "iterations")
    reporter.close()


if __name__ == "__main__":
    main()
