"""Alchemical decoupling of one LJ particle in a fluid with MBAR
(BASELINE config 4 shape): lambda ladder -> REMD -> free energy."""
import numpy as np

from openmmtools_tpu.alchemy import AbsoluteAlchemicalFactory, AlchemicalRegion
from openmmtools_tpu.mcmc import LangevinDynamicsMove
from openmmtools_tpu.models import LennardJonesFluid
from openmmtools_tpu.multistate import (
    MultiStateReporter,
    MultiStateSamplerAnalyzer,
    ReplicaExchangeSampler,
)
from openmmtools_tpu.states import (
    ThermodynamicState,
    create_thermodynamic_state_protocol,
)


def main():
    fluid = LennardJonesFluid(nparticles=128, reduced_density=0.50)
    factory = AbsoluteAlchemicalFactory()
    alchemical_system = factory.create_alchemical_system(
        fluid.system, AlchemicalRegion(alchemical_atoms=[0]))

    lambdas = np.linspace(1.0, 0.0, 8)
    reference = ThermodynamicState(
        alchemical_system, 120.0,
        global_params={"lambda_sterics": 1.0, "lambda_electrostatics": 1.0})
    states = create_thermodynamic_state_protocol(
        reference, protocol={"lambda_sterics": lambdas,
                             "lambda_electrostatics": lambdas})

    sampler = ReplicaExchangeSampler(
        mcmc_moves=LangevinDynamicsMove(timestep=0.002, collision_rate=5.0,
                                        n_steps=100),
        number_of_iterations=100, online_analysis_interval=None)
    reporter = MultiStateReporter("lj_decoupling.h5", checkpoint_interval=25)
    sampler.create(states, fluid.sampler_state(), storage=reporter)
    sampler.minimize()
    sampler.run()

    analyzer = MultiStateSamplerAnalyzer(reporter)
    df, ddf = analyzer.get_free_energy()
    print(f"decoupling Delta f = {df[0, -1]:.3f} +- {ddf[0, -1]:.3f} kT")
    reporter.close()


if __name__ == "__main__":
    main()
