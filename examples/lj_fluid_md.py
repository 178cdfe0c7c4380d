"""Basic MD: BAOAB Langevin dynamics on the Lennard-Jones fluid."""
import jax

from openmmtools_tpu.constants import kB
from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import LennardJonesFluid
from openmmtools_tpu.system import instantaneous_temperature


def main():
    fluid = LennardJonesFluid(nparticles=512)
    integrator = BAOABIntegrator(temperature=120.0, collision_rate=5.0,
                                 timestep=0.002)
    bound = integrator.bind(fluid.system)
    state = bound.initial_state(fluid.sampler_state(), jax.random.PRNGKey(0),
                                temperature=120.0)
    for block in range(5):
        state = bound.run(state, 1000)
        t_inst = float(instantaneous_temperature(fluid.system.masses,
                                                 state.velocities))
        print(f"block {block}: U = {float(sum(state.potentials)):10.2f} "
              f"kJ/mol   T = {t_inst:6.1f} K")


if __name__ == "__main__":
    main()
