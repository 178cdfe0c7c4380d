"""Integrator timing harness (analog of the reference's
examples/integrator-benchmarks/integrator-benchmarks.py:22-76): ms per 200
steps of several integrators on the 1000-particle LJ fluid."""
import time

import jax

from openmmtools_tpu.integrators import (
    BAOABIntegrator,
    GHMCIntegrator,
    VVVRIntegrator,
    VelocityVerletIntegrator,
)
from openmmtools_tpu.models import LennardJonesFluid


def main():
    fluid = LennardJonesFluid(nparticles=1000)
    for name, integ in [
            ("VelocityVerlet", VelocityVerletIntegrator(timestep=0.002)),
            ("BAOAB", BAOABIntegrator(temperature=120.0, timestep=0.002)),
            ("VVVR", VVVRIntegrator(temperature=120.0, timestep=0.002)),
            ("GHMC", GHMCIntegrator(temperature=120.0, timestep=0.002))]:
        bound = integ.bind(fluid.system)
        state = bound.initial_state(fluid.sampler_state(),
                                    jax.random.PRNGKey(0), temperature=120.0)
        state = jax.block_until_ready(bound.run(state, 200))  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            state = jax.block_until_ready(bound.run(state, 200))
            times.append((time.perf_counter() - t0) * 1e3)
        import numpy as np

        print(f"{name:16s} {np.mean(times):8.2f} +- {np.std(times):6.2f} "
              f"ms / 200 steps")


if __name__ == "__main__":
    main()
