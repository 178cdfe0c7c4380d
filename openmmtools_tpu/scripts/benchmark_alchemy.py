"""Benchmark alchemical-system creation and energy/force evaluation.

Analog of the reference's ``benchmark-alchemy`` console script
(setup.py:78; tests/test_alchemy.py:1345,1422 benchmark_alchemy): times
AbsoluteAlchemicalFactory.create_alchemical_system plus jitted
energy/force evaluation of the reference vs alchemical system.
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--nparticles", type=int, default=512)
    parser.add_argument("--n-iterations", type=int, default=100)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from openmmtools_tpu.alchemy import (
        AbsoluteAlchemicalFactory,
        AlchemicalRegion,
    )
    from openmmtools_tpu.models import LennardJonesFluid
    from openmmtools_tpu.system import make_energy_fn

    fluid = LennardJonesFluid(nparticles=args.nparticles)
    factory = AbsoluteAlchemicalFactory()

    t0 = time.perf_counter()
    alch = factory.create_alchemical_system(
        fluid.system, AlchemicalRegion(alchemical_atoms=[0]))
    creation = time.perf_counter() - t0
    print(f"create_alchemical_system: {creation * 1e3:.2f} ms (host)")

    x = fluid.positions
    box = fluid.system.default_box
    for label, system, params in (
            ("reference ", fluid.system, {}),
            ("alchemical", alch, {"lambda_sterics": 0.5,
                                  "lambda_electrostatics": 0.5})):
        u_fn = jax.jit(jax.value_and_grad(make_energy_fn(system)))
        u, g = u_fn(x, box, params)  # compile
        jax.block_until_ready(u)
        t0 = time.perf_counter()
        for _ in range(args.n_iterations):
            u, g = u_fn(x, box, params)
        jax.block_until_ready(u)
        per = (time.perf_counter() - t0) / args.n_iterations
        print(f"{label} energy+force: {per * 1e6:.1f} us/eval "
              f"(U = {float(u):.3f} kJ/mol)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
