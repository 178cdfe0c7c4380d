"""Driver benchmark: BAOAB MD throughput on the 2k-particle LJ fluid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 1M BAOAB steps/s per chip on this config
(BASELINE.json; the reference publishes no absolute numbers, BASELINE.md).

Runs on whatever the default JAX platform is (the TPU chip under the
driver); measures steady-state steps/s of the fused jitted BAOAB+LJ step
program, excluding compile time.
"""
import json
import time

import jax


def main():
    from openmmtools_tpu.integrators import BAOABIntegrator
    from openmmtools_tpu.models import LennardJonesFluid

    n_particles = 2048
    fluid = LennardJonesFluid(nparticles=n_particles)
    integ = BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                            timestep=0.002)
    bound = integ.bind(fluid.system)
    state = bound.initial_state(fluid.sampler_state(), jax.random.PRNGKey(0),
                                temperature=120.0)

    # large chunks amortize the ~33 ms host->TPU dispatch latency of the
    # relay (measured round 3: fixed cost is constant in chunk size, so
    # 50k steps/call cuts it from 3.3 to 0.7 us/step); the fused kernel
    # integrates the whole chunk in one program
    chunk = 50000
    # warm-up/compile
    state = jax.block_until_ready(bound.run(state, chunk))

    n_steps = 0
    t0 = time.perf_counter()
    while True:
        state = jax.block_until_ready(bound.run(state, chunk))
        n_steps += chunk
        elapsed = time.perf_counter() - t0
        if elapsed > 10.0 or n_steps >= 2_000_000:
            break
    steps_per_sec = n_steps / elapsed

    finite = bool(jax.numpy.all(jax.numpy.isfinite(state.positions)))
    if not finite:
        steps_per_sec = 0.0

    print(json.dumps({
        "metric": "baoab_steps_per_sec_lj2048",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 1.0e6, 4),
    }))


if __name__ == "__main__":
    main()
