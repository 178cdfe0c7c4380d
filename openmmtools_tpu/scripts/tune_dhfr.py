"""One-claim DHFR knob sweep: sweep_shell_block x neighbor_skin (+ the
array-form M-SHAKE headline). Prints ms/step per config.

Run: timeout 1750 python -m openmmtools_tpu.scripts.tune_dhfr
"""
import itertools
import time

import jax
import jax.numpy as jnp

from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import DHFRExplicit


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    t0 = time.perf_counter()
    d = DHFRExplicit()
    print(f"DHFR built in {time.perf_counter()-t0:.0f}s", flush=True)
    ss = d.sampler_state()

    best = None
    for bs, skin, interval in itertools.product(
            (8, 16), (0.1, 0.15, 0.2), (100,)):
        integ = BAOABIntegrator(temperature=300.0, collision_rate=1.0,
                                timestep=0.002, sweep_shell_block=bs,
                                neighbor_skin=skin,
                                sweep_sort_interval=interval)
        b = integ.bind(d.system)
        s = b.initial_state(ss, jax.random.PRNGKey(0), temperature=300.0)
        # run(n) compiles per chunk size: warm up with the SAME n as the
        # timed call (CLAUDE.md relay rule 6)
        t0 = time.perf_counter()
        s = b.run(s, 500)
        jax.block_until_ready(s.positions)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = b.run(s, 500)
        jax.block_until_ready(s.positions)
        dt = (time.perf_counter() - t0) / 500
        fin = bool(jnp.all(jnp.isfinite(s.positions)))
        ovf = bool(s.sweep_overflow)
        print(f"bs={bs:2d} skin={skin:.2f} int={interval}: "
              f"{dt*1e3:6.2f} ms/step ({1.0/dt:5.0f} steps/s) "
              f"compile={compile_s:.0f}s finite={fin} overflow={ovf}",
              flush=True)
        if fin and not ovf and (best is None or dt < best[0]):
            best = (dt, bs, skin, interval)
    print("BEST:", best, flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
