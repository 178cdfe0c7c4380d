"""One-claim hardware tuning sweep for the fused sorted-sweep kernel.

Grid over (shell_block, skin, sort_interval) on the driver bench config
(LJ-2048, BAOAB); prints steps/s plus the kernel's own diagnostics
(rebuild count, summed per-window sweep bounds) for each point so the
winning config can be read off and baked into _fused_setup.

Run: timeout 1750 python -m openmmtools_tpu.scripts.tune_fused
"""
import itertools
import time

import jax
import jax.numpy as jnp

from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import LennardJonesFluid
from openmmtools_tpu.ops.pallas_baoab import FusedSortedLangevin


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    fluid = LennardJonesFluid(nparticles=2048)
    integ = BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                            timestep=0.002)
    bound = integ.bind(fluid.system)
    term = bound._fused_term
    sig = float(jnp.asarray(term.sigma)[0])
    eps = float(jnp.asarray(term.epsilon)[0])
    mass = float(jnp.asarray(bound.system.masses)[0])
    st = bound.initial_state(fluid.sampler_state(), jax.random.PRNGKey(0),
                             temperature=120.0)
    # equilibrate to the condensed steady state once with the default
    # kernel so every tuning point sees the same (hard) configuration
    st = jax.block_until_ready(bound.run(st, 100000))
    x0, v0, box = st.positions, st.velocities, st.box
    kT = float(st.kT)
    key = jax.random.PRNGKey(1)

    chunk = 50000
    results = []
    for bs, skin_frac, interval in itertools.product(
            (8, 16), (0.2, 0.3, 0.5, 0.7), (50, 100, 250)):
        k = FusedSortedLangevin(
            2048, float(term.cutoff), term.switch_width, sig, eps, mass,
            0.002, 1.0, shell_block=bs, skin=skin_frac * sig,
            sort_interval=interval)
        x, v = x0, v0
        kk = key
        t0 = time.perf_counter()
        x, v, f, u, kk = k.run(x, v, box, kT, kk, chunk)
        jax.block_until_ready(x)
        compile_s = time.perf_counter() - t0
        n = 0
        t0 = time.perf_counter()
        while True:
            x, v, f, u, kk = k.run(x, v, box, kT, kk, chunk)
            jax.block_until_ready(x)
            n += chunk
            el = time.perf_counter() - t0
            if el > 6.0:
                break
        sps = n / el
        stats = jax.device_get(k.last_stats)
        fin = bool(jnp.all(jnp.isfinite(x)))
        print(f"bs={bs:2d} skin={skin_frac:.1f}s int={interval:3d}: "
              f"{sps:8.0f} steps/s rebuilds/win={stats[0]:6.1f} "
              f"sumbound={stats[1]:7.0f} compile={compile_s:.0f}s "
              f"finite={fin}", flush=True)
        results.append((sps, bs, skin_frac, interval))
    results.sort(reverse=True)
    print("BEST:", results[0], flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
