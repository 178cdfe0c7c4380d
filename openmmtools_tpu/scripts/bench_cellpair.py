"""Hardware measurement for the MXU cell-pair-tile experiment (VERDICT r3 #3).

Compares, on the real chip, BAOAB MD throughput of:

  * the incumbent FusedSortedLangevin Pallas kernel (sorted-ring sweep),
  * the cell-pair tiled XLA evaluator (ops/cellpair.py) with r2 formed
    elementwise on the VPU,
  * the same with r2 + force reductions as MXU matmuls (HIGHEST precision),

at (a) the official bench config (N=2048, rho*=0.05 — condenses to a
droplet; the sorted ring's historical home turf) and (b) homogeneous
liquid (rho*=0.8) at N in {2048, 8192}, the production-relevant regime
where the ring's N^(2/3) sweep bound grows but cell occupancy does not.

Run: python -m openmmtools_tpu.scripts.bench_cellpair [--steps 4000]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import LennardJonesFluid
from openmmtools_tpu.ops.cellpair import CellPairLJ, baoab_chunk

KB = 0.008314462618
TEMP = 120.0
KT = KB * TEMP
DT, GAMMA = 0.002, 1.0


def fused_rate(fluid, n_steps, equil_state=None):
    integ = BAOABIntegrator(temperature=TEMP, collision_rate=GAMMA,
                            timestep=DT)
    bound = integ.bind(fluid.system)
    state = equil_state
    if state is None:
        state = bound.initial_state(fluid.sampler_state(),
                                    jax.random.PRNGKey(0), temperature=TEMP)
    state = jax.block_until_ready(bound.run(state, n_steps))  # compile+equil
    best = None
    for _ in range(3):   # best-of-3: relay stalls inflate single timings
        t0 = time.perf_counter()
        state = bound.run(state, n_steps)
        np.asarray(jax.device_get(state.positions))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ok = bool(np.isfinite(np.asarray(
        jax.device_get(state.positions))).all())
    return n_steps / best, ok, state


def cellpair_rate(fluid, n_steps, mode, capacity, interval=50,
                  from_state=None):
    term = fluid.system.terms[0]
    box_diag = np.diagonal(np.asarray(fluid.system.default_box))
    sigma = float(np.asarray(term.sigma)[0])
    eps = float(np.asarray(term.epsilon)[0])
    cutoff = float(term.cutoff)
    sw = None if term.switch_width is None else float(term.switch_width)
    cp = CellPairLJ(fluid.system.n_particles, box_diag, cutoff, sw,
                    sigma, eps, capacity=capacity, r2_mode=mode)
    if from_state is not None:
        x0 = jnp.asarray(from_state.positions)
        v0 = jnp.asarray(from_state.velocities)
    else:
        x0 = jnp.asarray(fluid.sampler_state().positions)
        v0 = (jnp.sqrt(KT / 39.9)
              * jax.random.normal(jax.random.PRNGKey(1), x0.shape))
    cs = jax.jit(cp.build)(x0, v0)
    args = (jnp.float32(KT), (DT, GAMMA, 39.9))
    # compile + equilibrate into the same chunk shape
    cs, U, key = baoab_chunk(cp, cs, args[0], args[1],
                             jax.random.PRNGKey(2), n_steps, interval)
    jax.block_until_ready(cs.xloc)
    t0 = time.perf_counter()
    cs, U, key = baoab_chunk(cp, cs, args[0], args[1], key, n_steps,
                             interval)
    np.asarray(jax.device_get(cs.xloc))
    dt = time.perf_counter() - t0
    xg = np.asarray(jax.device_get(cp.positions(cs)))
    ok = bool(np.isfinite(xg).all()) and not bool(cs.overflow)
    return n_steps / dt, ok, float(U)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--droplet-equil", type=int, default=50000)
    p.add_argument("--only", default=None,
                   help="substring filter on config labels")
    args = p.parse_args()
    print(f"backend={jax.default_backend()}")

    configs = [
        ("bench-droplet N=2048 rho*=0.05",
         lambda: LennardJonesFluid(nparticles=2048), 48, True),
        ("liquid N=2048 rho*=0.80",
         lambda: LennardJonesFluid(nparticles=2048, reduced_density=0.80),
         56, False),
        ("liquid N=8192 rho*=0.80",
         lambda: LennardJonesFluid(nparticles=8192, reduced_density=0.80),
         56, False),
        ("liquid N=16384 rho*=0.80",
         lambda: LennardJonesFluid(nparticles=16384, reduced_density=0.80),
         56, False),
        ("liquid N=32768 rho*=0.80",
         lambda: LennardJonesFluid(nparticles=32768, reduced_density=0.80),
         56, False),
    ]
    for label, make_fluid, cap, condense in configs:
        if args.only and args.only not in label:
            continue
        fluid = make_fluid()
        # incumbent; for the droplet, equilibrate 50k steps first so the
        # sorted ring sees its condensed steady state (the honest config)
        integ = BAOABIntegrator(temperature=TEMP, collision_rate=GAMMA,
                                timestep=DT)
        bound = integ.bind(fluid.system)
        ss = fluid.sampler_state()
        if not condense:
            # dense liquids: the subrandom initial placement has hard
            # overlaps (U/N ~ 3e5) — start from a jittered lattice instead
            n = fluid.system.n_particles
            L = float(np.diagonal(np.asarray(
                fluid.system.default_box))[0])
            m = int(np.ceil(n ** (1 / 3)))
            grid = np.stack(np.meshgrid(*[np.arange(m)] * 3,
                                        indexing="ij"),
                            axis=-1).reshape(-1, 3)[:n]
            rng = np.random.default_rng(0)
            x = ((grid + 0.5) * (L / m)
                 + rng.normal(scale=0.03 * L / m, size=(n, 3)))
            from openmmtools_tpu.states import SamplerState
            ss = SamplerState(positions=x.astype(np.float32))
        st = bound.initial_state(ss, jax.random.PRNGKey(0),
                                 temperature=TEMP)
        equil = args.droplet_equil if condense else 3000
        st = jax.block_until_ready(bound.run(st, equil))
        r_fused, ok_f, st = fused_rate(fluid, args.steps, equil_state=st)
        print(f"{label}: fused-ring {r_fused:,.0f} steps/s ok={ok_f}")
        for mode in ("vpu", "mxu"):
            try:
                r, ok, U = cellpair_rate(fluid, args.steps, mode, cap,
                                         from_state=st)
                print(f"{label}: cellpair-{mode} {r:,.0f} steps/s ok={ok} "
                      f"U/N={U / fluid.system.n_particles:.4f}")
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"{label}: cellpair-{mode} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
