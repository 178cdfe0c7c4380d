"""DHFR (JAC, 23,558 atoms, PME, h-bond constraints) production MD
benchmark — the reference's flagship explicit-solvent system
(testsystems.py:3863 DHFRExplicit).

Drives the bounded-sweep direct-space kernel (ops/sweep_nb.py) + the
factorized Ewald reciprocal + hybrid SETTLE/M-SHAKE constraints through
the standard BAOAB integrator, validates energy parity against the dense
path, and reports steps/s and ns/day.

Usage: python -m openmmtools_tpu.scripts.benchmark_dhfr [--steps 1000]
       [--timestep 0.002] [--no-check]
"""
import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--timestep", type=float, default=0.002)
    p.add_argument("--no-check", action="store_true")
    p.add_argument("--reference-defaults", action="store_true",
                   help="reference testsystem config (cutoff 1.0 nm, "
                        "switch 0.15 nm, Ewald tol 1e-5; "
                        "testsystems.py:69-71) instead of the JAC "
                        "convention (0.9 nm hard cutoff, tol 5e-4)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from openmmtools_tpu.integrators import BAOABIntegrator
    from openmmtools_tpu.models import DHFRExplicit

    t0 = time.perf_counter()
    if args.reference_defaults:
        d = DHFRExplicit(cutoff=1.0, switch_width=0.15,
                         ewald_error_tolerance=1e-5)
        print("config: reference testsystem defaults "
              "(cutoff 1.0 nm, switch 0.15 nm, tol 1e-5)", flush=True)
    else:
        d = DHFRExplicit()
    print(f"DHFR built in {time.perf_counter()-t0:.0f}s: "
          f"{d.system.n_particles} atoms, "
          f"{d.system.constraints.n_constraints} constraints, "
          f"backend={jax.default_backend()}", flush=True)

    integ = BAOABIntegrator(temperature=300.0, collision_rate=1.0,
                            timestep=args.timestep)
    b = integ.bind(d.system)
    print(f"direct-space path: "
          f"{'bounded sweep' if b.sweep_mode else 'dense/neighbor'}",
          flush=True)

    t0 = time.perf_counter()
    s = b.initial_state(d.sampler_state(), jax.random.PRNGKey(0),
                        temperature=300.0)
    jax.block_until_ready(s.positions)
    u0 = float(s.potentials[0])
    print(f"initial energy {u0:,.1f} kJ/mol "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    if not args.no_check:
        sys_t = jax.tree.map(jnp.asarray, d.system)
        u_dense = float(jax.jit(lambda xx, bb, ss: ss.energy(xx, bb))(
            s.positions, s.box, sys_t))
        rel = abs(u0 - u_dense) / abs(u_dense)
        print(f"dense-path parity: {u_dense:,.1f} kJ/mol "
              f"(rel diff {rel:.2e})", flush=True)
        assert rel < 1e-3, "sweep/dense energy mismatch"

    t0 = time.perf_counter()
    s = b.run(s, args.steps)   # compile + equilibrate one chunk
    jax.block_until_ready(s.positions)
    print(f"compile + first {args.steps}-step chunk: "
          f"{time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    s = b.run(s, args.steps)
    jax.block_until_ready(s.positions)
    dt = (time.perf_counter() - t0) / args.steps
    assert bool(jnp.all(jnp.isfinite(s.positions))), "non-finite positions"
    assert not bool(s.sweep_overflow), "exclusion bitfield overflow"
    ns_day = args.timestep * 86400.0 / dt / 1e3
    print(f"{args.steps} steps: {dt*1e3:.2f} ms/step -> "
          f"{1.0/dt:,.0f} steps/s, {ns_day:.1f} ns/day "
          f"(U = {float(s.potentials[0]):,.0f} kJ/mol)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
