"""Round-1 op-level bench levers: the measured verdict (VERDICT r4 item 4).

Measures the driver-bench kernel (LJ-2048, condensed steady state) with
each lever applied in isolation:

* ``rsqrt_newton`` ∈ {1, 2, 3} — refinement passes of the bit-trick rsqrt
  (1 pass leaves ~1.7e-3 rel error: physics-changing, measurement only)
* ``bf16_mask`` — classify pairs from a bf16 r² plane (the 'bf16 distance
  prefilter'; lanes are evaluated unconditionally on the VPU, so this can
  only win if bf16 compare/mul throughput beats f32)
* ``switch_width=None`` — hard cutoff instead of the quintic switch
  (changes the benchmark's physics definition — the reference
  LennardJonesFluid default HAS the switch, testsystems.py:1895 — so this
  bounds what the switch costs rather than proposing its removal)

Run: timeout 1750 python -m openmmtools_tpu.scripts.tune_levers
"""
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
    st = jax.block_until_ready(bound.run(st, 100000))
    x0, v0, box = st.positions, st.velocities, st.box
    kT = float(st.kT)
    key = jax.random.PRNGKey(1)

    variants = [
        ("shipped (switch, newton=2, f32 mask)", {}),
        ("rsqrt newton=1 (wrong forces ~2e-3)", {"rsqrt_newton": 1}),
        ("rsqrt newton=3", {"rsqrt_newton": 3}),
        ("bf16 distance prefilter", {"bf16_mask": True}),
        ("no switch (hard cutoff; different physics)",
         {"switch_width": None}),
    ]
    chunk = 50000
    for label, kw in variants:
        kw = dict(kw)
        sw = kw.pop("switch_width", term.switch_width)
        k = FusedSortedLangevin(
            2048, float(term.cutoff), sw, sig, eps, mass,
            0.002, 1.0, **kw)
        x, v, kk = x0, v0, key
        t0 = time.perf_counter()
        try:
            x, v, f, u, kk = k.run(x, v, box, kT, kk, chunk)
            jax.block_until_ready(x)
        except Exception as err:  # Mosaic lowering rejections count as data
            first = str(err).splitlines()[0][:140]
            print(f"{label:45s}: COMPILE-FAIL ({first})", flush=True)
            continue
        compile_s = time.perf_counter() - t0
        best = 0.0
        n_meas = 0
        t_all = time.perf_counter()
        while time.perf_counter() - t_all < 8.0 and n_meas < 10:
            tc = time.perf_counter()
            x, v, f, u, kk = k.run(x, v, box, kT, kk, chunk)
            jax.block_until_ready(jax.device_get(x))
            best = max(best, chunk / (time.perf_counter() - tc))
            n_meas += 1
        fin = bool(jnp.all(jnp.isfinite(x)))
        print(f"{label:45s}: {best:8.0f} steps/s "
              f"(compile {compile_s:.0f}s, finite={fin})", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
