"""One-claim TPU measurement pass: verify drive + DHFR breakdown + bench.

Run order favors fast signal first so a mid-run relay loss still yields
data. Everything prints with flush=True.
"""
import time

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices(), flush=True)
assert jax.default_backend() == "tpu"

# ---- 1. verify drive recipe (LJ-512 end-to-end MD) ------------------------
from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import LennardJonesFluid
from openmmtools_tpu.states import SamplerState

fluid = LennardJonesFluid(nparticles=512)
integ = BAOABIntegrator(temperature=120., collision_rate=5., timestep=0.002)
b = integ.bind(fluid.system)
s = b.initial_state(fluid.sampler_state(), jax.random.PRNGKey(0),
                    temperature=120.)
s = jax.block_until_ready(b.run(s, 1000))
finite = bool(jnp.all(jnp.isfinite(s.positions)))
U = float(sum(s.potentials))
m = jnp.asarray(fluid.system.masses)
ke = float(0.5 * jnp.sum(m[:, None] * s.velocities ** 2))
T = 2 * ke / (3 * 512 * 0.008314)
print(f"VERIFY LJ-512: finite={finite} U/N={U/512:.3f} T={T:.1f}",
      flush=True)

# ---- 2. DHFR constraint isolation + headline ------------------------------
from openmmtools_tpu.models import DHFRExplicit

d = DHFRExplicit()


def bench(tag, patch, steps=300):
    integ = BAOABIntegrator(temperature=300.0, collision_rate=1.0,
                            timestep=0.0005)
    bb = integ.bind(d.system)
    patch(bb)
    st = bb.initial_state(d.sampler_state(), jax.random.PRNGKey(0),
                          temperature=300.0)
    st = jax.block_until_ready(bb.run(st, steps))
    t0 = time.perf_counter()
    st = jax.block_until_ready(bb.run(st, steps))
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"DHFR {tag}: {dt:.2f} ms/step "
          f"finite={bool(jnp.all(jnp.isfinite(st.positions)))}", flush=True)
    return dt


def none(bb):
    pass


def no_projections(bb):
    from openmmtools_tpu.system import Constraints
    bb._settle = None
    bb._clusters = None
    bb._rest_constraints = None
    bb.system = bb.system.replace(constraints=Constraints(
        index=jnp.zeros((0, 2), jnp.int32),
        distance=jnp.zeros((0,), jnp.float32)))
    bb._vproj_skip = False
    bb._step_fn = bb._build_step()
    bb._step_fn_fast = bb._step_fn


def no_settle(bb):
    bb._settle = None


def no_mshake(bb):
    bb._clusters = None
    bb._rest_constraints = None


def no_vskip(bb):
    bb._vproj_skip = False
    bb._step_fn_fast = bb._step_fn
    bb._run_cache.clear()


full = bench("full (new constraints + vskip)", none)
bench("no-vskip", no_vskip)
bench("no-projections", no_projections)
bench("settle-only (no mshake)", no_mshake)
bench("mshake-only (no settle)", no_settle)
print(f"DHFR headline: {1000.0/full:.1f} steps/s at 0.5 fs shape",
      flush=True)

# ---- 3. driver bench config (fused kernel, unaffected expected) ----------
fluid2 = LennardJonesFluid(nparticles=2048)
integ2 = BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                         timestep=0.002)
b2 = integ2.bind(fluid2.system)
s2 = b2.initial_state(fluid2.sampler_state(), jax.random.PRNGKey(0),
                      temperature=120.0)
chunk = 50000
s2 = jax.block_until_ready(b2.run(s2, chunk))
n_steps = 0
t0 = time.perf_counter()
while True:
    s2 = jax.block_until_ready(b2.run(s2, chunk))
    n_steps += chunk
    el = time.perf_counter() - t0
    if el > 10.0:
        break
print(f"BENCH lj2048: {n_steps/el:.0f} steps/s "
      f"finite={bool(jnp.all(jnp.isfinite(s2.positions)))}", flush=True)
print("ALL DONE", flush=True)
