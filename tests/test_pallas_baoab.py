"""Fused dense BAOAB Pallas kernel: interpret-mode validation on CPU.

The kernel (ops/pallas_baoab.py) is the production single-chip MD path;
on hardware its numerics were additionally verified against the XLA
dense path (parity ~6e-5 rel forces at N=2048 on v5e). Here the Pallas
interpreter pins:

* energy/force parity vs the analytic dense kernel (incl. ring padding
  when N is not a lane multiple),
* full-trajectory parity of the deterministic (gamma=0) integrator
  against the XLA BAOAB program — same splitting, no noise.

Mirrors the reference's integrator stability/energy tests
(tests/test_integrators.py:81 check_stability).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import LennardJonesFluid
from openmmtools_tpu.ops.pair_forces import dense_pair_energy_forces
from openmmtools_tpu.ops.pallas_baoab import FusedDenseBAOAB
from openmmtools_tpu.states import SamplerState


def _fluid(n):
    f = LennardJonesFluid(nparticles=n, reduced_density=0.5)
    t = f.system.terms[0]
    return f, dict(
        sigma=float(np.asarray(t.sigma)[0]),
        epsilon=float(np.asarray(t.epsilon)[0]),
        mass=float(np.asarray(f.system.masses)[0]),
        cutoff=float(t.cutoff), switch_width=t.switch_width)


@pytest.mark.parametrize("n", [256, 200])
def test_kernel_forces_match_dense(n):
    f, p = _fluid(n)
    box = f.system.default_box
    x = f.sampler_state().positions
    t = f.system.terms[0]
    k = FusedDenseBAOAB(n, p["cutoff"], p["switch_width"], p["sigma"],
                        p["epsilon"], p["mass"], timestep=0.002,
                        collision_rate=0.0, interpret=True)
    _, _, F, U, _ = k.run(x, jnp.zeros((n, 3), jnp.float32), box, 1.0,
                          jax.random.PRNGKey(0), 0)
    U_ref, F_ref = dense_pair_energy_forces(
        x, box, None, t.sigma, t.epsilon, method="cutoff_periodic",
        cutoff=p["cutoff"], switch_width=p["switch_width"], periodic=True)
    f_scale = float(jnp.max(jnp.abs(F_ref)))
    assert abs(float(U - U_ref)) <= 2e-4 * abs(float(U_ref))
    assert float(jnp.max(jnp.abs(F - F_ref))) <= 2e-4 * f_scale


def test_kernel_trajectory_matches_xla_baoab():
    n = 256
    f, p = _fluid(n)
    box = f.system.default_box
    L = float(np.asarray(box)[0, 0])

    # minimize + thermalize via the XLA path so gamma=0 MD is stable
    from openmmtools_tpu.integrators.minimize import fire_minimize

    xmin = fire_minimize(f.system, f.sampler_state().positions, box)
    if isinstance(xmin, tuple):
        xmin = xmin[0]
    eq = BAOABIntegrator(temperature=120.0, collision_rate=5.0,
                         timestep=0.002, neighborlist=None).bind(f.system)
    st = eq.initial_state(SamplerState(positions=xmin, box_vectors=box),
                          jax.random.PRNGKey(7), temperature=120.0)
    st = eq.run(st, 300)
    x0, v0 = st.positions, st.velocities
    assert bool(jnp.all(jnp.isfinite(x0)))

    integ = BAOABIntegrator(temperature=120.0, collision_rate=0.0,
                            timestep=0.002, neighborlist=None)
    bound = integ.bind(f.system)
    st1 = bound.initial_state(
        SamplerState(positions=x0, velocities=v0, box_vectors=box),
        jax.random.PRNGKey(1))
    st2 = bound.run(st1, 40)

    k = FusedDenseBAOAB(n, p["cutoff"], p["switch_width"], p["sigma"],
                        p["epsilon"], p["mass"], timestep=0.002,
                        collision_rate=0.0, interpret=True)
    xo, vo, _, U, _ = k.run(x0, v0, box, float(st1.kT),
                            jax.random.PRNGKey(0), 40)
    # kernel wraps positions into the box; compare modulo L
    dxa = jnp.abs((xo % L) - (st2.positions % L))
    dx = float(jnp.min(jnp.stack([dxa, jnp.abs(dxa - L)]), axis=0).max())
    dv = float(jnp.max(jnp.abs(vo - st2.velocities)))
    v_scale = float(jnp.max(jnp.abs(st2.velocities)))
    assert dx < 5e-4
    assert dv < 5e-3 * v_scale
    assert abs(float(U - st2.potentials[0])) <= \
        2e-4 * abs(float(st2.potentials[0]))


def test_bound_integrator_does_not_fuse_on_cpu():
    """The fused path is TPU-only; on CPU the XLA paths must serve."""
    f, _ = _fluid(256)
    bound = BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                            timestep=0.002).bind(f.system)
    assert bound._fused is None


@pytest.mark.parametrize("n", [256, 200])
def test_sorted_kernel_forces_match_dense(n):
    """FusedSortedBAOAB (the production fused path): energy/force parity
    vs the analytic dense kernel, incl. ring padding at N=200."""
    from openmmtools_tpu.ops.pallas_baoab import FusedSortedBAOAB

    f, p = _fluid(n)
    box = f.system.default_box
    x = f.sampler_state().positions
    t = f.system.terms[0]
    k = FusedSortedBAOAB(n, p["cutoff"], p["switch_width"], p["sigma"],
                         p["epsilon"], p["mass"], timestep=0.002,
                         collision_rate=0.0, interpret=True)
    _, _, F, U, _ = k.run(x, jnp.zeros((n, 3), jnp.float32), box, 1.0,
                          jax.random.PRNGKey(0), 0)
    U_ref, F_ref = dense_pair_energy_forces(
        x, box, None, t.sigma, t.epsilon, method="cutoff_periodic",
        cutoff=p["cutoff"], switch_width=p["switch_width"], periodic=True)
    f_scale = float(jnp.max(jnp.abs(F_ref)))
    assert abs(float(U - U_ref)) <= 2e-4 * abs(float(U_ref))
    assert float(jnp.max(jnp.abs(F - F_ref))) <= 2e-4 * f_scale


def test_sorted_kernel_trajectory_matches_dense_kernel():
    """gamma=0 trajectories of the sorted/bounded kernel and the dense
    kernel agree (the bound + adaptive rebuild change nothing physical;
    the particle permutation is restored on exit)."""
    from openmmtools_tpu.ops.pallas_baoab import FusedSortedBAOAB

    n = 256
    f, p = _fluid(n)
    box = f.system.default_box
    from openmmtools_tpu.integrators.minimize import fire_minimize

    xmin = fire_minimize(f.system, f.sampler_state().positions, box)
    if isinstance(xmin, tuple):
        xmin = xmin[0]
    common = dict(timestep=0.002, collision_rate=0.0, interpret=True)
    kd = FusedDenseBAOAB(n, p["cutoff"], p["switch_width"], p["sigma"],
                         p["epsilon"], p["mass"], **common)
    ks = FusedSortedBAOAB(n, p["cutoff"], p["switch_width"], p["sigma"],
                          p["epsilon"], p["mass"], sort_interval=16,
                          **common)
    v0 = jnp.zeros((n, 3), jnp.float32)
    kT = 0.008314462618 * 120.0
    xd, vd, fd, ud, _ = kd.run(xmin, v0, box, kT, jax.random.PRNGKey(0), 30)
    xs, vs, fs, us, _ = ks.run(xmin, v0, box, kT, jax.random.PRNGKey(0), 30)
    assert float(jnp.max(jnp.abs(xd - xs))) < 1e-5
    assert float(jnp.max(jnp.abs(vd - vs))) < 1e-4
    assert abs(float(ud - us)) <= 1e-4 * abs(float(ud))


@pytest.mark.parametrize("splitting", ["O V R V O", "V R R O R R V",
                                       "V R V"])
def test_sorted_kernel_generic_splittings(splitting):
    """The generalized fused kernel reproduces the XLA splitting program
    for VVVR / g-BAOAB / velocity-Verlet token sequences (gamma=0 for
    determinism; one sweep per step regardless of splitting)."""
    from openmmtools_tpu.ops.pallas_baoab import FusedSortedLangevin
    from openmmtools_tpu.integrators import LangevinIntegrator
    from openmmtools_tpu.integrators.minimize import fire_minimize

    n = 256
    f, p = _fluid(n)
    box = f.system.default_box
    L = float(np.asarray(box)[0, 0])
    xmin = fire_minimize(f.system, f.sampler_state().positions, box)
    if isinstance(xmin, tuple):
        xmin = xmin[0]
    v0 = jnp.zeros((n, 3), jnp.float32)
    kT = 0.008314462618 * 120.0

    integ = LangevinIntegrator(temperature=120.0, collision_rate=0.0,
                               timestep=0.002, splitting=splitting,
                               neighborlist=None, sweep=None)
    bound = integ.bind(f.system)
    st = bound.initial_state(
        SamplerState(positions=xmin, velocities=v0, box_vectors=box),
        jax.random.PRNGKey(0))
    st = bound.run(st, 25)

    k = FusedSortedLangevin(n, p["cutoff"], p["switch_width"], p["sigma"],
                            p["epsilon"], p["mass"], timestep=0.002,
                            collision_rate=0.0, interpret=True,
                            tokens=tuple(splitting.split()))
    xo, vo, _, U, _ = k.run(xmin, v0, box, kT, jax.random.PRNGKey(0), 25)
    dxa = jnp.abs((xo % L) - (st.positions % L))
    dx = float(jnp.min(jnp.stack([dxa, jnp.abs(dxa - L)]), axis=0).max())
    dv = float(jnp.max(jnp.abs(vo - st.velocities)))
    v_scale = float(jnp.max(jnp.abs(st.velocities))) + 1e-6
    assert dx < 5e-4, (splitting, dx)
    assert dv < 5e-3 * v_scale, (splitting, dv)
    assert abs(float(U - st.potentials[0])) <= \
        2e-4 * abs(float(st.potentials[0]))
