"""Fused Pallas MD kernel tests (interpret mode on CPU).

The real-hardware validation (gamma=0 fused trajectory == dense XLA
trajectory) runs on TPU via the verify skill / bench; here the kernel's
force sweep and the binning machinery are checked exactly against the dense
reference in interpreter mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmmtools_tpu.models import LennardJonesFluid
from openmmtools_tpu.ops import pallas_md as P
from openmmtools_tpu.system import make_force_fn


@pytest.fixture(scope="module")
def setup():
    fluid = LennardJonesFluid(nparticles=64)
    spec = P.make_grid_spec(64, fluid.box_edge, fluid.cutoff, fluid.sigma,
                            fluid.sigma, 0.238 * 4.184, 39.9, 0.002, 0.0,
                            skin_fraction=0.1, capacity=8)
    x = jnp.asarray(fluid.positions)
    v = jnp.zeros_like(x)
    return fluid, spec, x, v


def test_binning_roundtrip(setup):
    fluid, spec, x, v = setup
    L = spec.box_edge
    xs, vs, valid, e, mo = P.bin_particles_matmul(x, v, spec)
    assert int(mo) <= spec.capacity
    xr, vr = P.unbin_particles_matmul(xs, vs, e)
    xw = x - L * jnp.floor(x / L)
    assert float(jnp.max(jnp.abs(xr - xw))) < 1e-6
    # matmul binning bit-matches the sort/scatter reference implementation
    xs2, vs2, valid2, _, mo2 = P.bin_particles(x, v, spec)
    assert int(mo) == int(mo2)
    assert bool(jnp.allclose(xs, xs2, atol=1e-6))
    assert bool(jnp.array_equal(valid, valid2))


def test_kernel_forces_match_dense(setup):
    """The cell-grid half-offset Newton sweep reproduces the dense O(N^2)
    forces exactly (interpret mode; gamma=0 so the kernel is RNG-free)."""
    fluid, spec, x, v = setup
    m, g = spec.capacity, spec.g_cells
    xs, vs, valid, e, mo = P.bin_particles_matmul(x, v, spec)
    kern = P._make_kernel(spec, 1, forces_only=True)
    fn = pl.pallas_call(
        kern, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct((3, m, g), jnp.float32),) * 2,
        interpret=True)
    f_slots, _ = fn(jnp.asarray([1], jnp.int32), jnp.asarray([1.0], jnp.float32),
                    jnp.asarray([int(mo)], jnp.int32), xs, vs, valid)
    f_kernel, _ = P.unbin_particles_matmul(f_slots, f_slots, e)

    L = spec.box_edge
    xw = x - L * jnp.floor(x / L)
    f_dense = make_force_fn(fluid.system)(xw, fluid.system.default_box, None)
    err = float(jnp.max(jnp.abs(f_kernel - f_dense)))
    scale = float(jnp.max(jnp.abs(f_dense)))
    assert err < 1e-4 * max(scale, 1.0), (err, scale)


def test_occupancy_gating_exact(setup):
    """Skipping candidate slots >= max_occ changes nothing (ranks are
    contiguous, so those slots are guaranteed empty)."""
    fluid, spec, x, v = setup
    m, g = spec.capacity, spec.g_cells
    xs, vs, valid, e, mo = P.bin_particles_matmul(x, v, spec)
    kern = P._make_kernel(spec, 1, forces_only=True)
    fn = pl.pallas_call(
        kern, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct((3, m, g), jnp.float32),) * 2,
        interpret=True)
    args = (jnp.asarray([1], jnp.int32), jnp.asarray([1.0], jnp.float32))
    f_gated, _ = fn(*args, jnp.asarray([int(mo)], jnp.int32), xs, vs, valid)
    f_full, _ = fn(*args, jnp.asarray([m], jnp.int32), xs, vs, valid)
    assert float(jnp.max(jnp.abs(f_gated - f_full))) < 1e-5
