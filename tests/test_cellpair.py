"""Cell-pair tiled LJ evaluator (ops/cellpair.py) vs the dense path.

The MXU experiment kernel must be physics-identical to
ops/pair_forces.dense_pair_energy_forces on homogeneous periodic LJ
(VERDICT r3 item 3: 'prove or refute on hardware' — correctness here,
perf on the chip via scripts/bench_cellpair.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.ops.cellpair import CellPairLJ, CellState, baoab_chunk
from openmmtools_tpu.ops.pair_forces import dense_pair_energy_forces

SIGMA, EPS = 0.34, 0.995792
CUTOFF = 3 * SIGMA
SWITCH = SIGMA


def _random_config(n, box_edge, seed=0):
    rng = np.random.default_rng(seed)
    # jittered lattice avoids r ~ 0 overlaps that swamp the comparison
    m = int(np.ceil(n ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)[:n]
    x = (grid + 0.5) * (box_edge / m)
    x = x + rng.normal(scale=0.05 * box_edge / m, size=x.shape)
    return x.astype(np.float32)


@pytest.mark.parametrize("r2_mode", ["vpu", "mxu"])
@pytest.mark.parametrize("n,box_edge", [(500, 4.6), (2048, 7.0)])
def test_energy_forces_match_dense(n, box_edge, r2_mode):
    x = _random_config(n, box_edge)
    box = np.diag([box_edge] * 3).astype(np.float32)
    cp = CellPairLJ(n, np.diag(box), CUTOFF, SWITCH, SIGMA, EPS,
                    capacity=64, r2_mode=r2_mode)
    cs = jax.jit(cp.build)(jnp.asarray(x))
    assert not bool(cs.overflow)
    U, Fc = jax.jit(lambda s: cp.energy_forces(s))(cs)
    F = cp.scatter_back(cs, Fc)

    sig = np.full(n, SIGMA, np.float32)
    eps = np.full(n, EPS, np.float32)
    U_ref, F_ref = dense_pair_energy_forces(
        jnp.asarray(x), jnp.asarray(box), None, jnp.asarray(sig),
        jnp.asarray(eps), method="cutoff_periodic", cutoff=CUTOFF,
        switch_width=SWITCH, periodic=True)
    assert np.isclose(float(U), float(U_ref), rtol=2e-5), (
        float(U), float(U_ref))
    scale = np.abs(np.asarray(F_ref)).max()
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref),
                               atol=3e-4 * scale, rtol=2e-4)


def test_positions_round_trip():
    n, box_edge = 700, 5.0
    x = _random_config(n, box_edge, seed=3)
    cp = CellPairLJ(n, [box_edge] * 3, CUTOFF, SWITCH, SIGMA, EPS,
                    capacity=64)
    cs = cp.build(jnp.asarray(x))
    x_back = np.asarray(cp.positions(cs))
    # build wraps into the box; compare wrapped
    xw = x - box_edge * np.floor(x / box_edge)
    np.testing.assert_allclose(x_back, xw, atol=1e-5)


def test_overflow_flag():
    n = 128
    x = np.zeros((n, 3), np.float32) + 2.0   # everyone in one cell
    cp = CellPairLJ(n, [4.6] * 3, CUTOFF, SWITCH, SIGMA, EPS, capacity=16)
    cs = cp.build(jnp.asarray(x))
    assert bool(cs.overflow)


def test_baoab_chunk_runs_and_conserves_sanity():
    n, box_edge = 512, 5.8
    x = _random_config(n, box_edge, seed=5)
    kT = 0.008314462618 * 120.0
    cp = CellPairLJ(n, [box_edge] * 3, CUTOFF, SWITCH, SIGMA, EPS,
                    capacity=64, r2_mode="vpu")
    v0 = (np.sqrt(kT / 39.9)
          * np.random.default_rng(1).normal(size=(n, 3))).astype(np.float32)
    cs = cp.build(jnp.asarray(x), jnp.asarray(v0))
    cs, U, _ = baoab_chunk(cp, cs, jnp.float32(kT), (0.002, 1.0, 39.9),
                           jax.random.PRNGKey(0), 120, 40)
    assert not bool(cs.overflow)
    xg = np.asarray(cp.positions(cs))
    assert np.isfinite(xg).all()
    assert np.isfinite(float(U))
    # instantaneous temperature within a loose window of the target
    vg = np.asarray(cp.scatter_back(cs, cs.v))
    T = (39.9 * (vg ** 2)).sum() / (3 * n * 0.008314462618)
    assert 60.0 < T < 220.0, T
