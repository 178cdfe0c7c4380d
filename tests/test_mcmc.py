"""MCMC move framework tests (analog of reference mcmc tests in
tests/test_mcmc.py): move application, statistics, NaN recovery, barostat."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.constants import BAR_TO_KJ_PER_MOL_NM3, kB
from openmmtools_tpu.mcmc import (
    GHMCMove,
    HMCMove,
    IntegratorMoveError,
    LangevinDynamicsMove,
    LangevinSplittingDynamicsMove,
    MCDisplacementMove,
    MCMCMoveError,
    MCMCSampler,
    MCRotationMove,
    MonteCarloBarostatMove,
    SequenceMove,
    WeightedMove,
)
from openmmtools_tpu.models import HarmonicOscillator, IdealGas
from openmmtools_tpu.states import SamplerState

TEMP = 300.0


@pytest.fixture(scope="module")
def ho():
    return HarmonicOscillator()


def test_langevin_move_samples(ho):
    move = LangevinDynamicsMove(timestep=0.002, collision_rate=20.0,
                                n_steps=200)
    state = ho.thermodynamic_state(TEMP)
    ss = SamplerState(positions=ho.positions)
    us = []
    for _ in range(40):
        ss = move.apply(state, ss)
        us.append(float(state.potential_energy(ss)))
    mean_u = np.mean(us[10:])
    assert abs(mean_u - 1.5 * kB * TEMP) < 0.3 * 1.5 * kB * TEMP


def test_ghmc_move_statistics(ho):
    move = GHMCMove(timestep=0.004, n_steps=100)
    state = ho.thermodynamic_state(TEMP)
    ss = SamplerState(positions=ho.positions)
    for _ in range(3):
        ss = move.apply(state, ss)
    assert move.n_proposed == 300
    assert 0 < move.n_accepted <= 300
    stats = move.statistics
    move.statistics = {"n_accepted": 0, "n_proposed": 0}
    assert move.n_proposed == 0
    move.statistics = stats
    assert move.n_proposed == 300


def test_hmc_move_runs(ho):
    move = HMCMove(timestep=0.002, n_inner_steps=5, n_steps=2)
    state = ho.thermodynamic_state(TEMP)
    ss = move.apply(state, SamplerState(positions=ho.positions))
    assert not bool(ss.has_nan())
    assert move.n_proposed == 2  # one application x n_steps=2 (1 block/step)


def test_sequence_and_weighted_moves(ho):
    state = ho.thermodynamic_state(TEMP)
    seq = SequenceMove([LangevinDynamicsMove(n_steps=10, timestep=0.002),
                        GHMCMove(n_steps=10, timestep=0.002)])
    ss = seq.apply(state, SamplerState(positions=ho.positions))
    assert not bool(ss.has_nan())
    assert isinstance(seq.statistics, list)

    wm = WeightedMove([(LangevinDynamicsMove(n_steps=10, timestep=0.002), 0.5),
                       (GHMCMove(n_steps=10, timestep=0.002), 0.5)])
    ss = wm.apply(state, ss)
    assert not bool(ss.has_nan())


def test_displacement_move_free_particle():
    """On an ideal gas the displacement move always accepts."""
    gas = IdealGas(nparticles=8)
    move = MCDisplacementMove(displacement_sigma=0.5, atom_subset=[0])
    state = gas.thermodynamic_state(TEMP)
    ss = gas.sampler_state()
    x0 = np.asarray(ss.positions[0])
    for _ in range(5):
        ss = move.apply(state, ss)
    assert move.n_accepted == 5
    assert not np.allclose(np.asarray(ss.positions[0]), x0)
    # other particles untouched
    assert np.allclose(np.asarray(ss.positions[1:]), np.asarray(gas.positions[1:]))


def test_rotation_move_preserves_shape(ho):
    """Rotation about the centroid preserves pairwise distances."""
    from openmmtools_tpu.models import Diatom

    d = Diatom()
    move = MCRotationMove()
    state = d.thermodynamic_state(TEMP)
    ss = d.sampler_state()
    r0 = float(jnp.linalg.norm(ss.positions[0] - ss.positions[1]))
    for _ in range(5):
        ss = move.apply(state, ss)
    r1 = float(jnp.linalg.norm(ss.positions[0] - ss.positions[1]))
    assert np.isclose(r0, r1, rtol=1e-5)
    assert move.n_accepted >= 1


def test_barostat_move_ideal_gas_volume():
    """NPT ideal gas: <V> = (N+1) kT / p sampled by the native barostat."""
    n = 32
    gas = IdealGas(nparticles=n)
    state = gas.thermodynamic_state(gas.temperature0, pressure=gas.pressure0)
    move = MonteCarloBarostatMove(volume_scale=0.15, seed=3)
    ss = gas.sampler_state()
    vols = []
    for i in range(400):
        ss = move.apply(state, ss)
        if i >= 100:
            vols.append(float(ss.volume))
    v_mean = np.mean(vols)
    v_expected = (n + 1) * kB * gas.temperature0 / (
        gas.pressure0 * BAR_TO_KJ_PER_MOL_NM3)
    stderr = np.std(vols) / math.sqrt(len(vols) / 20)  # crude decorrelation
    assert abs(v_mean - v_expected) < max(6 * stderr, 0.1 * v_expected), (
        f"<V>={v_mean:.1f} expected {v_expected:.1f}")
    assert 0.2 < move.n_accepted / move.n_proposed <= 1.0


def test_nan_restart_and_error(ho, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    move = LangevinDynamicsMove(timestep=1000.0, n_steps=60,
                                n_restart_attempts=1)
    state = ho.thermodynamic_state(TEMP)
    ss = SamplerState(positions=jnp.asarray([[100.0, 0.0, 0.0]]))
    with pytest.raises(IntegratorMoveError):
        move.apply(state, ss)
    assert (tmp_path / "nan-error-logs").exists()


def test_mcmc_sampler(ho):
    sampler = MCMCSampler(ho.thermodynamic_state(TEMP),
                          SamplerState(positions=jnp.asarray([[0.5, 0.0, 0.0]])),
                          move=LangevinDynamicsMove(n_steps=50, timestep=0.002))
    sampler.minimize(max_iterations=100)
    u_min = float(sampler.thermodynamic_state.potential_energy(sampler.sampler_state))
    assert u_min < 1.0
    sampler.run(3)
    assert not bool(sampler.sampler_state.has_nan())


def test_barostat_move_scales_molecule_centroids():
    """Rigid/bonded molecules translate as units under the barostat, so
    internal distances are exactly preserved (OpenMM MonteCarloBarostat
    molecule-centroid scaling; ADVICE round-1 item 2)."""
    from openmmtools_tpu.states import SamplerState, ThermodynamicState
    from openmmtools_tpu.system import (
        Constraints,
        NonbondedTerm,
        System,
    )

    rng = np.random.default_rng(0)
    n_mol, L = 16, 4.0
    centers = rng.uniform(0.5, L - 0.5, (n_mol, 3))
    bond = 0.12
    x = np.empty((2 * n_mol, 3), np.float32)
    x[0::2] = centers - [bond / 2, 0, 0]
    x[1::2] = centers + [bond / 2, 0, 0]
    cons = Constraints(
        index=jnp.asarray([[2 * i, 2 * i + 1] for i in range(n_mol)],
                          jnp.int32),
        distance=jnp.full((n_mol,), bond, jnp.float32))
    zero2 = jnp.zeros((0, 2), jnp.int32)
    zero = jnp.zeros((0,), jnp.float32)
    nb = NonbondedTerm(
        charge=jnp.zeros((2 * n_mol,), jnp.float32),
        sigma=jnp.full((2 * n_mol,), 0.25, jnp.float32),
        epsilon=jnp.full((2 * n_mol,), 0.3, jnp.float32),
        exception_index=zero2, exception_chargeprod=zero,
        exception_sigma=zero, exception_epsilon=zero,
        method="cutoff_periodic", cutoff=1.0)
    box = jnp.diag(jnp.full((3,), L, jnp.float32))
    system = System(masses=jnp.full((2 * n_mol,), 10.0, jnp.float32),
                    terms=(nb,), constraints=cons, default_box=box,
                    periodic=True)
    state = ThermodynamicState(system=system, temperature=300.0,
                               pressure=100.0)
    move = MonteCarloBarostatMove(volume_scale=0.1, seed=11)
    ss = SamplerState(positions=jnp.asarray(x), box_vectors=box)
    for _ in range(30):
        ss = move.apply(state, ss)
    assert move.n_accepted >= 1
    d = np.linalg.norm(np.asarray(ss.positions[0::2] - ss.positions[1::2]),
                       axis=1)
    np.testing.assert_allclose(d, bond, rtol=1e-5)
    # volume actually moved
    assert abs(float(ss.volume) - L**3) > 1e-3


# ---------------------------------------------------------------------------
# Reference-parity depth (tests/test_mcmc.py:97 test_mcmc_expectations,
# :463 test_moves_serialization, :544 test_metropolized_moves,
# :251 test_barostat_move_frequency)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("move_factory", [
    lambda: LangevinDynamicsMove(timestep=0.002, collision_rate=20.0,
                                 n_steps=150),
    lambda: LangevinSplittingDynamicsMove(
        splitting="O V R V O", timestep=0.002, collision_rate=20.0,
        n_steps=150),
    lambda: GHMCMove(timestep=0.004, n_steps=150),
    lambda: SequenceMove([
        LangevinDynamicsMove(timestep=0.002, collision_rate=20.0,
                             n_steps=75),
        GHMCMove(timestep=0.004, n_steps=75)]),
    lambda: WeightedMove([
        (LangevinDynamicsMove(timestep=0.002, collision_rate=20.0,
                              n_steps=150), 0.5),
        (GHMCMove(timestep=0.004, n_steps=150), 0.5)]),
], ids=["langevin", "splitting", "ghmc", "sequence", "weighted"])
def test_mcmc_expectations_battery(ho, move_factory):
    """Every move family reproduces <U> = 3/2 kT on the harmonic
    oscillator (reference test_mcmc_expectations)."""
    move = move_factory()
    state = ho.thermodynamic_state(TEMP)
    ss = SamplerState(positions=ho.positions)
    us = []
    for _ in range(40):
        ss = move.apply(state, ss)
        us.append(float(state.potential_energy(ss)))
    mean_u = np.mean(us[10:])
    expected = 1.5 * kB * TEMP
    assert abs(mean_u - expected) < 0.35 * expected, (mean_u, expected)


def test_moves_serialization_round_trip():
    """Moves round-trip through serialize/deserialize with statistics and
    nested containers intact (reference test_moves_serialization)."""
    from openmmtools_tpu.utils.serialization import deserialize, serialize

    move = SequenceMove([
        LangevinDynamicsMove(timestep=0.004, collision_rate=3.0, n_steps=10),
        WeightedMove([(GHMCMove(timestep=0.002, n_steps=5), 0.25),
                      (MCDisplacementMove(displacement_sigma=0.2), 0.75)]),
    ])
    data = serialize(move)
    back = deserialize(data)
    assert isinstance(back, SequenceMove)
    assert back.move_list[0].n_steps == 10
    assert back.move_list[0].timestep == 0.004
    inner = back.move_list[1]
    assert isinstance(inner, WeightedMove)
    assert [w for _, w in inner.move_set] == [0.25, 0.75]
    assert inner.move_set[1][0].displacement_sigma == 0.2


def test_metropolized_move_statistics(ho):
    """Displacement/rotation moves track and reset acceptance statistics
    (reference test_metropolized_moves)."""
    # sigma_x of this oscillator is sqrt(kT/K) ~ 0.0077 nm: proposals at
    # 0.008 nm get O(30%) Metropolis acceptance (0.05 would be ~e^-21)
    move = MCDisplacementMove(displacement_sigma=0.008)
    state = ho.thermodynamic_state(TEMP)
    ss = SamplerState(positions=jnp.zeros((1, 3)))
    for _ in range(30):
        ss = move.apply(state, ss)
    assert move.n_proposed == 30
    assert 0 < move.n_accepted <= 30
    frac = move.n_accepted / move.n_proposed
    assert 0.1 < frac <= 1.0
    move.statistics = {"n_accepted": 0, "n_proposed": 0}
    assert move.n_accepted == 0 and move.n_proposed == 0

    rot = MCRotationMove(atom_subset=[0])
    ss = SamplerState(positions=jnp.asarray([[0.1, 0.0, 0.0]]))
    for _ in range(10):
        ss = rot.apply(state, ss)
    assert rot.n_proposed == 10


def test_sequence_move_preserves_statistics_order(ho):
    """SequenceMove applies in order; each submove keeps its own stats."""
    g1 = GHMCMove(timestep=0.004, n_steps=10)
    g2 = GHMCMove(timestep=0.004, n_steps=20)
    seq = SequenceMove([g1, g2])
    state = ho.thermodynamic_state(TEMP)
    ss = SamplerState(positions=ho.positions)
    for _ in range(4):
        ss = seq.apply(state, ss)
    assert g1.n_proposed == 40
    assert g2.n_proposed == 80

def test_barostat_move_n_attempts():
    """Reference MonteCarloBarostatMove.n_attempts (mcmc.py:1645): each
    apply makes n_attempts scanned MC volume attempts; statistics count
    every attempt, and the NPT ideal-gas <V> stays exact."""
    gas = IdealGas(nparticles=64)
    temperature, pressure = 300.0, 2.0
    ts = gas.thermodynamic_state(temperature=temperature).replace(
        pressure=pressure)
    move = MonteCarloBarostatMove(volume_scale=0.05, n_attempts=4, seed=7)
    ss = gas.sampler_state()
    vols = []
    for i in range(400):
        ss = move.apply(ts, ss)
        vols.append(float(ss.volume))
    assert move.statistics["n_proposed"] == 400 * 4
    assert 0 < move.statistics["n_accepted"] <= move.statistics["n_proposed"]
    # <V> = (N+1) kT / p for the MC-barostat ideal gas ensemble
    expect = (64 + 1) * kB * temperature / (pressure * BAR_TO_KJ_PER_MOL_NM3)
    mean_v = np.mean(vols[100:])
    sem = np.std(vols[100:]) / np.sqrt(len(vols[100:]) / 10)
    assert abs(mean_v - expect) < max(6 * sem, 0.1 * expect), (mean_v, expect)


def test_barostat_move_requires_npt():
    """A barostat move on an NVT state raises (reference mcmc.py:1674)."""
    gas = IdealGas(nparticles=8)
    ts = gas.thermodynamic_state(temperature=300.0)
    move = MonteCarloBarostatMove()
    with pytest.raises(MCMCMoveError, match="NPT"):
        move.apply(ts, gas.sampler_state())
