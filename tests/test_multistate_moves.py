"""Arbitrary MCMC move programs inside the fused multistate iteration.

The reference MultiStateSampler accepts ANY MCMCMove per state
(multistatesampler.py:63; _propagate_replica calls mcmc_move.apply
generically at :1313) — in production that is
``SequenceMove([LangevinDynamicsMove, MonteCarloBarostatMove])`` for NPT
replica exchange (mcmc.py:1597 exists precisely for this). These tests
validate the TPU analog: move trees compiled into the fused iteration
program, per-replica boxes flowing through the energy matrix, and
NPT checkpoint/resume continuity.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.constants import BAR_TO_KJ_PER_MOL_NM3, kB
from openmmtools_tpu.mcmc import (
    LangevinDynamicsMove,
    MCDisplacementMove,
    MonteCarloBarostatMove,
    SequenceMove,
    WeightedMove,
)
from openmmtools_tpu.models import HarmonicOscillator, IdealGas
from openmmtools_tpu.multistate import (
    MultiStateReporter,
    MultiStateSampler,
    ReplicaExchangeSampler,
)
from openmmtools_tpu.states import SamplerState

TEMP = 300.0


def _npt_gas_states(n=32, temps=(300.0, 350.0, 400.0)):
    gas = IdealGas(nparticles=n)
    states = [gas.thermodynamic_state(t, pressure=gas.pressure0)
              for t in temps]
    return gas, states, temps


def _npt_move(n_steps=5, volume_scale=0.25, n_attempts=3):
    return SequenceMove([
        LangevinDynamicsMove(timestep=0.002, n_steps=n_steps),
        MonteCarloBarostatMove(volume_scale=volume_scale,
                               n_attempts=n_attempts),
    ])


def test_npt_remd_ideal_gas_volume_per_state():
    """NPT replica exchange with SequenceMove([Langevin, MC barostat]):
    <V> at each state of the temperature ladder matches the exact ideal-gas
    result (N+1) kT / p (the reference's bread-and-butter NPT REMD workflow,
    multistatesampler.py:63 + mcmc.py:1597)."""
    n = 32
    gas, states, temps = _npt_gas_states(n=n)
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_npt_move(), number_of_iterations=2000,
        online_analysis_interval=None, iterations_per_sync=50, rng_seed=11)
    sampler.create(states, [gas.sampler_state()], storage=None)

    vols = {k: [] for k in range(len(temps))}
    it = 0
    while it < 2000:
        sampler.run(50)
        it += 50
        if it <= 500:
            continue
        s = sampler.replica_states
        boxes = np.asarray(sampler._carry.boxes)
        for r in range(len(temps)):
            vols[s[r]].append(np.linalg.det(boxes[r]))

    stats = sampler.move_statistics
    assert stats.shape == (1, 2)
    acc, prop = stats[0]
    assert prop == 2000 * 3 * len(temps)
    assert 0.3 < acc / prop <= 1.0

    for k, t in enumerate(temps):
        v_expected = (n + 1) * kB * t / (gas.pressure0
                                         * BAR_TO_KJ_PER_MOL_NM3)
        v_mean = np.mean(vols[k])
        sem = np.std(vols[k]) / math.sqrt(len(vols[k]))
        assert abs(v_mean - v_expected) < max(5 * sem, 0.05 * v_expected), (
            f"state {k}: <V>={v_mean:.1f} expected {v_expected:.1f} "
            f"sem {sem:.1f}")

    # swap mixing actually happened across the ladder
    assert int(np.asarray(sampler._carry.n_accepted).sum()) > 0


def test_npt_energy_matrix_uses_replica_boxes():
    """The N x K reduced-potential matrix must be evaluated with each
    replica's OWN post-move box (u = beta_k [U(x_n; box_n) + p_k V_n]) —
    the reference computes u_kn from the propagated contexts
    (multistatesampler.py:1437)."""
    gas, states, temps = _npt_gas_states(n=16)
    sampler = ReplicaExchangeSampler(
        mcmc_moves=_npt_move(n_steps=3, n_attempts=2),
        number_of_iterations=10, online_analysis_interval=None, rng_seed=5)
    sampler.create(states, [gas.sampler_state()], storage=None)
    sampler.run()

    boxes = np.asarray(sampler._carry.boxes)
    # boxes diverged per replica (barostat at different temperatures)
    assert not np.allclose(boxes[0], boxes[1])

    u = np.asarray(sampler._carry.energies)
    for r in range(len(temps)):
        ss = SamplerState(positions=sampler._carry.positions[r],
                          box_vectors=sampler._carry.boxes[r])
        for k, ts in enumerate(states):
            expected = float(ts.reduced_potential(ss))
            assert np.isclose(u[r, k], expected, rtol=1e-5, atol=1e-5), (
                r, k, u[r, k], expected)


def test_npt_remd_checkpoint_resume_bitwise(tmp_path):
    """NPT resume continuity: 3 iterations + checkpoint + resume + 3 must
    equal 6 straight iterations bitwise, including the per-replica boxes
    (checkpoint stores box vectors; the counter-based RNG stream continues
    where it stopped)."""
    gas, states, _ = _npt_gas_states(n=16)

    def fresh(n_iter, storage=None):
        s = ReplicaExchangeSampler(
            mcmc_moves=_npt_move(n_steps=3, n_attempts=2),
            number_of_iterations=n_iter, online_analysis_interval=None,
            rng_seed=7)
        s.create(states, [gas.sampler_state()], storage=storage)
        return s

    sampler_a = fresh(6)
    sampler_a.run()
    x_a = np.asarray(sampler_a._carry.positions)
    b_a = np.asarray(sampler_a._carry.boxes)
    u_a = np.asarray(sampler_a.energies_last_iteration)

    path = str(tmp_path / "npt-split.h5")
    reporter = MultiStateReporter(path, checkpoint_interval=1)
    sampler_b = fresh(6, storage=reporter)
    sampler_b.run(3)
    reporter.close()
    resumed = ReplicaExchangeSampler.from_storage(
        MultiStateReporter(path, checkpoint_interval=1))
    assert int(resumed._carry.iteration) == 3
    assert resumed._carry.boxes is not None
    resumed.run(3)

    np.testing.assert_array_equal(x_a, np.asarray(resumed._carry.positions))
    np.testing.assert_array_equal(b_a, np.asarray(resumed._carry.boxes))
    np.testing.assert_array_equal(u_a,
                                  np.asarray(resumed.energies_last_iteration))


def test_weighted_and_displacement_moves_fused():
    """WeightedMove + MCDisplacementMove compile into the fused program:
    a displacement-only sampler still equilibrates the harmonic-oscillator
    ladder (configurational <x^2> = kT/K per state)."""
    K = [100.0, 400.0]
    ho = HarmonicOscillator(K=K[0])
    from openmmtools_tpu.states import create_thermodynamic_state_protocol

    states = create_thermodynamic_state_protocol(
        ho.thermodynamic_state(TEMP),
        protocol={"testsystems_HarmonicOscillator_K": K})
    move = WeightedMove([
        (MCDisplacementMove(displacement_sigma=0.3), 0.5),
        (SequenceMove([MCDisplacementMove(displacement_sigma=0.1),
                       MCDisplacementMove(displacement_sigma=0.5)]), 0.5),
    ])
    sampler = MultiStateSampler(
        mcmc_moves=move, number_of_iterations=3000,
        online_analysis_interval=None, iterations_per_sync=100, rng_seed=3)
    sampler.create(states, SamplerState(
        positions=jnp.zeros((1, 3), jnp.float32)))

    x2 = {k: [] for k in range(2)}
    it = 0
    while it < 3000:
        sampler.run(100)
        it += 100
        if it <= 500:
            continue
        s = sampler.replica_states
        xs = np.asarray(sampler._carry.positions)
        for r in range(2):
            x2[s[r]].append(float((xs[r] ** 2).sum()))

    # stats: 3 metropolized segments (one per leaf, traversal order),
    # proposals split between the two weighted branches
    stats = sampler.move_statistics
    assert stats.shape == (3, 2)
    total_prop = int(stats[:, 1].sum())
    assert total_prop > 0
    # branch 1 contributes 2 proposals per selection, branch 0 one
    assert int(stats[0, 1]) > 0 and int(stats[1, 1]) > 0
    assert int(stats[1, 1]) == int(stats[2, 1])

    for k in range(2):
        expected = 3.0 * kB * TEMP / K[k]
        m = np.mean(x2[k])
        sem = np.std(x2[k]) / math.sqrt(len(x2[k]))
        assert abs(m - expected) < max(6 * sem, 0.15 * expected), (
            k, m, expected, sem)


def test_heterogeneous_move_programs_stat_padding():
    """Per-state move programs with DIFFERENT statistics shapes (state 0
    runs Langevin+barostat, state 1 plain Langevin): branch outputs pad to
    the max segment count and only the barostat state accumulates."""
    gas, states, _ = _npt_gas_states(n=16, temps=(300.0, 400.0))
    moves = [_npt_move(n_steps=3, n_attempts=2),
             LangevinDynamicsMove(timestep=0.002, n_steps=3)]
    sampler = MultiStateSampler(
        mcmc_moves=moves, number_of_iterations=20,
        online_analysis_interval=None, rng_seed=13)
    sampler.create(states, [gas.sampler_state()], storage=None)
    sampler.run()
    stats = sampler.move_statistics
    assert stats.shape == (1, 2)
    # one replica per state each iteration -> exactly 20 iters x 2 attempts
    # from the barostat state (MultiStateSampler has no mixing)
    assert int(stats[0, 1]) == 20 * 2
    assert np.all(np.isfinite(sampler.energies_last_iteration))


def test_mc_barostat_requires_npt_states():
    """A barostat segment over NVT thermodynamic states is a compile-time
    TypeError, not silent wrong physics."""
    gas = IdealGas(nparticles=8)
    states = [gas.thermodynamic_state(t) for t in (300.0, 400.0)]  # NVT
    sampler = MultiStateSampler(
        mcmc_moves=_npt_move(), number_of_iterations=1,
        online_analysis_interval=None)
    with pytest.raises(TypeError, match="NPT|pressure"):
        sampler.create(states, [gas.sampler_state()], storage=None)
        sampler.run()


def test_unsupported_move_type_is_loud():
    class Bogus:
        pass

    sampler = MultiStateSampler(mcmc_moves=Bogus(), number_of_iterations=1)
    gas = IdealGas(nparticles=8)
    states = [gas.thermodynamic_state(300.0)]
    with pytest.raises(TypeError, match="MCMCMove"):
        sampler.create(states, [gas.sampler_state()], storage=None)


@pytest.mark.slow
def test_npt_remd_waterbox_density(runslow_waterbox=None):
    """Rigid TIP3P water under NPT replica exchange (reaction-field): the
    box relaxes under the barostat, stays finite, and holds liquid density
    within a loose band — the reference's production NPT REMD shape."""
    from openmmtools_tpu.models.water import WaterBox

    wb = WaterBox(box_edge=2.0, cutoff=0.9,
                  nonbonded_method="cutoff_periodic")
    n_waters = wb.system.n_particles // 3
    states = [wb.thermodynamic_state(t, pressure=1.0)
              for t in (300.0, 320.0)]
    move = SequenceMove([
        LangevinDynamicsMove(timestep=0.001, n_steps=10),
        MonteCarloBarostatMove(volume_scale=0.02, n_attempts=1),
    ])
    sampler = ReplicaExchangeSampler(
        mcmc_moves=move, number_of_iterations=150,
        online_analysis_interval=None, iterations_per_sync=25, rng_seed=1)
    sampler.create(states, [wb.sampler_state()], storage=None)
    v0 = float(np.linalg.det(np.asarray(sampler._carry.boxes)[0]))
    sampler.run()
    boxes = np.asarray(sampler._carry.boxes)
    assert np.all(np.isfinite(np.asarray(sampler._carry.positions)))
    vols = np.linalg.det(boxes)
    assert not np.allclose(vols, v0)  # the barostat actually moved the box
    # density band: 18.015 g/mol per water, loose +-20%
    dens = n_waters * 18.015 / 6.02214076e23 / (vols * 1e-21)  # g/cm^3
    assert np.all(dens > 0.75) and np.all(dens < 1.25), dens
    acc, prop = sampler.move_statistics[0]
    assert prop == 150 * 2 and acc > 0
