"""Restraint force tests (analog of reference tests/test_forces.py)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.constants import STANDARD_STATE_VOLUME, kB
from openmmtools_tpu.forces import (
    FlatBottomRestraintBondForce,
    FlatBottomRestraintForce,
    HarmonicRestraintBondForce,
    HarmonicRestraintForce,
    MultipleForcesError,
    NoForceFoundError,
    PositionalRestraintTerm,
    find_forces,
    restrain_atoms,
)
from openmmtools_tpu.models import LennardJonesPair
from openmmtools_tpu.states import SamplerState, ThermodynamicState
from openmmtools_tpu.system import NonbondedTerm


def test_harmonic_restraint_energy_and_control():
    f = HarmonicRestraintForce(
        spring_constant=jnp.asarray(100.0),
        group1=jnp.asarray([0], dtype=jnp.int32),
        group2=jnp.asarray([1], dtype=jnp.int32))
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0]])
    u = float(f.energy(x, None, None))
    assert np.isclose(u, 0.5 * 100.0 * 0.09, rtol=1e-5)
    u_half = float(f.energy(x, None, {"lambda_restraints": 0.5}))
    assert np.isclose(u_half, 0.5 * u, rtol=1e-6)
    r = float(f.distance_at_energy(jnp.asarray(u)))
    assert np.isclose(r, 0.3, rtol=1e-5)


def test_harmonic_ssc_analytic():
    """Standard-state correction matches the analytic harmonic volume."""
    K, T = 400.0, 300.0
    f = HarmonicRestraintBondForce(spring_constant=jnp.asarray(K))
    ssc = f.compute_standard_state_correction(T)
    v_restraint = (2.0 * math.pi * kB * T / K) ** 1.5
    assert np.isclose(ssc, -math.log(STANDARD_STATE_VOLUME / v_restraint),
                      rtol=1e-6)


def test_flat_bottom_energy():
    f = FlatBottomRestraintBondForce(
        spring_constant=jnp.asarray(100.0), well_radius=jnp.asarray(0.2))
    x_in = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
    x_out = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    assert float(f.energy(x_in, None, None)) == 0.0
    assert np.isclose(float(f.energy(x_out, None, None)),
                      0.5 * 100.0 * 0.3**2, rtol=1e-5)


def test_flat_bottom_ssc_converges_to_well_volume():
    """Stiff spring: V_restraint -> well volume."""
    f = FlatBottomRestraintBondForce(
        spring_constant=jnp.asarray(1e6), well_radius=jnp.asarray(0.5))
    ssc = f.compute_standard_state_correction(300.0)
    v_well = 4.0 / 3.0 * math.pi * 0.5**3
    assert np.isclose(ssc, -math.log(STANDARD_STATE_VOLUME / v_well),
                      atol=0.02)


def test_centroid_restraint_matches_hand_computed_distance():
    """Multi-atom groups restrain the distance between group centroids
    (reference RadiallySymmetricCentroidRestraintForce, forces.py:854)."""
    f = HarmonicRestraintForce(
        spring_constant=jnp.asarray(200.0),
        group1=jnp.asarray([0, 1, 2], dtype=jnp.int32),
        group2=jnp.asarray([3, 4], dtype=jnp.int32))
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0], [0.1, 0.3, 0.0],
                     [1.0, 0.0, 0.0], [1.0, 0.4, 0.0]])
    c1 = np.mean(np.asarray(x)[:3], axis=0)
    c2 = np.mean(np.asarray(x)[3:], axis=0)
    r = np.linalg.norm(c1 - c2)
    assert np.isclose(float(f.energy(x, None, None)), 0.5 * 200.0 * r * r,
                      rtol=1e-5)
    # single-atom groups reduce to the bond variant
    fb = HarmonicRestraintBondForce(spring_constant=jnp.asarray(200.0),
                                    atom1=0, atom2=3)
    fc = HarmonicRestraintForce(
        spring_constant=jnp.asarray(200.0),
        group1=jnp.asarray([0], dtype=jnp.int32),
        group2=jnp.asarray([3], dtype=jnp.int32))
    assert np.isclose(float(fb.energy(x, None, None)),
                      float(fc.energy(x, None, None)), rtol=1e-6)


def test_flat_bottom_centroid_well_and_control():
    """Centroid flat-bottom: zero inside the well, harmonic in (r-r0) beyond,
    scaled by the controlling parameter (forces.py:1013)."""
    f = FlatBottomRestraintForce(
        spring_constant=jnp.asarray(100.0), well_radius=jnp.asarray(0.5),
        group1=jnp.asarray([0, 1], dtype=jnp.int32),
        group2=jnp.asarray([2, 3], dtype=jnp.int32))
    # centroids 0.3 apart -> inside the well
    x_in = jnp.asarray([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0],
                        [0.3, 0.1, 0.0], [0.3, -0.1, 0.0]])
    assert float(f.energy(x_in, None, None)) == 0.0
    # centroids (0.1,0,0) and (0.9,0,0): 0.8 apart -> 0.3 beyond the well edge
    x_out = jnp.asarray([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0],
                         [0.9, 0.1, 0.0], [0.9, -0.1, 0.0]])
    u = float(f.energy(x_out, None, None))
    assert np.isclose(u, 0.5 * 100.0 * 0.3**2, rtol=1e-5)
    u_quarter = float(f.energy(x_out, None, {"lambda_restraints": 0.25}))
    assert np.isclose(u_quarter, 0.25 * u, rtol=1e-6)


def test_harmonic_ssc_square_well_modes():
    """Square-well SSC uses the cutoff sphere volume / max_volume and
    requires one of them (reference forces.py:400-670)."""
    f = HarmonicRestraintBondForce(spring_constant=jnp.asarray(400.0))
    with pytest.raises(ValueError):
        f.compute_standard_state_correction(300.0, square_well=True)
    rc = 0.8
    ssc_r = f.compute_standard_state_correction(300.0, square_well=True,
                                                radius_cutoff=rc)
    v = 4.0 / 3.0 * math.pi * rc**3
    assert np.isclose(ssc_r, -math.log(STANDARD_STATE_VOLUME / v), rtol=1e-6)
    ssc_v = f.compute_standard_state_correction(300.0, square_well=True,
                                                max_volume=v)
    assert np.isclose(ssc_v, ssc_r, rtol=1e-12)


def test_find_forces():
    pair = LennardJonesPair()
    matches = find_forces(pair.system, NonbondedTerm)
    assert len(matches) == 1
    i, term = find_forces(pair.system, NonbondedTerm, only_one=True)
    assert isinstance(term, NonbondedTerm)
    with pytest.raises(NoForceFoundError):
        find_forces(pair.system, HarmonicRestraintForce, only_one=True)
    # regex mode
    assert len(find_forces(pair.system, "Nonbonded.*")) == 1


def test_restrain_atoms():
    pair = LennardJonesPair()
    system = restrain_atoms(pair.system, pair.positions, [0, 1], sigma=0.2)
    assert len(system.terms) == len(pair.system.terms) + 1
    state = ThermodynamicState(system, jnp.asarray(300.0))
    # at the reference positions the restraint energy contribution is 0
    u0 = float(state.potential_energy(pair.sampler_state()))
    u_ref = float(ThermodynamicState(pair.system, jnp.asarray(300.0))
                  .potential_energy(pair.sampler_state()))
    assert np.isclose(u0, u_ref, rtol=1e-6)
    # displaced -> restraint kicks in
    x2 = pair.positions + 0.1
    # uniform translation: restraint penalizes (it's positional), LJ doesn't
    u2 = float(state.potential_energy(SamplerState(positions=x2)))
    assert u2 > u0


def test_restraint_with_alchemical_control_in_state():
    """Restraint controlled through ThermodynamicState.global_params."""
    pair = LennardJonesPair()
    f = HarmonicRestraintBondForce(spring_constant=jnp.asarray(50.0))
    system = pair.system.replace(terms=pair.system.terms + (f,))
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.4, 0.0, 0.0]])
    ss = SamplerState(positions=x)
    on = ThermodynamicState(system, jnp.asarray(300.0),
                            global_params={"lambda_restraints": 1.0})
    off = ThermodynamicState(system, jnp.asarray(300.0),
                             global_params={"lambda_restraints": 0.0})
    du = float(on.potential_energy(ss)) - float(off.potential_energy(ss))
    assert np.isclose(du, 0.5 * 50.0 * 0.16, rtol=1e-5)


def test_restrain_atoms_by_dsl():
    """DSL-driven positional restraints (forcefactories.py:93)."""
    import os

    if not os.path.exists(
            "/root/reference/openmmtools/data/alanine-dipeptide-gbsa"):
        pytest.skip("reference data files not available")
    from openmmtools_tpu.forces import restrain_atoms_by_dsl
    from openmmtools_tpu.models import AlanineDipeptideVacuum

    ala = AlanineDipeptideVacuum()
    system = restrain_atoms_by_dsl(ala.system, ala.positions, ala.topology,
                                   "protein and name CA")
    assert len(system.terms) == len(ala.system.terms) + 1
    assert system.terms[-1].particles.shape[0] == 1
    with pytest.raises(ValueError):
        restrain_atoms_by_dsl(ala.system, ala.positions, ala.topology,
                              "resname BOGUS")


def test_restraint_volume_integrated_matches_analytic():
    """Reference test_compute_restraint_volume (test_forces.py:233): the
    classes' analytic/shortcut restraint volumes agree with shortcut-free
    numerical integration across the square_well x energy_cutoff x
    radius_cutoff matrix (energy cutoffs in kT, radii in nm)."""
    from openmmtools_tpu.forces import integrate_restraint_volume

    T = 300.0
    restraints = [
        HarmonicRestraintBondForce(spring_constant=jnp.asarray(400.0)),
        FlatBottomRestraintBondForce(spring_constant=jnp.asarray(200.0),
                                     well_radius=jnp.asarray(0.5)),
    ]
    energy_cutoffs = [0.0, 5.0, 10.0]
    radius_cutoffs = [0.05, 0.6, 2.0]

    def assert_close(restraint, square_well, radius_cutoff, energy_cutoff):
        analytic = restraint.compute_restraint_volume(
            T, square_well, radius_cutoff, energy_cutoff)
        # shortcut-free oracle: quad over the raw radial potential with a
        # generous, numerically informed domain (no analytic inner sphere)
        r_hi = getattr(restraint, "well_radius", 0.0)
        r_hi = float(r_hi) + 20.0 * math.sqrt(
            kB * T / float(restraint.spring_constant))
        # the classes default the energy wall to 100 kT; the oracle must
        # share that wall to test the shortcut math, not the default
        ec = 100.0 if energy_cutoff is None else energy_cutoff
        integrated = integrate_restraint_volume(
            restraint.radial_potential, T, square_well=square_well,
            radius_cutoff=radius_cutoff, energy_cutoff=ec,
            r_max=r_hi)
        assert np.isclose(integrated, analytic, rtol=1e-2, atol=1e-9), (
            f"{type(restraint).__name__}: square_well={square_well}, "
            f"radius_cutoff={radius_cutoff}, energy_cutoff={energy_cutoff}: "
            f"integrated={integrated}, analytic={analytic}")

    for restraint in restraints:
        assert_close(restraint, False, None, None)
        for square_well in (True, False):
            for ec in energy_cutoffs:
                assert_close(restraint, square_well, None, ec)
            for rc in radius_cutoffs:
                assert_close(restraint, square_well, rc, None)
            for ec, rc in zip(energy_cutoffs, radius_cutoffs):
                assert_close(restraint, square_well, rc, ec)
            for ec, rc in zip(energy_cutoffs, reversed(radius_cutoffs)):
                assert_close(restraint, square_well, rc, ec)


def test_ssc_energy_cutoff_and_max_volume_bound():
    """Energy-cutoff SSC path + the max_volume bound
    (reference forces.py:440-459)."""
    f = HarmonicRestraintBondForce(spring_constant=jnp.asarray(400.0))
    T = 300.0
    # a tight energy cutoff shrinks the restraint volume -> larger -ln(V0/V)
    ssc_tight = f.compute_standard_state_correction(T, energy_cutoff=0.5)
    ssc_loose = f.compute_standard_state_correction(T, energy_cutoff=100.0)
    assert ssc_tight < ssc_loose
    # max_volume bounds the volume from above
    v_tiny = 1e-6
    ssc_bounded = f.compute_standard_state_correction(T, max_volume=v_tiny)
    assert np.isclose(
        ssc_bounded,
        -math.log(STANDARD_STATE_VOLUME / v_tiny), rtol=1e-10)
