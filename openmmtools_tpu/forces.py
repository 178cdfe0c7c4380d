"""Restraint forces and force utilities.

TPU-native port of ``/root/reference/openmmtools/forces.py`` (1352 LoC) and
``forcefactories.py`` (183 LoC): radially-symmetric receptor–ligand
restraints with standard-state corrections, flat-bottom restraints,
positional restraints, and the ``find_forces`` search utility. Forces are
energy-term pytrees; a restraint's "controlling global parameter" is a name
in the ``params`` dict, exactly like the reference's CustomCentroidBondForce
global parameter (forces.py:234-670).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.constants import STANDARD_STATE_VOLUME, kB
from openmmtools_tpu.ops.geometry import safe_norm
from openmmtools_tpu.system import System
from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field


class NoForceFoundError(Exception):
    """find_forces strict search failure (forces.py:44)."""


class MultipleForcesError(Exception):
    """find_forces only_one violation (forces.py:49)."""


def find_forces(system: System, force_type, only_one: bool = False,
                include_subclasses: bool = True):
    """Search a System's terms by type (find_forces analog, forces.py:63).

    Returns {index: term} (or a single (index, term) with only_one=True).
    ``force_type`` may also be a string matched against class names as a
    regular expression, mirroring the reference's regex mode.
    """
    import re

    matches = {}
    for i, term in enumerate(system.terms):
        if isinstance(force_type, str):
            if re.match(force_type, type(term).__name__):
                matches[i] = term
        elif include_subclasses and isinstance(term, force_type):
            matches[i] = term
        elif not include_subclasses and type(term) is force_type:
            matches[i] = term
    if only_one:
        if not matches:
            raise NoForceFoundError(f"no force matching {force_type!r}")
        if len(matches) > 1:
            raise MultipleForcesError(f"multiple forces match {force_type!r}")
        [(i, t)] = matches.items()
        return i, t
    return matches


def _controlled(params, name: Optional[str]):
    if name is None:
        return 1.0
    if params is None or name not in params:
        return 1.0
    return params[name]


# -- restraint-volume helpers (reference forces.py:169-225) ------------------


def _sphere_volume(radius: float) -> float:
    return 4.0 / 3.0 * math.pi * float(radius) ** 3


def _harmonic_volume(radius: float, spring_constant: float,
                     beta: float) -> float:
    """Closed form of ∫_0^R 4πr² exp(-βKr²/2) dr (forces.py:174-205)."""
    bk = beta * spring_constant
    bkr2_2 = 0.5 * bk * radius * radius
    volume = (math.sqrt(math.pi / 2.0) * math.erf(math.sqrt(bkr2_2))
              / bk ** 1.5)
    volume -= math.exp(-bkr2_2) * radius / bk
    return 4.0 * math.pi * volume


def _harmonic_radius(spring_constant: float, potential_energy: float) -> float:
    """r where (K/2)r² == potential_energy (forces.py:208-225)."""
    return math.sqrt(2.0 * potential_energy / spring_constant)


def integrate_restraint_volume(radial_potential, temperature,
                               square_well=False, radius_cutoff=None,
                               energy_cutoff=None, r_min=0.0, r_max=None,
                               analytical_volume=0.0) -> float:
    """Numeric restraint volume ∫ 4πr² exp(-βu(r)) dr with hard walls
    (reference ``_integrate_restraint_volume``, forces.py:496-590).

    ``radial_potential(r)`` returns the restraint energy in kJ/mol at
    separation r (nm); ``energy_cutoff`` is in kT and zeroes the integrand
    past it; ``square_well`` reweights the ACCESSIBLE region (as bounded by
    the cutoffs applied to the original potential) to zero energy.  The
    classes' ``compute_restraint_volume`` pick tighter limits and analytic
    shortcuts; this function is also the shortcut-free oracle the parity
    tests integrate against.
    """
    from scipy.integrate import quad

    beta = 1.0 / (kB * float(temperature))
    if r_max is None:
        r_max = 100.0  # reference fallback for non-periodic states
    if radius_cutoff is not None:
        r_max = min(r_max, float(radius_cutoff))

    def integrand(r):
        u = float(radial_potential(r))
        if energy_cutoff is not None and beta * u > energy_cutoff:
            return 0.0
        if square_well:
            u = 0.0
        return 4.0 * math.pi * r * r * math.exp(-beta * u)

    value, _ = quad(integrand, float(r_min), float(r_max), limit=200)
    return value + float(analytical_volume)


# ---------------------------------------------------------------------------
# radially-symmetric restraints (forces.py:234-1100)
# ---------------------------------------------------------------------------


@pytree_dataclass
class HarmonicRestraintForce:
    """Harmonic restraint between two groups' centroids:
    U = control * (K/2) r^2 (HarmonicRestraintForce, forces.py:854).

    ``controlling_parameter_name`` (default 'lambda_restraints') scales the
    energy, as in the reference.
    """

    spring_constant: jax.Array          # kJ/mol/nm^2
    group1: jax.Array                   # (G1,) int32 atom indices
    group2: jax.Array                   # (G2,) int32
    controlling_parameter_name: str = static_field(default="lambda_restraints")
    force_group: int = static_field(default=0)

    def _distance(self, x):
        c1 = jnp.mean(x[self.group1], axis=0)
        c2 = jnp.mean(x[self.group2], axis=0)
        return safe_norm(c1 - c2)

    def energy(self, x, box, params=None):
        lam = _controlled(params, self.controlling_parameter_name)
        r = self._distance(x)
        return lam * 0.5 * self.spring_constant * r * r

    def distance_at_energy(self, potential_energy):
        """r(U) inverse (forces.py:881)."""
        return _harmonic_radius(float(self.spring_constant),
                                float(potential_energy))

    def radial_potential(self, r: float) -> float:
        """Restraint energy (kJ/mol) at centroid separation r (nm)."""
        return 0.5 * float(self.spring_constant) * float(r) ** 2

    def compute_restraint_volume(self, temperature, square_well=False,
                                 radius_cutoff=None,
                                 energy_cutoff=None) -> float:
        """Analytic restraint volume (reference forces.py:839-851).

        ``energy_cutoff`` is in kT (hard wall where u(r) reaches it;
        default 100 kT, indistinguishable from no wall); ``radius_cutoff``
        in nm. ``square_well`` reweights the accessible region to zero
        energy (sphere volume)."""
        kT = kB * float(temperature)
        if energy_cutoff is None:
            energy_cutoff = 100.0
        radius = self.distance_at_energy(energy_cutoff * kT)
        if radius_cutoff is not None:
            radius = min(radius, float(radius_cutoff))
        if square_well:
            return _sphere_volume(radius)
        return _harmonic_volume(radius, float(self.spring_constant),
                                1.0 / kT)

    # -- standard-state correction (forces.py:400-459) -----------------------
    def compute_standard_state_correction(self, temperature, square_well=False,
                                          radius_cutoff=None,
                                          energy_cutoff=None,
                                          max_volume=None) -> float:
        """-ln(V_standard / V_restraint) with the reference's dispatch:
        pure square well (no cutoffs) needs an explicit ``max_volume``;
        square well + radius cutoff is the cutoff sphere; everything else
        goes through ``compute_restraint_volume``; ``max_volume`` bounds
        the result (the reference bounds by the periodic box volume)."""
        if square_well and energy_cutoff is None and radius_cutoff is None:
            if max_volume is None:
                raise ValueError("square_well with no cutoffs needs "
                                 "max_volume (the reference uses the "
                                 "periodic box volume)")
            v_restraint = float(max_volume)
        elif square_well and radius_cutoff is not None and energy_cutoff is None:
            v_restraint = _sphere_volume(radius_cutoff)
        else:
            v_restraint = self.compute_restraint_volume(
                temperature, square_well, radius_cutoff, energy_cutoff)
        if max_volume is not None and v_restraint > float(max_volume):
            v_restraint = float(max_volume)
        return -math.log(STANDARD_STATE_VOLUME / v_restraint)


@pytree_dataclass
class HarmonicRestraintBondForce:
    """Harmonic restraint between two single atoms (forces.py:902)."""

    spring_constant: jax.Array
    atom1: int = static_field(default=0)
    atom2: int = static_field(default=1)
    controlling_parameter_name: str = static_field(default="lambda_restraints")
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        lam = _controlled(params, self.controlling_parameter_name)
        r = safe_norm(x[self.atom1] - x[self.atom2])
        return lam * 0.5 * self.spring_constant * r * r

    distance_at_energy = HarmonicRestraintForce.distance_at_energy
    radial_potential = HarmonicRestraintForce.radial_potential
    compute_restraint_volume = HarmonicRestraintForce.compute_restraint_volume
    compute_standard_state_correction = (
        HarmonicRestraintForce.compute_standard_state_correction)


@pytree_dataclass
class FlatBottomRestraintForce:
    """Flat-bottom centroid restraint: U = control * step(r - r0) (K/2)(r-r0)^2
    (FlatBottomRestraintForce, forces.py:1013)."""

    spring_constant: jax.Array
    well_radius: jax.Array              # nm
    group1: jax.Array
    group2: jax.Array
    controlling_parameter_name: str = static_field(default="lambda_restraints")
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        lam = _controlled(params, self.controlling_parameter_name)
        c1 = jnp.mean(x[self.group1], axis=0)
        c2 = jnp.mean(x[self.group2], axis=0)
        r = safe_norm(c1 - c2)
        dr = jnp.maximum(r - self.well_radius, 0.0)
        return lam * 0.5 * self.spring_constant * dr * dr

    def distance_at_energy(self, potential_energy):
        """r0 + harmonic radius (reference forces.py:1000-1016; the inverse
        is undefined at zero energy — the whole well is at zero)."""
        if float(potential_energy) == 0.0:
            raise ValueError("cannot compute the distance at zero potential "
                             "energy for a flat-bottom restraint")
        return float(self.well_radius) + _harmonic_radius(
            float(self.spring_constant), float(potential_energy))

    def radial_potential(self, r: float) -> float:
        dr = max(float(r) - float(self.well_radius), 0.0)
        return 0.5 * float(self.spring_constant) * dr * dr

    def _integral_limits(self, temperature, radius_cutoff, energy_cutoff):
        """(r_min, r_max, analytic inner volume) — the flat well contributes
        a sphere analytically; only the harmonic wall integrates numerically
        (reference forces.py:1018-1034)."""
        kT = kB * float(temperature)
        if energy_cutoff is None:
            energy_cutoff = 100.0
        # directly, not via distance_at_energy: that raises at zero energy,
        # but a zero energy cutoff legitimately pins the wall to the well
        # edge (reference forces.py:1018-1034 does the same)
        r_max = float(self.well_radius) + _harmonic_radius(
            float(self.spring_constant), energy_cutoff * kT)
        if radius_cutoff is not None:
            r_max = min(r_max, float(radius_cutoff))
        r_min = min(r_max, float(self.well_radius))
        return r_min, r_max, _sphere_volume(r_min)

    def compute_restraint_volume(self, temperature, square_well=False,
                                 radius_cutoff=None,
                                 energy_cutoff=None) -> float:
        """Sphere volume for the square-well reweighting; flat sphere +
        numeric wall integral otherwise (reference forces.py:985-997)."""
        r_min, r_max, v_inner = self._integral_limits(
            temperature, radius_cutoff, energy_cutoff)
        if square_well:
            return _sphere_volume(r_max)
        return integrate_restraint_volume(
            self.radial_potential, temperature, square_well=False,
            radius_cutoff=radius_cutoff, energy_cutoff=energy_cutoff,
            r_min=r_min, r_max=r_max, analytical_volume=v_inner)

    compute_standard_state_correction = (
        HarmonicRestraintForce.compute_standard_state_correction)


@pytree_dataclass
class FlatBottomRestraintBondForce:
    """Single-atom-pair flat-bottom restraint (forces.py:1069)."""

    spring_constant: jax.Array
    well_radius: jax.Array
    atom1: int = static_field(default=0)
    atom2: int = static_field(default=1)
    controlling_parameter_name: str = static_field(default="lambda_restraints")
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        lam = _controlled(params, self.controlling_parameter_name)
        r = safe_norm(x[self.atom1] - x[self.atom2])
        dr = jnp.maximum(r - self.well_radius, 0.0)
        return lam * 0.5 * self.spring_constant * dr * dr

    distance_at_energy = FlatBottomRestraintForce.distance_at_energy
    radial_potential = FlatBottomRestraintForce.radial_potential
    _integral_limits = FlatBottomRestraintForce._integral_limits
    compute_restraint_volume = FlatBottomRestraintForce.compute_restraint_volume
    compute_standard_state_correction = (
        FlatBottomRestraintForce.compute_standard_state_correction)


# ---------------------------------------------------------------------------
# positional restraints (forcefactories.py:93-183)
# ---------------------------------------------------------------------------


@pytree_dataclass
class PositionalRestraintTerm:
    """Harmonic positional restraints U = (K/sigma^2?) — reference
    ``restrain_atoms`` uses U = (K/2) |x - x0|^2 per restrained atom with K
    given in kJ/mol/nm^2 (forcefactories.py:105)."""

    particles: jax.Array       # (P,) int32
    reference_positions: jax.Array  # (P, 3)
    k: jax.Array               # scalar
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        d = x[self.particles] - self.reference_positions
        return 0.5 * self.k * jnp.sum(d * d)


def restrain_atoms(system: System, positions, atom_indices,
                   sigma: float = 0.3) -> System:
    """Append harmonic positional restraints with K = kT_room/sigma^2
    (restrain_atoms, forcefactories.py:105-183; the reference's
    barostat-safe centroid handling is unnecessary here because restraints
    reference explicit coordinates, not forces on virtual particles)."""
    kT_room = kB * 298.0
    k = kT_room / sigma**2
    atom_indices = jnp.asarray(atom_indices, dtype=jnp.int32)
    term = PositionalRestraintTerm(
        particles=atom_indices,
        reference_positions=jnp.asarray(positions)[atom_indices],
        k=jnp.asarray(k, dtype=jnp.float32))
    return system.replace(terms=system.terms + (term,))


def restrain_atoms_by_dsl(system: System, positions, topology, atoms_dsl,
                          sigma: float = 0.3) -> System:
    """Restrain the atoms selected by an mdtraj-style DSL string, e.g.
    ``'protein and name CA'`` (restrain_atoms_by_dsl, forcefactories.py:93;
    the selection is parsed natively — models/amber.py AmberTopology.select).
    """
    atom_indices = topology.select(atoms_dsl)
    if len(atom_indices) == 0:
        raise ValueError(f"selection {atoms_dsl!r} matched no atoms")
    return restrain_atoms(system, positions, atom_indices, sigma=sigma)


def replace_reaction_field(system: System, switch_width=None,
                           return_copy=True) -> System:
    """Switch all cutoff_periodic NonbondedTerms to the unshifted (c_rf = 0)
    reaction field with an energy switch (replace_reaction_field,
    forcefactories.py:34; UnshiftedReactionFieldForce forces.py:1110).

    In this framework the change is a static-field rewrite on the term.
    """
    from openmmtools_tpu.system import NonbondedTerm

    terms = []
    for term in system.terms:
        if isinstance(term, NonbondedTerm) and term.method == "cutoff_periodic":
            sw = switch_width if switch_width is not None else term.switch_width
            if sw is None:
                sw = 0.1  # reference default: 1 A (forcefactories.py:34)
            # c_rf = 0 (shift_rf=False) and the quintic switch applied to
            # the WHOLE pair energy, matching the reference's switched
            # UnshiftedReactionFieldForce (forces.py:1110 via
            # CustomNonbondedForce switching)
            terms.append(term.replace(switch_width=sw, shift_rf=False,
                                      switch_coulomb=True))
        else:
            terms.append(term)
    return system.replace(terms=tuple(terms))
