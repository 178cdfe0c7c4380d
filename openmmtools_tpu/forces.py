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
        return jnp.sqrt(2.0 * potential_energy / self.spring_constant)

    # -- standard-state correction (forces.py:400-670) ----------------------
    def compute_standard_state_correction(self, temperature, square_well=False,
                                          radius_cutoff=None,
                                          max_volume=None) -> float:
        """-ln(V_standard / V_restraint), with V_restraint from the analytic
        harmonic volume or a numeric square-well integral
        (_compute_harmonic_volume forces.py:174)."""
        kT = kB * float(temperature)
        K = float(self.spring_constant)
        if square_well:
            if radius_cutoff is None and max_volume is None:
                raise ValueError("square_well needs radius_cutoff/max_volume")
            if radius_cutoff is not None:
                v_restraint = 4.0 / 3.0 * math.pi * float(radius_cutoff) ** 3
            else:
                v_restraint = float(max_volume)
        else:
            v_restraint = (2.0 * math.pi * kT / K) ** 1.5
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

    def compute_standard_state_correction(self, temperature,
                                          n_points=10000, r_max=None) -> float:
        """Numeric volume integral of exp(-beta U) (forces.py:545-600)."""
        kT = kB * float(temperature)
        beta = 1.0 / kT
        K = float(self.spring_constant)
        r0 = float(self.well_radius)
        if r_max is None:
            r_max = r0 + 10.0 * math.sqrt(kT / K)
        r = np.linspace(1e-6, r_max, n_points)
        u = 0.5 * K * np.maximum(r - r0, 0.0) ** 2
        v_restraint = 4.0 * math.pi * np.trapezoid(
            np.exp(-beta * u) * r**2, r)
        return -math.log(STANDARD_STATE_VOLUME / v_restraint)


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
