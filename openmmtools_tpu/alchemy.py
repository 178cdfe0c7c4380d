"""Alchemical factory: lambda-parameterized softcore energy terms.

TPU-native redesign of ``/root/reference/openmmtools/alchemy/alchemy.py``
(2545 LoC). The reference rewrites an OpenMM System into nn/na/aa force
*objects* with Lepton softcore expressions (alchemy.py:637-741,1539-1600);
here :class:`AbsoluteAlchemicalFactory` rewrites the System *pytree*,
replacing the NonbondedTerm with a single
:class:`AlchemicalNonbondedTerm` whose per-pair lambda matrix encodes the
nn/na/aa classification (SURVEY.md §7 design table):

* nn pairs   -> lambda = 1 (softcore reduces exactly to standard LJ/Coulomb)
* na pairs   -> lambda = lambda_region
* aa (same region) -> lambda_region if annihilate else 1  (alchemy.py:417-429
  defaults: annihilate_electrostatics=True, annihilate_sterics=False)
* aa (different regions) -> lambda_A * lambda_B if the region pair interacts
  (alchemy.py:1693-1720 suffix-product rule), else 0

Everything evaluates in one fused pass — no force splitting, no context
parameter mutation; ``vmap`` over a lambda ladder gives the u(x;lambda)
matrix directly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, FrozenSet, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.ops import nonbonded as nb_ops
from openmmtools_tpu.ops import softcore as sc
from openmmtools_tpu.ops.geometry import minimum_image
from openmmtools_tpu.states import (
    GlobalParameter,
    GlobalParameterFunction,
    GlobalParameterState,
)
from openmmtools_tpu.system import (
    HarmonicAngleTerm,
    HarmonicBondTerm,
    NonbondedTerm,
    PeriodicTorsionTerm,
    System,
)
from openmmtools_tpu.ops import bonded as bonded_ops
from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field


class AlchemyError(ValueError):
    """Alchemical-factory error. Subclasses ValueError to match the
    reference's _resolve_alchemical_region raises (alchemy.py:1042)."""


# ---------------------------------------------------------------------------
# AlchemicalRegion / AlchemicalFunction / AlchemicalState
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AlchemicalRegion:
    """Definition of an alchemically-modified region (alchemy.py:431, defaults
    :417-429). ``alchemical_bonds/angles/torsions`` may be True (auto-discover
    terms fully inside the region), an explicit list of term indices, or
    None/False (leave unsoftened)."""

    alchemical_atoms: Sequence[int] = ()
    alchemical_bonds: Any = None
    alchemical_angles: Any = None
    alchemical_torsions: Any = None
    annihilate_electrostatics: bool = True
    annihilate_sterics: bool = False
    softcore_alpha: float = 0.5
    softcore_a: float = 1.0
    softcore_b: float = 1.0
    softcore_c: float = 6.0
    softcore_beta: float = 0.0
    softcore_d: float = 1.0
    softcore_e: float = 1.0
    softcore_f: float = 2.0
    name: Optional[str] = None


class AlchemicalFunction(GlobalParameterFunction):
    """A lambda parameter enslaved to an expression of function variables
    (alchemy.py:65). Example: AlchemicalFunction('lambda**2')."""


def _validate_lambda(self, value):
    if isinstance(value, (int, float)) and not 0.0 <= value <= 1.0:
        raise ValueError(f"lambda must be in [0, 1], got {value}")
    return value


class AlchemicalState(GlobalParameterState):
    """Composable state controlling alchemical lambdas (alchemy.py:90).

    Parameters: lambda_sterics, lambda_electrostatics, lambda_bonds,
    lambda_angles, lambda_torsions, all validated to [0, 1]
    (alchemy.py:207-226).
    """

    lambda_sterics = GlobalParameter("lambda_sterics", 1.0, _validate_lambda)
    lambda_electrostatics = GlobalParameter("lambda_electrostatics", 1.0,
                                            _validate_lambda)
    lambda_bonds = GlobalParameter("lambda_bonds", 1.0, _validate_lambda)
    lambda_angles = GlobalParameter("lambda_angles", 1.0, _validate_lambda)
    lambda_torsions = GlobalParameter("lambda_torsions", 1.0, _validate_lambda)

    def set_alchemical_parameters(self, new_value):
        """Set every *defined* lambda to new_value (alchemy.py:255)."""
        for name, value in self._parameters.items():
            if value is not None:
                self._parameters[name] = _validate_lambda(self, new_value)


# ---------------------------------------------------------------------------
# alchemical energy terms
# ---------------------------------------------------------------------------


def _region_lambdas(params, names, dtype):
    vals = []
    for name in names:
        v = params.get(name, 1.0) if params is not None else 1.0
        vals.append(jnp.asarray(v, dtype=dtype))
    return jnp.stack(vals) if vals else jnp.ones((0,), dtype=dtype)


@pytree_dataclass
class AlchemicalNonbondedTerm:
    """Unified softcore nonbonded term with per-pair lambda classification.

    Replaces the reference's {nn NonbondedForce + aa/na CustomNonbondedForce
    pairs + exception CustomBondForces} (alchemy.py:1539-1600) with one
    vectorized kernel over the dense pair matrix.
    """

    charge: jax.Array              # (N,)
    sigma: jax.Array               # (N,)
    epsilon: jax.Array             # (N,)
    region_id: jax.Array           # (N,) int32; -1 = non-alchemical
    exception_index: jax.Array     # (E, 2)
    exception_chargeprod: jax.Array
    exception_sigma: jax.Array
    exception_epsilon: jax.Array
    # static configuration
    method: str = static_field(default="no_cutoff")
    cutoff: Optional[float] = static_field(default=None)
    switch_width: Optional[float] = static_field(default=None)
    dielectric: float = static_field(default=78.3)
    ewald_alpha: Optional[float] = static_field(default=None)
    use_dispersion_correction: bool = static_field(default=False)
    force_group: int = static_field(default=0)
    # region metadata (parallel tuples, one entry per region)
    lambda_sterics_names: Tuple[str, ...] = static_field(default=())
    lambda_electrostatics_names: Tuple[str, ...] = static_field(default=())
    annihilate_sterics: Tuple[bool, ...] = static_field(default=())
    annihilate_electrostatics: Tuple[bool, ...] = static_field(default=())
    region_interactions: Tuple[Tuple[int, int], ...] = static_field(default=())
    # exception scaling law (reference consistent_exceptions, alchemy.py
    # :629,1426-1470): False (default) scales exception chargeprod/epsilon
    # LINEARLY with lambda in the plain kernels; True applies the same
    # softcore expressions as regular interactions. Endpoints agree.
    consistent_exceptions: bool = static_field(default=False)
    # 'exact' PME treatment: electrostatics by per-particle linear charge
    # scaling (matching the reciprocal-space scaling) instead of softcore
    exact_electrostatics: bool = static_field(default=False)
    # 'coulomb' PME treatment (alchemy.py pme_treatment='coulomb'):
    # alchemically-involved pairs use the plain Coulomb kernel in direct
    # space (reciprocal space sees zero alchemical charge)
    coulomb_pme_treatment: bool = static_field(default=False)
    # reaction-field variant: 'switched' uses the unshifted (c_rf=0) RF
    # with the quintic switch on the whole pair energy
    # (alchemy.py:750-752 replace_reaction_field semantics)
    shift_rf: bool = static_field(default=True)
    switch_coulomb: bool = static_field(default=False)
    # softcore constants (region 0's; shared across regions)
    softcore_alpha: float = static_field(default=0.5)
    softcore_a: float = static_field(default=1.0)
    softcore_b: float = static_field(default=1.0)
    softcore_c: float = static_field(default=6.0)
    softcore_beta: float = static_field(default=0.0)
    softcore_d: float = static_field(default=1.0)
    softcore_e: float = static_field(default=1.0)
    softcore_f: float = static_field(default=2.0)

    @property
    def periodic(self) -> bool:
        return self.method in ("cutoff_periodic", "pme", "ewald")

    @property
    def global_defaults(self) -> Dict[str, float]:
        out = {}
        for name in self.lambda_sterics_names:
            out[name] = 1.0
        for name in self.lambda_electrostatics_names:
            out[name] = 1.0
        return out

    # -- lambda classification ---------------------------------------------
    def _pair_lambdas(self, rid_i, rid_j, lam_regions, annihilate):
        """Effective lambda for pairs given region ids (-1 = environment)."""
        ext = jnp.concatenate([jnp.ones((1,), lam_regions.dtype), lam_regions])
        lam_i = ext[rid_i + 1]
        lam_j = ext[rid_j + 1]
        lam = lam_i * lam_j  # nn: 1, na: lambda, cross-aa: lamA*lamB
        same = (rid_i == rid_j) & (rid_i >= 0)
        # same-region pairs: lambda if annihilating, else full strength
        ann = jnp.asarray(annihilate, dtype=bool)
        ann_ext = jnp.concatenate([jnp.zeros((1,), bool), ann])
        is_ann = ann_ext[rid_i + 1]
        lam_same = jnp.where(is_ann, ext[rid_i + 1], 1.0)
        lam = jnp.where(same, lam_same, lam)
        # cross-region pairs without declared interactions don't interact
        n_regions = len(annihilate)
        if n_regions > 1:
            allowed = np.zeros((n_regions, n_regions), dtype=bool)
            for a, b in self.region_interactions:
                allowed[a, b] = allowed[b, a] = True
            allowed = jnp.asarray(allowed)
            cross = (rid_i >= 0) & (rid_j >= 0) & (rid_i != rid_j)
            ok = allowed[jnp.clip(rid_i, 0), jnp.clip(rid_j, 0)]
            lam = jnp.where(cross & ~ok, 0.0, lam)
        return lam

    # -- energy -------------------------------------------------------------
    def energy(self, x, box, params=None):
        n = x.shape[0]
        dtype = x.dtype
        lam_s_regions = _region_lambdas(params, self.lambda_sterics_names, dtype)
        lam_e_regions = _region_lambdas(params, self.lambda_electrostatics_names,
                                        dtype)
        rid = jnp.asarray(self.region_id)
        rid_i = rid[:, None]
        rid_j = rid[None, :]
        lam_s = self._pair_lambdas(rid_i, rid_j, lam_s_regions,
                                   self.annihilate_sterics)
        lam_e = self._pair_lambdas(rid_i, rid_j, lam_e_regions,
                                   self.annihilate_electrostatics)

        d = x[:, None, :] - x[None, :, :]
        if self.periodic:
            d = minimum_image(d, box)
        r2_raw = jnp.sum(d * d, axis=-1)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        mask = row < col
        if self.cutoff is not None and self.method != "no_cutoff":
            mask = mask & (r2_raw < self.cutoff * self.cutoff)
        if self.exception_index.shape[0] > 0:
            # exceptions REPLACE the combination-rule interaction: mask the
            # pairs out of the dense sum instead of subtracting them back —
            # 1-2 Coulomb pairs at r ~ 0.1 nm are ~1e3 kJ/mol each and the
            # f32 subtract loses ~1e-4 of that (measured 0.50 kJ/mol at
            # lambda=1 on alanine dipeptide vacuum; same redesign as
            # ops/nonbonded.py pairwise_energy exclude_index)
            keep = jnp.ones((n, n), jnp.bool_)
            keep = keep.at[self.exception_index[:, 0],
                           self.exception_index[:, 1]].set(False)
            keep = keep.at[self.exception_index[:, 1],
                           self.exception_index[:, 0]].set(False)
            mask = mask & jax.lax.optimization_barrier(keep)
        r2 = jnp.where(mask, jnp.maximum(r2_raw, 1e-12), 1.0)
        r = jnp.sqrt(r2)

        sig_safe = jnp.maximum(self.sigma, 1e-6)  # sigma=0 particles
        sig_ij = 0.5 * (sig_safe[:, None] + sig_safe[None, :])
        eps_ij = jnp.sqrt(self.epsilon[:, None] * self.epsilon[None, :])
        qq_ij = self.charge[:, None] * self.charge[None, :]

        involved = (rid_i >= 0) | (rid_j >= 0)
        e_lj = self._sterics(r2, sig_ij, eps_ij, lam_s)
        if self.switch_width is not None and self.cutoff is not None:
            e_lj = e_lj * nb_ops.switch_factor(r, self.cutoff - self.switch_width,
                                               self.cutoff)
        if self.exact_electrostatics:
            # q_i q_j scaled by the per-particle lambdas (s_i s_j); plain
            # method kernel, no softcore — mirrors charge-offset PME
            lam_p = jnp.concatenate([jnp.ones((1,), dtype),
                                     lam_e_regions])[rid + 1]
            qq_scaled = qq_ij * lam_p[:, None] * lam_p[None, :]
            e_coul = nb_ops.coulomb_pair(
                r, qq_scaled, self.method, cutoff=self.cutoff,
                dielectric=self.dielectric, alpha=self.ewald_alpha)
        else:
            e_coul = self._electrostatics(r, qq_ij, sig_ij, lam_e,
                                          involved=involved)
        if (self.switch_coulomb and self.switch_width is not None
                and self.cutoff is not None):
            e_coul = e_coul * nb_ops.switch_factor(
                r, self.cutoff - self.switch_width, self.cutoff)
        e = jnp.sum(jnp.where(mask, e_lj + e_coul, 0.0))

        # exceptions replace the combination-rule interaction: the standard
        # pairs were masked out of the dense sum above, so only the
        # exception pairs themselves are added here (plain no_cutoff
        # kernels, lambda-scaled)
        if self.exception_index.shape[0] > 0:
            i = self.exception_index[:, 0]
            j = self.exception_index[:, 1]
            de = x[i] - x[j]
            if self.periodic:
                de = minimum_image(de, box)
            r2e = jnp.maximum(jnp.sum(de * de, axis=-1), 1e-12)
            re = jnp.sqrt(r2e)
            lam_s_exc = self._pair_lambdas(rid[i], rid[j], lam_s_regions,
                                           self.annihilate_sterics)
            lam_e_exc = self._pair_lambdas(rid[i], rid[j], lam_e_regions,
                                           self.annihilate_electrostatics)
            e = e + jnp.sum(self._exception_add(r2e, re, lam_s_exc,
                                                lam_e_exc))

        if self.use_dispersion_correction and self.periodic:
            e = e + self._dispersion_correction(box, lam_s)
        return e

    def _sterics(self, r2, sig, eps, lam):
        return sc.softcore_lj(r2, sig, eps, lam, alpha=self.softcore_alpha,
                              a=self.softcore_a, b=self.softcore_b,
                              c=self.softcore_c)

    def _exception_add(self, r2e, re, lam_s_exc, lam_e_exc):
        """Exception pairs' own (no_cutoff) energies, lambda-scaled per the
        consistent_exceptions law."""
        sig_exc = jnp.maximum(self.exception_sigma, 1e-6)
        if self.consistent_exceptions:
            add = sc.softcore_lj(
                r2e, sig_exc, self.exception_epsilon, lam_s_exc,
                alpha=self.softcore_alpha, a=self.softcore_a,
                b=self.softcore_b, c=self.softcore_c)
            return add + sc.softcore_coulomb(
                re, self.exception_chargeprod, sig_exc, lam_e_exc,
                method="no_cutoff", beta=self.softcore_beta,
                d=self.softcore_d, e=self.softcore_e, f=self.softcore_f)
        # reference default (consistent_exceptions=False): exception
        # chargeprod/epsilon scale LINEARLY with lambda in the plain
        # kernels (alchemy.py:1443-1470 updates NonbondedForce exception
        # parameters directly)
        add = nb_ops.lj_pair(r2e, sig_exc,
                             self.exception_epsilon * lam_s_exc)
        return add + nb_ops.coulomb_pair(
            re, self.exception_chargeprod * lam_e_exc, "no_cutoff",
            dielectric=self.dielectric)

    def exception_add_energy(self, x, box, params=None):
        """Only the exception ADD part of :meth:`energy` (plain no_cutoff
        softcore kernels, lambda-scaled).

        The bounded-sweep kernel path (integrators/langevin.py sweep mode)
        masks exception pairs out of the standard pair sum — equivalent to
        the subtract — so the XLA remainder only needs this add term.
        """
        if self.exception_index.shape[0] == 0:
            return jnp.zeros((), x.dtype)
        dtype = x.dtype
        lam_s_regions = _region_lambdas(params, self.lambda_sterics_names,
                                        dtype)
        lam_e_regions = _region_lambdas(params,
                                        self.lambda_electrostatics_names,
                                        dtype)
        rid = jnp.asarray(self.region_id)
        i = self.exception_index[:, 0]
        j = self.exception_index[:, 1]
        de = x[i] - x[j]
        if self.periodic:
            de = minimum_image(de, box)
        r2e = jnp.maximum(jnp.sum(de * de, axis=-1), 1e-12)
        re = jnp.sqrt(r2e)
        lam_s_exc = self._pair_lambdas(rid[i], rid[j], lam_s_regions,
                                       self.annihilate_sterics)
        lam_e_exc = self._pair_lambdas(rid[i], rid[j], lam_e_regions,
                                       self.annihilate_electrostatics)
        return jnp.sum(self._exception_add(r2e, re, lam_s_exc, lam_e_exc))

    def _electrostatics(self, r, qq, sig, lam, involved=None):
        e = sc.softcore_coulomb(
            r, qq, sig, lam, method=self.method, cutoff=self.cutoff,
            dielectric=self.dielectric, ewald_alpha=self.ewald_alpha,
            beta=self.softcore_beta, d=self.softcore_d, e=self.softcore_e,
            f=self.softcore_f, shift_rf=self.shift_rf)
        if self.coulomb_pme_treatment and involved is not None:
            # 'coulomb' treatment: alchemically-involved pairs use the
            # plain Coulomb kernel instead of erfc direct space
            e_plain = sc.softcore_coulomb(
                r, qq, sig, lam, method="no_cutoff",
                beta=self.softcore_beta, d=self.softcore_d,
                e=self.softcore_e, f=self.softcore_f)
            e = jnp.where(involved, e_plain, e)
        return e

    def _dispersion_correction(self, box, lam_s):
        """Exact lambda-weighted analytic tail: softcore tail -> lam^a x
        standard tail at r >> sigma, averaged over the pair matrix."""
        sig_safe = jnp.maximum(self.sigma, 1e-6)
        sig_ij = 0.5 * (sig_safe[:, None] + sig_safe[None, :])
        eps_ij = jnp.sqrt(self.epsilon[:, None] * self.epsilon[None, :])
        s3 = sig_ij**3
        s6 = s3 * s3
        s12 = s6 * s6
        rc3 = self.cutoff**3
        rc9 = rc3**3
        integral = 4.0 * eps_ij * (s12 / (9.0 * rc9) - s6 / (3.0 * rc3))
        weighted = sc._pow(lam_s, self.softcore_a) * integral
        n = self.sigma.shape[0]
        from openmmtools_tpu.system import volume

        return 2.0 * jnp.pi * n * n / volume(box) * jnp.mean(weighted)


def _scaled(scale_fn):
    return scale_fn


@pytree_dataclass
class AlchemicalHarmonicBondTerm:
    """Harmonic bonds with lambda_bonds-scaled spring constants on the
    alchemical subset (alchemy.py:1278 _alchemically_modify_HarmonicBondForce).
    """

    index: jax.Array
    length: jax.Array
    k: jax.Array
    alchemical: jax.Array          # (B,) 0/1 mask
    lambda_name: str = static_field(default="lambda_bonds")
    force_group: int = static_field(default=0)

    @property
    def global_defaults(self):
        return {self.lambda_name: 1.0}

    def energy(self, x, box, params=None):
        lam = params.get(self.lambda_name, 1.0) if params else 1.0
        scale = jnp.where(self.alchemical > 0, lam, 1.0)
        return bonded_ops.harmonic_bond_energy(x, self.index, self.length,
                                               self.k, scale=scale)


@pytree_dataclass
class AlchemicalHarmonicAngleTerm:
    """lambda_angles-scaled angles (alchemy.py:1199)."""

    index: jax.Array
    angle: jax.Array
    k: jax.Array
    alchemical: jax.Array
    lambda_name: str = static_field(default="lambda_angles")
    force_group: int = static_field(default=0)

    @property
    def global_defaults(self):
        return {self.lambda_name: 1.0}

    def energy(self, x, box, params=None):
        lam = params.get(self.lambda_name, 1.0) if params else 1.0
        scale = jnp.where(self.alchemical > 0, lam, 1.0)
        return bonded_ops.harmonic_angle_energy(x, self.index, self.angle,
                                                self.k, scale=scale)


@pytree_dataclass
class AlchemicalPeriodicTorsionTerm:
    """lambda_torsions-scaled torsions (alchemy.py:1115)."""

    index: jax.Array
    periodicity: jax.Array
    phase: jax.Array
    k: jax.Array
    alchemical: jax.Array
    lambda_name: str = static_field(default="lambda_torsions")
    force_group: int = static_field(default=0)

    @property
    def global_defaults(self):
        return {self.lambda_name: 1.0}

    def energy(self, x, box, params=None):
        lam = params.get(self.lambda_name, 1.0) if params else 1.0
        scale = jnp.where(self.alchemical > 0, lam, 1.0)
        return bonded_ops.periodic_torsion_energy(
            x, self.index, self.periodicity, self.phase, self.k, scale=scale)


# ---------------------------------------------------------------------------
# the factory
# ---------------------------------------------------------------------------


class AbsoluteAlchemicalFactory:
    """Rewrite a System pytree into its alchemically-modified counterpart
    (AbsoluteAlchemicalFactory, alchemy.py:496,637).

    Options mirror the reference (alchemy.py:626-635):
    ``alchemical_pme_treatment`` in {'direct-space', 'exact', 'coulomb'}
    (exact: linear per-particle charge scaling through reciprocal space;
    coulomb: plain-Coulomb direct space for alchemical pairs, zero
    alchemical charge in reciprocal space), ``alchemical_rf_treatment``
    in {'switched', 'shifted'} (switched: c_rf = 0 RF + quintic switch
    on the whole pair energy), ``disable_alchemical_dispersion_
    correction``, ``switch_width`` override, ``split_alchemical_forces``
    (maps to a separate force group for the alchemical term).
    """

    def __init__(self, consistent_exceptions=False,
                 alchemical_pme_treatment="direct-space",
                 alchemical_rf_treatment="switched",
                 disable_alchemical_dispersion_correction=False,
                 split_alchemical_forces=True, switch_width=None):
        if alchemical_pme_treatment not in ("direct-space", "exact",
                                            "coulomb"):
            raise AlchemyError(
                f"unknown alchemical_pme_treatment "
                f"{alchemical_pme_treatment!r}")
        if alchemical_rf_treatment not in ("switched", "shifted"):
            raise AlchemyError(
                f"unknown alchemical_rf_treatment "
                f"{alchemical_rf_treatment!r}")
        self.consistent_exceptions = consistent_exceptions
        self.alchemical_pme_treatment = alchemical_pme_treatment
        self.alchemical_rf_treatment = alchemical_rf_treatment
        self.disable_alchemical_dispersion_correction = (
            disable_alchemical_dispersion_correction)
        self.split_alchemical_forces = split_alchemical_forces
        self.switch_width = switch_width

    def create_alchemical_system(
            self, reference_system: System,
            alchemical_regions,
            alchemical_region_interactions: FrozenSet = frozenset()) -> System:
        if isinstance(alchemical_regions, AlchemicalRegion):
            alchemical_regions = [alchemical_regions]
        regions: List[AlchemicalRegion] = list(alchemical_regions)
        if len(regions) > 1 and any(r.name is None for r in regions):
            raise AlchemyError("multiple regions require names")
        names = {r.name for r in regions}
        if len(names) != len(regions):
            raise AlchemyError("alchemical region names must be unique")

        n = reference_system.n_particles
        region_id = np.full(n, -1, dtype=np.int32)
        for ridx, reg in enumerate(regions):
            atoms = np.asarray(list(reg.alchemical_atoms), dtype=np.int64)
            # reference _resolve_alchemical_region validations
            # (alchemy.py:1737 tests): indices must be part of the system,
            # and a region must define SOMETHING alchemical
            if atoms.size == 0 and not any(
                    (reg.alchemical_bonds, reg.alchemical_angles,
                     reg.alchemical_torsions)):
                raise AlchemyError(
                    "alchemical region defines no atoms, bonds, angles or "
                    "torsions")
            if atoms.size and (atoms.min() < 0 or atoms.max() >= n):
                raise AlchemyError(
                    f"alchemical atom indices out of range for a "
                    f"{n}-particle system: "
                    f"[{atoms.min()}, {atoms.max()}]")
            if np.any(region_id[atoms] >= 0):
                raise AlchemyError("alchemical regions overlap")
            region_id[atoms] = ridx

        def suffix(reg):
            return "" if reg.name is None else f"_{reg.name}"

        region_name_to_idx = {r.name: i for i, r in enumerate(regions)}
        interactions = tuple(sorted(
            tuple(sorted((region_name_to_idx[a], region_name_to_idx[b])))
            for a, b in alchemical_region_interactions))

        from openmmtools_tpu.ops.pme import EwaldReciprocalTerm

        terms = []
        for term in reference_system.terms:
            if isinstance(term, NonbondedTerm):
                terms.append(self._alchemical_nonbonded(
                    term, region_id, regions, suffix, interactions))
            elif (isinstance(term, EwaldReciprocalTerm)
                    and self.alchemical_pme_treatment == "coulomb"):
                # 'coulomb' treatment: alchemical electrostatics is handled
                # entirely by the plain-Coulomb direct-space expression;
                # reciprocal space sees ZERO alchemical charge at every
                # lambda (reference pme_treatment='coulomb' semantics)
                mask = (region_id >= 0).astype(np.float32)
                terms.append(term.replace(
                    charge=np.asarray(term.charge) * (1.0 - mask)))
            elif (isinstance(term, EwaldReciprocalTerm)
                    and self.alchemical_pme_treatment == "exact"):
                # exact-PME: lambda_electrostatics scales alchemical charges
                # in reciprocal space too (single-region only)
                if len(regions) > 1:
                    raise AlchemyError(
                        "exact PME treatment supports one alchemical region")
                terms.append(term.replace(
                    alch_mask=(region_id >= 0).astype(np.float32),
                    lambda_name=f"lambda_electrostatics{suffix(regions[0])}"))
            elif type(term).__name__ in ("GBSAOBCTerm",):
                # alchemically-modified GB (reference
                # _alchemically_modify_GBSAOBCForce, alchemy.py:2144):
                # lambda_electrostatics scales the alchemical atoms'
                # charges, descreening and surface term (ops/gbsa.py)
                if len(regions) > 1:
                    raise AlchemyError(
                        "multiple alchemical regions are not supported for "
                        "GBSAOBCForce (reference alchemy.py:2168)")
                mask = (region_id >= 0).astype(np.float32)
                terms.append(term.replace(
                    alchemical=mask,
                    lambda_name=f"lambda_electrostatics{suffix(regions[0])}"))
            elif isinstance(term, HarmonicBondTerm) and any(
                    r.alchemical_bonds for r in regions):
                terms.append(self._alchemical_bonds(term, region_id, regions,
                                                    suffix))
            elif isinstance(term, HarmonicAngleTerm) and any(
                    r.alchemical_angles for r in regions):
                terms.append(self._alchemical_angles(term, region_id, regions,
                                                     suffix))
            elif isinstance(term, PeriodicTorsionTerm) and any(
                    r.alchemical_torsions for r in regions):
                terms.append(self._alchemical_torsions(term, region_id,
                                                       regions, suffix))
            else:
                self._check_unhandled_term(term, region_id)
                terms.append(term)
        return reference_system.replace(terms=tuple(terms))

    @staticmethod
    def _check_unhandled_term(term, region_id):
        """Refuse to silently pass through an *unknown* interacting term that
        touches alchemical atoms (reference guard: CustomNonbondedForce
        passthrough check, alchemy.py:2040). Known bonded terms pass through
        unsoftened by design (softening is opt-in via
        ``alchemical_bonds/angles/torsions``); external one-particle fields
        and the Ewald reciprocal term (direct-space treatment) are
        deliberately unmodified."""
        from openmmtools_tpu.ops.pme import EwaldReciprocalTerm
        from openmmtools_tpu.system import (
            CustomExternalTerm,
            HarmonicAngleTerm,
            HarmonicBondTerm,
            PeriodicTorsionTerm,
        )

        if isinstance(term, (HarmonicBondTerm, HarmonicAngleTerm,
                             PeriodicTorsionTerm, CustomExternalTerm,
                             EwaldReciprocalTerm)):
            return
        idx_arrays = []
        for attr in ("index", "particles"):
            a = getattr(term, attr, None)
            if a is not None:
                idx_arrays.append(np.asarray(a).reshape(-1).astype(np.int64))
        if idx_arrays:
            touched = np.concatenate(idx_arrays)
            touches = bool(np.any(region_id[touched] >= 0))
        else:
            # no index structure: assume an all-particle interaction
            # (e.g. a custom pair term) — it necessarily touches the region
            touches = True
        if touches:
            raise AlchemyError(
                f"cannot alchemically modify term type "
                f"{type(term).__name__}: it interacts with atoms of an "
                "alchemical region but no alchemical rewrite is registered "
                "for it (silent passthrough would leave those interactions "
                "unsoftened at every lambda)")

    # -- per-force-type rewrites -------------------------------------------
    def _alchemical_nonbonded(self, term: NonbondedTerm, region_id, regions,
                              suffix, interactions) -> AlchemicalNonbondedTerm:
        reg0 = regions[0]
        switch_width = term.switch_width
        if self.switch_width is not None:
            switch_width = self.switch_width
        exact = (self.alchemical_pme_treatment == "exact"
                 and term.method in ("pme", "ewald"))
        coulomb = (self.alchemical_pme_treatment == "coulomb"
                   and term.method in ("pme", "ewald"))
        # 'switched' RF treatment: unshifted (c_rf = 0) reaction field
        # with the quintic switch on the pair energy, applied to the
        # whole unified term (the reference applies
        # replace_reaction_field to the full system, alchemy.py:750-752)
        switched_rf = (self.alchemical_rf_treatment == "switched"
                       and term.method in ("cutoff_periodic",
                                           "cutoff_nonperiodic"))
        if switched_rf and switch_width is None:
            # reference default switch width: 1 A (forcefactories.py:34)
            switch_width = 0.1
        return AlchemicalNonbondedTerm(
            consistent_exceptions=self.consistent_exceptions,
            exact_electrostatics=exact,
            coulomb_pme_treatment=coulomb,
            shift_rf=not switched_rf,
            switch_coulomb=switched_rf,
            charge=term.charge, sigma=term.sigma, epsilon=term.epsilon,
            region_id=np.asarray(region_id),
            exception_index=term.exception_index,
            exception_chargeprod=term.exception_chargeprod,
            exception_sigma=term.exception_sigma,
            exception_epsilon=term.exception_epsilon,
            method=term.method, cutoff=term.cutoff, switch_width=switch_width,
            dielectric=term.dielectric, ewald_alpha=term.ewald_alpha,
            use_dispersion_correction=(
                term.use_dispersion_correction
                and not self.disable_alchemical_dispersion_correction),
            force_group=(1 if self.split_alchemical_forces else
                         term.force_group),
            lambda_sterics_names=tuple(
                f"lambda_sterics{suffix(r)}" for r in regions),
            lambda_electrostatics_names=tuple(
                f"lambda_electrostatics{suffix(r)}" for r in regions),
            annihilate_sterics=tuple(r.annihilate_sterics for r in regions),
            annihilate_electrostatics=tuple(
                r.annihilate_electrostatics for r in regions),
            region_interactions=interactions,
            softcore_alpha=reg0.softcore_alpha, softcore_a=reg0.softcore_a,
            softcore_b=reg0.softcore_b, softcore_c=reg0.softcore_c,
            softcore_beta=reg0.softcore_beta, softcore_d=reg0.softcore_d,
            softcore_e=reg0.softcore_e, softcore_f=reg0.softcore_f,
        )

    @staticmethod
    def _term_mask(index: np.ndarray, region_id, regions, selector):
        """1.0 where a bonded term is alchemical (all atoms in one region and
        the region requests softening)."""
        idx = np.asarray(index)
        mask = np.zeros(idx.shape[0], dtype=np.float32)
        for ridx, reg in enumerate(regions):
            requested = selector(reg)
            if not requested:
                continue
            in_region = np.all(np.asarray(region_id)[idx] == ridx, axis=1)
            if requested is True:
                mask[in_region] = 1.0
            else:  # explicit list of term indices
                explicit = np.zeros_like(mask, dtype=bool)
                explicit[np.asarray(list(requested), dtype=np.int64)] = True
                mask[explicit] = 1.0
        return mask

    def _alchemical_bonds(self, term, region_id, regions, suffix):
        mask = self._term_mask(term.index, region_id, regions,
                               lambda r: r.alchemical_bonds)
        name = f"lambda_bonds{suffix(regions[0])}"
        return AlchemicalHarmonicBondTerm(
            index=term.index, length=term.length, k=term.k, alchemical=mask,
            lambda_name=name, force_group=term.force_group)

    def _alchemical_angles(self, term, region_id, regions, suffix):
        mask = self._term_mask(term.index, region_id, regions,
                               lambda r: r.alchemical_angles)
        name = f"lambda_angles{suffix(regions[0])}"
        return AlchemicalHarmonicAngleTerm(
            index=term.index, angle=term.angle, k=term.k, alchemical=mask,
            lambda_name=name, force_group=term.force_group)

    def _alchemical_torsions(self, term, region_id, regions, suffix):
        mask = self._term_mask(term.index, region_id, regions,
                               lambda r: r.alchemical_torsions)
        name = f"lambda_torsions{suffix(regions[0])}"
        return AlchemicalPeriodicTorsionTerm(
            index=term.index, periodicity=term.periodicity, phase=term.phase,
            k=term.k, alchemical=mask, lambda_name=name,
            force_group=term.force_group)

    # -- diagnostics --------------------------------------------------------
    @staticmethod
    def get_energy_components(system: System, x, box=None, params=None
                              ) -> Dict[str, Any]:
        """Per-term energy decomposition (get_energy_components analog,
        alchemy.py:757)."""
        out = {}
        if box is None:
            box = system.default_box
        for i, term in enumerate(system.terms):
            out[f"{i}:{type(term).__name__}"] = term.energy(x, box, params)
        return out
