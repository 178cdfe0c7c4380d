"""Test systems, batch 2: crystals, diatomic fluids, mixtures, WCA dimers.

Continues the port of ``/root/reference/openmmtools/testsystems.py``
(SodiumChlorideCrystal :1561, DiatomicFluid :1137 + variants :1273-1341,
ConstraintCoupledHarmonicOscillator :1386, LennardJonesGrid :2083,
CustomLennardJonesFluidMixture :2169, DoubleWellDimer/Chain_WCAFluid
:2393-2630). Same parameters, built as System pytrees.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.constants import kB
from openmmtools_tpu.models.testsystems import (
    KCAL,
    A,
    TestSystem,
    WCAFluid,
    WCATerm,
    LennardJonesFluid,
    _f32,
    subrandom_particle_positions,
)
from openmmtools_tpu.ops.geometry import safe_norm
from openmmtools_tpu.ops.pme import make_ewald_reciprocal_term
from openmmtools_tpu.system import (
    Constraints,
    CustomExternalTerm,
    HarmonicBondTerm,
    NonbondedTerm,
    System,
    no_constraints,
)
from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field


class SodiumChlorideCrystal(TestSystem):
    """One NaCl pair in a periodic Ewald lattice (testsystems.py:1561).

    Parameters: sigma_Na = 3.330445 A, sigma_Cl = 4.41724 A, eps_Na =
    0.002772, eps_Cl = 0.118 kcal/mol, box 5.628 A, Cl at (a/2, a/2, a/2).
    """

    def __init__(self, switch_width=0.2 * A, dispersion_correction=True):
        super().__init__()
        box_edge = 5.628 * A
        cutoff = box_edge / 2.0 * 0.99
        charges = np.asarray([1.0, -1.0])
        sigmas = np.asarray([3.330445 * A, 4.41724 * A])
        epsilons = np.asarray([0.002772 * KCAL, 0.118 * KCAL])
        masses = np.asarray([22.990, 35.453])
        from openmmtools_tpu.ops.pme import ewald_alpha

        alpha = ewald_alpha(cutoff)
        nb = NonbondedTerm(
            charge=_f32(charges), sigma=_f32(sigmas), epsilon=_f32(epsilons),
            exception_index=np.zeros((0, 2), np.int32),
            exception_chargeprod=_f32([]), exception_sigma=_f32([]),
            exception_epsilon=_f32([]),
            method="ewald", cutoff=cutoff, switch_width=switch_width,
            use_dispersion_correction=dispersion_correction,
            ewald_alpha=float(alpha))
        rec = make_ewald_reciprocal_term(charges, box_edge, cutoff,
                                         np.zeros((0, 2), np.int64))
        self.system = System(
            masses=_f32(masses), terms=(nb, rec),
            constraints=no_constraints(),
            default_box=np.diag(_f32([box_edge] * 3)), periodic=True)
        positions = np.zeros((2, 3), dtype=np.float32)
        positions[1] = 2.814 * A
        self.positions = np.asarray(positions)


class DiatomicFluid(TestSystem):
    """Periodic fluid of diatomic molecules (testsystems.py:1137).

    Defaults: 250 molecules, K = 424 kcal/mol/A^2, r0 = 1.383 A,
    eps = 0.17 kcal/mol, sigma = 1.824 A, charge 0 (DipolarFluid sets +-q);
    ``constraint=True`` replaces the bond with a distance constraint.
    """

    def __init__(self, nmolecules=250, K=424.0 * KCAL / A**2, r0=1.383 * A,
                 mass=14.0, epsilon=0.1700 * KCAL, sigma=1.8240 * A,
                 charge=0.0, cutoff=None, constraint=False,
                 dispersion_correction=True):
        super().__init__()
        n = 2 * nmolecules
        number_density = 0.25 / (sigma**3)
        volume = n / number_density
        length = volume ** (1.0 / 3.0)
        if cutoff is None:
            cutoff = min(3.0 * sigma, 0.49 * length)
        box = np.diag(_f32([length] * 3))

        charges = np.tile([charge, -charge], nmolecules)
        mol = np.arange(nmolecules)[:, None] * 2
        pair_idx = mol + np.array([0, 1])
        exc_qq = np.full(nmolecules, -charge * charge)
        nb = NonbondedTerm(
            charge=_f32(charges), sigma=_f32(np.full(n, sigma)),
            epsilon=_f32(np.full(n, epsilon)),
            exception_index=np.asarray(pair_idx, np.int32),
            exception_chargeprod=_f32(np.zeros(nmolecules)),
            exception_sigma=_f32(np.full(nmolecules, sigma)),
            exception_epsilon=_f32(np.zeros(nmolecules)),
            method="cutoff_periodic", cutoff=cutoff,
            use_dispersion_correction=dispersion_correction)
        terms = [nb]
        if constraint:
            constraints = Constraints(index=np.asarray(pair_idx, np.int32),
                                      distance=_f32(np.full(nmolecules, r0)))
        else:
            constraints = no_constraints()
            terms.append(HarmonicBondTerm(
                index=np.asarray(pair_idx, np.int32),
                length=_f32(np.full(nmolecules, r0)),
                k=_f32(np.full(nmolecules, K))))

        # place molecule centers subrandomly, orientations random
        centers = subrandom_particle_positions(nmolecules, box)
        rng = np.random.default_rng(0)
        axes = rng.normal(size=(nmolecules, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        positions = np.zeros((n, 3))
        positions[0::2] = centers + 0.5 * r0 * axes
        positions[1::2] = centers - 0.5 * r0 * axes
        self.system = System(masses=_f32(np.full(n, mass)),
                             terms=tuple(terms), constraints=constraints,
                             default_box=box, periodic=True)
        self.positions = np.asarray(positions, dtype=np.float32)
        self.nmolecules = nmolecules


class UnconstrainedDiatomicFluid(DiatomicFluid):
    """testsystems.py:1273."""

    def __init__(self, *args, **kwargs):
        kwargs["constraint"] = False
        super().__init__(*args, **kwargs)


class ConstrainedDiatomicFluid(DiatomicFluid):
    """testsystems.py:1290."""

    def __init__(self, *args, **kwargs):
        kwargs["constraint"] = True
        super().__init__(*args, **kwargs)


class DipolarFluid(DiatomicFluid):
    """Diatomic fluid with +-q partial charges (testsystems.py:1307)."""

    def __init__(self, charge=0.25, **kwargs):
        super().__init__(charge=charge, **kwargs)


class UnconstrainedDipolarFluid(DipolarFluid):
    def __init__(self, *args, **kwargs):
        kwargs["constraint"] = False
        super().__init__(*args, **kwargs)


class ConstrainedDipolarFluid(DipolarFluid):
    def __init__(self, *args, **kwargs):
        kwargs["constraint"] = True
        super().__init__(*args, **kwargs)


class ConstraintCoupledHarmonicOscillator(TestSystem):
    """Two particles in harmonic wells, rigidly constrained together
    (testsystems.py:1386). Defaults K = 1 kJ/mol/nm^2, d = 1 nm,
    mass = 39.948 amu."""

    def __init__(self, K=1.0, d=1.0, mass=39.948):
        super().__init__()
        self.K, self.d, self.mass = K, d, mass
        well = CustomExternalTerm(
            particles=np.asarray([0], np.int32),
            global_defaults={"K_ccho": _f32(K)},
            expression="(K_ccho/2.0)*(x**2+y**2+z**2)")
        well2 = CustomExternalTerm(
            particles=np.asarray([1], np.int32),
            global_defaults={"K_ccho2": _f32(K), "d_ccho": _f32(d)},
            expression="(K_ccho2/2.0)*((x-d_ccho)**2+y**2+z**2)")
        constraints = Constraints(index=np.asarray([[0, 1]], np.int32),
                                  distance=_f32([d]))
        self.system = System(masses=_f32([mass, mass]),
                             terms=(well, well2), constraints=constraints,
                             default_box=None, periodic=False)
        positions = np.zeros((2, 3), dtype=np.float32)
        positions[1, 0] = d
        self.positions = np.asarray(positions)
        self.ndof = 6 - 1


class LennardJonesGrid(LennardJonesFluid):
    """LJ fluid initialized on an (nx, ny, nz) grid at reduced density 0.86
    (testsystems.py:2083)."""

    def __init__(self, nx=8, ny=8, nz=8, reduced_density=0.86, **kwargs):
        nparticles = nx * ny * nz
        super().__init__(nparticles=nparticles,
                         reduced_density=reduced_density, **kwargs)
        # overwrite positions with the (possibly anisotropic) grid
        grid = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                    np.arange(nz), indexing="ij"),
                        axis=-1).reshape(-1, 3).astype(np.float64)
        scale = self.box_edge / np.array([nx, ny, nz])
        self.positions = np.asarray((grid + 0.5) * scale, dtype=np.float32)


class CustomLennardJonesFluidMixture(LennardJonesFluid):
    """Two-component LJ fluid: a fraction of particles with scaled epsilon
    (the reference uses this to cross-validate CustomNonbondedForce vs
    NonbondedForce, testsystems.py:2169; here the 'custom' component is a
    second particle type)."""

    def __init__(self, nparticles=1000, fraction=0.5, epsilon_scale=1.0,
                 **kwargs):
        super().__init__(nparticles=nparticles, **kwargs)
        n_b = int(nparticles * fraction)
        nb = self.system.terms[0]
        eps = np.array(nb.epsilon)
        eps[:n_b] *= epsilon_scale
        self.system = self.system.replace_term(
            0, nb.replace(epsilon=_f32(eps)))


@pytree_dataclass
class DoubleWellBondTerm:
    """U = h (1 - ((r - r0 - w)/w)^2)^2 per bond (testsystems.py:2478)."""

    index: jax.Array       # (B, 2)
    h: jax.Array
    r0: jax.Array
    w: jax.Array
    force_group: int = static_field(default=0)

    def energy(self, x, box, params=None):
        if self.index.shape[0] == 0:
            return jnp.zeros((), dtype=x.dtype)
        r = safe_norm(x[self.index[:, 0]] - x[self.index[:, 1]])
        t = (r - self.r0 - self.w) / self.w
        return jnp.sum(self.h * (1.0 - t * t) ** 2)


class DoubleWellDimer_WCAFluid(WCAFluid):
    """ndimers double-well bonded pairs in a WCA bath (testsystems.py:2393).
    Defaults: h = 6 * 0.824 * 120 K * kB, r0 = 2^(1/6) sigma, w = 0.3 sigma.
    """

    def __init__(self, ndimers=1, nparticles=216, density=0.96, mass=39.9,
                 epsilon=120.0 * kB, sigma=3.4 * A, h=None, r0=None, w=None):
        super().__init__(nparticles=nparticles, density=density, mass=mass,
                         epsilon=epsilon, sigma=sigma)
        if not 0 <= ndimers <= self._max_bonds(nparticles):
            raise ValueError(f"cannot create {ndimers} bonds with "
                             f"{nparticles} particles")
        h = 6.0 * 0.824 * 120.0 * kB if h is None else h
        r0 = 2.0 ** (1.0 / 6.0) * sigma if r0 is None else r0
        w = 0.3 * sigma if w is None else w
        self.ndimers = ndimers
        idx = self._bond_indices(ndimers)
        if ndimers:
            term = DoubleWellBondTerm(
                index=np.asarray(idx, np.int32),
                h=_f32(np.full(len(idx), h)), r0=_f32(np.full(len(idx), r0)),
                w=_f32(np.full(len(idx), w)))
            self.system = self.system.replace(
                terms=self.system.terms + (term,))
            # move bonded partners next to each other
            x = np.array(self.positions)
            for a, b in idx:
                x[b] = x[a] + np.array([r0, 0.0, 0.0])
            self.positions = np.asarray(x)

    @staticmethod
    def _bond_indices(ndimers):
        return [(2 * i, 2 * i + 1) for i in range(ndimers)]

    @staticmethod
    def _max_bonds(nparticles):
        return nparticles // 2


class DoubleWellChain_WCAFluid(DoubleWellDimer_WCAFluid):
    """Polymer chain of double-well bonds (testsystems.py:2540):
    nchained particles bonded consecutively.  Reference semantics
    (:2610-2623): nchained = 0 is allowed and means the same as 1 (a bare
    WCA fluid); a chain may span up to ALL nparticles (bond bound is
    nparticles - 1, not the dimer fluid's nparticles // 2); negative
    nchained raises ValueError."""

    def __init__(self, nchained=3, nparticles=216, **kwargs):
        self.nchained = nchained
        nchained = 1 if nchained == 0 else nchained
        super().__init__(ndimers=nchained - 1,
                         nparticles=nparticles, **kwargs)

    @staticmethod
    def _bond_indices(nbonds):
        return [(i, i + 1) for i in range(nbonds)]

    @staticmethod
    def _max_bonds(nparticles):
        return nparticles - 1


# ---------------------------------------------------------------------------
# molecular systems from the reference's Amber data files
# ---------------------------------------------------------------------------


class _PrmtopSystem(TestSystem):
    """Common loader for prmtop/inpcrd-based systems."""

    _subdir = None
    _prmtop = None
    _crd = None
    _implicit = False
    _gb_model = "OBC2"

    def __init__(self, constraints="h-bonds", data_dir=None):
        super().__init__()
        import os

        from openmmtools_tpu.models.amber import (
            DEFAULT_DATA_DIR,
            AmberTopology,
            create_system_from_prmtop,
            parse_inpcrd,
            parse_prmtop,
        )

        base = os.path.join(data_dir or DEFAULT_DATA_DIR, self._subdir)
        prmtop = os.path.join(base, self._prmtop)
        crd = os.path.join(base, self._crd)
        if not os.path.exists(prmtop):
            raise FileNotFoundError(f"data not found: {prmtop}; set "
                                    "OPENMMTOOLS_TPU_DATA")
        self.system = create_system_from_prmtop(
            prmtop, constraints=constraints,
            implicit_solvent=self._implicit, gb_model=self._gb_model)
        self.positions = np.asarray(parse_inpcrd(crd), dtype=np.float32)
        self.topology = AmberTopology(parse_prmtop(prmtop))
        self.ndof = (3 * self.system.n_particles
                     - self.system.constraints.n_constraints)


class HostGuestVacuum(_PrmtopSystem):
    """CB7:B2 host-guest complex in vacuum (testsystems.py:3650;
    data/cb7-b2/complex-vacuum.*)."""

    _subdir = "cb7-b2"
    _prmtop = "complex-vacuum.prmtop"
    _crd = "complex-vacuum.inpcrd"


class HostGuestImplicit(_PrmtopSystem):
    """CB7:B2 with GB implicit solvent (testsystems.py:3717); the GB
    model is selectable ('HCT' | 'OBC1' | 'OBC2', reference's named
    subclasses testsystems.py:3765-3775).  NOTE: this class's default
    stays OBC2 (round-3 energy pins); the reference's own default is
    OBC1 — use HostGuestImplicitOBC1 for that exact configuration.
    GBn/GBn2 are N/A here (neck-integral tables live inside OpenMM's
    kernels; ROADMAP 'Explicit N/A decisions')."""

    _subdir = "cb7-b2"
    _prmtop = "complex-vacuum.prmtop"
    _crd = "complex-vacuum.inpcrd"
    _implicit = True

    def __init__(self, gb_model="OBC2", **kwargs):
        self._gb_model = gb_model
        super().__init__(**kwargs)


class HostGuestImplicitHCT(HostGuestImplicit):
    def __init__(self, **kwargs):
        super().__init__(gb_model="HCT", **kwargs)


class HostGuestImplicitOBC1(HostGuestImplicit):
    def __init__(self, **kwargs):
        super().__init__(gb_model="OBC1", **kwargs)


class HostGuestImplicitOBC2(HostGuestImplicit):
    def __init__(self, **kwargs):
        super().__init__(gb_model="OBC2", **kwargs)


class LysozymeImplicit(_PrmtopSystem):
    """T4 lysozyme L99A + p-xylene, GBSA implicit (testsystems.py:3998;
    2603 atoms)."""

    _subdir = "T4-lysozyme-L99A-implicit"
    _prmtop = "complex.prmtop"
    _crd = "complex.crd"
    _implicit = True


class BenzeneTolueneImplicit(_PrmtopSystem):
    """Benzene + toluene in GBSA implicit solvent
    (data/benzene-toluene-implicit/complex.*; the reference's
    toluene-in-implicit-solvent family, testsystems.py:3533)."""

    _subdir = "benzene-toluene-implicit"
    _prmtop = "complex.prmtop"
    _crd = "complex.inpcrd"
    _implicit = True


class MolecularIdealGas(TestSystem):
    """Alanine dipeptide with all interactions removed except constraints —
    a molecular ideal gas (testsystems.py:4191: the reference zeroes the
    forces of a molecular system to validate integrator kinetics)."""

    def __init__(self, data_dir=None):
        super().__init__()
        from openmmtools_tpu.models.testsystems import AlanineDipeptideVacuum

        base = AlanineDipeptideVacuum(constraints=None, data_dir=data_dir)
        # keep only bonded structure (harmonic bonds) so molecules hold
        # together, drop all nonbonded terms as the reference does
        kept = tuple(t for t in base.system.terms
                     if type(t).__name__ in ("HarmonicBondTerm",
                                             "HarmonicAngleTerm"))
        self.system = base.system.replace(terms=kept)
        self.positions = base.positions
        self.ndof = 3 * self.system.n_particles


class AlanineDipeptideExplicit(_PrmtopSystem):
    """Alanine dipeptide in explicit TIP3P water, PME, 2269 atoms
    (testsystems.py:3482 AlanineDipeptideExplicit;
    data/alanine-dipeptide-explicit/*)."""

    _subdir = "alanine-dipeptide-explicit"
    _prmtop = "alanine-dipeptide.prmtop"
    _crd = "alanine-dipeptide.crd"

    def __init__(self, constraints="h-bonds", cutoff=0.9, data_dir=None):
        import os

        from openmmtools_tpu.models.amber import (
            DEFAULT_DATA_DIR,
            AmberTopology,
            create_system_from_prmtop,
            parse_inpcrd,
            parse_prmtop,
        )

        TestSystem.__init__(self)
        base = os.path.join(data_dir or DEFAULT_DATA_DIR, self._subdir)
        prmtop = os.path.join(base, self._prmtop)
        if not os.path.exists(prmtop):
            raise FileNotFoundError(f"data not found: {prmtop}")
        self.system = create_system_from_prmtop(
            prmtop, constraints=constraints, nonbonded_method="pme",
            cutoff=cutoff)
        self.positions = np.asarray(
            parse_inpcrd(os.path.join(base, self._crd)), dtype=np.float32)
        self.topology = AmberTopology(parse_prmtop(prmtop))
        self.ndof = (3 * self.system.n_particles
                     - self.system.constraints.n_constraints)


class DHFRExplicit(TestSystem):
    """DHFR in explicit TIP3P water — the Joint Amber-CHARMM benchmark
    system, 23558 atoms (testsystems.py:3863 DHFRExplicit; data/dhfr/).
    Coordinates come from system.pdb (JAC.inpcrd is a binary NetCDF
    restart)."""

    def __init__(self, constraints="h-bonds", cutoff=0.9, data_dir=None,
                 switch_width=None, ewald_error_tolerance=5e-4):
        """Defaults follow the classic JAC benchmark convention (0.9 nm
        hard cutoff, OpenMM's 5e-4 PME tolerance) used by this repo's
        perf tables since round 2.  The reference *testsystem* defaults
        differ: cutoff 1.0 nm, switch_width 0.15 nm, tol 1e-5
        (testsystems.py:69-71,3893) — pass
        ``cutoff=1.0, switch_width=0.15, ewald_error_tolerance=1e-5``
        for that configuration (benchmark_dhfr --reference-defaults
        measures it)."""
        super().__init__()
        import os

        from openmmtools_tpu.models.amber import (
            DEFAULT_DATA_DIR,
            AmberTopology,
            create_system_from_prmtop,
            parse_pdb_positions,
            parse_prmtop,
        )

        base = os.path.join(data_dir or DEFAULT_DATA_DIR, "dhfr")
        prmtop = os.path.join(base, "JAC.prmtop")
        if not os.path.exists(prmtop):
            raise FileNotFoundError(f"data not found: {prmtop}")
        self.system = create_system_from_prmtop(
            prmtop, constraints=constraints, nonbonded_method="pme",
            cutoff=cutoff, switch_width=switch_width,
            ewald_error_tolerance=ewald_error_tolerance)
        self.positions = np.asarray(
            parse_pdb_positions(os.path.join(base, "system.pdb"))[
                : self.system.n_particles], dtype=np.float32)
        self.topology = AmberTopology(parse_prmtop(prmtop))
        self.ndof = (3 * self.system.n_particles
                     - self.system.constraints.n_constraints)


class HostGuestExplicit(_PrmtopSystem):
    """CB7:B2 complex in explicit water, PME (testsystems.py:3792;
    data/cb7-b2/complex-explicit.*)."""

    def __init__(self, constraints="h-bonds", cutoff=0.9, data_dir=None):
        import os

        from openmmtools_tpu.models.amber import (
            DEFAULT_DATA_DIR,
            AmberTopology,
            create_system_from_prmtop,
            parse_inpcrd,
            parse_prmtop,
        )

        TestSystem.__init__(self)
        base = os.path.join(data_dir or DEFAULT_DATA_DIR, "cb7-b2")
        prmtop = os.path.join(base, "complex-explicit.prmtop")
        if not os.path.exists(prmtop):
            raise FileNotFoundError(f"data not found: {prmtop}")
        self.system = create_system_from_prmtop(
            prmtop, constraints=constraints, nonbonded_method="pme",
            cutoff=cutoff)
        self.positions = np.asarray(
            parse_inpcrd(os.path.join(base, "complex-explicit.inpcrd")),
            dtype=np.float32)
        self.topology = AmberTopology(parse_prmtop(prmtop))
        self.ndof = (3 * self.system.n_particles
                     - self.system.constraints.n_constraints)


class TolueneVacuum(_PrmtopSystem):
    """Toluene (GAFF/AM1-BCC) in vacuum (testsystems.py:3533;
    data/benzene-toluene-implicit/solvent.*)."""

    _subdir = "benzene-toluene-implicit"
    _prmtop = "solvent.prmtop"
    _crd = "solvent.inpcrd"


class TolueneImplicit(_PrmtopSystem):
    """Toluene in GB implicit solvent (testsystems.py:3575); the GB model
    is selectable ('HCT' | 'OBC1' | 'OBC2', reference's named subclasses
    testsystems.py:3626-3645)."""

    _subdir = "benzene-toluene-implicit"
    _prmtop = "solvent.prmtop"
    _crd = "solvent.inpcrd"
    _implicit = True

    def __init__(self, gb_model="OBC2", **kwargs):
        self._gb_model = gb_model
        super().__init__(**kwargs)


class TolueneImplicitHCT(TolueneImplicit):
    def __init__(self, **kwargs):
        super().__init__(gb_model="HCT", **kwargs)


class TolueneImplicitOBC1(TolueneImplicit):
    def __init__(self, **kwargs):
        super().__init__(gb_model="OBC1", **kwargs)


class TolueneImplicitOBC2(TolueneImplicit):
    def __init__(self, **kwargs):
        super().__init__(gb_model="OBC2", **kwargs)


class MethanolBox(TestSystem):
    """Box of methanol molecules, periodic cutoff electrostatics
    (testsystems.py:4146; data/methanol-box/)."""

    def __init__(self, constraints="h-bonds", nonbonded_method="cutoff_periodic",
                 data_dir=None):
        super().__init__()
        import os

        from openmmtools_tpu.models.amber import (
            DEFAULT_DATA_DIR,
            AmberTopology,
            create_system_from_prmtop,
            parse_inpcrd,
            parse_prmtop,
        )

        base = os.path.join(data_dir or DEFAULT_DATA_DIR, "methanol-box")
        prmtop = os.path.join(base, "methanol-box.prmtop")
        if not os.path.exists(prmtop):
            raise FileNotFoundError(f"data not found: {prmtop}")
        positions, box = parse_inpcrd(os.path.join(base, "methanol-box.crd"),
                                      return_box=True)
        # small box (~1.4 nm): cutoff must stay below half the edge
        cutoff = min(0.9, 0.49 * float(np.min(box)))
        self.system = create_system_from_prmtop(
            prmtop, constraints=constraints,
            nonbonded_method=nonbonded_method, cutoff=cutoff)
        self.positions = np.asarray(positions, dtype=np.float32)
        self.topology = AmberTopology(parse_prmtop(prmtop))
        self.ndof = (3 * self.system.n_particles
                     - self.system.constraints.n_constraints)


class DNADodecamerExplicit(TestSystem):
    """Drew-Dickerson B-DNA dodecamer in explicit solvent, PME
    (testsystems.py:3929; data/dna_dodecamer_explicit/, 13646 atoms)."""

    def __init__(self, constraints="h-bonds", cutoff=0.9, data_dir=None):
        super().__init__()
        import os

        from openmmtools_tpu.models.amber import (
            DEFAULT_DATA_DIR,
            AmberTopology,
            create_system_from_prmtop,
            parse_inpcrd,
            parse_prmtop,
        )

        base = os.path.join(data_dir or DEFAULT_DATA_DIR,
                            "dna_dodecamer_explicit")
        prmtop = os.path.join(base, "prmtop")
        if not os.path.exists(prmtop):
            raise FileNotFoundError(f"data not found: {prmtop}")
        self.system = create_system_from_prmtop(
            prmtop, constraints=constraints, nonbonded_method="pme",
            cutoff=cutoff)
        self.positions = np.asarray(
            parse_inpcrd(os.path.join(base, "inpcrd")), dtype=np.float32)
        self.topology = AmberTopology(parse_prmtop(prmtop))
        self.ndof = (3 * self.system.n_particles
                     - self.system.constraints.n_constraints)


class CustomGBForceSystem(TestSystem):
    """140 charged LJ particles with an OBC-II generalized Born force
    (testsystems.py:4279, itself from OpenMM's TestReferenceCustomGBForce).
    The reference builds the GB math as CustomGBForce expressions; here the
    same HCT-integral + OBC-tanh + ACE-surface energy is the native
    GBSAOBCTerm (ops/gbsa.py). Radii 0.2/0.1 nm, scales 0.5 (first half) /
    0.8 (second half), solvent dielectric 80."""

    def __init__(self, n_molecules=70, box_size=10.0, cutoff=2.0):
        super().__init__()
        from openmmtools_tpu.ops.gbsa import GBSAOBCTerm

        n = 2 * n_molecules
        charges = np.tile([1.0, -1.0], n_molecules)
        radii = np.tile([0.2, 0.1], n_molecules)
        half = n_molecules // 2
        scales = np.repeat(np.where(np.arange(n_molecules) < half, 0.5, 0.8),
                           2)
        sigma, epsilon, mass = 0.335, 0.001603, 39.9
        nb = NonbondedTerm(
            charge=_f32(charges), sigma=_f32(np.full(n, sigma)),
            epsilon=_f32(np.full(n, epsilon)),
            exception_index=np.zeros((0, 2), np.int32),
            exception_chargeprod=_f32([]), exception_sigma=_f32([]),
            exception_epsilon=_f32([]),
            method="cutoff_periodic", cutoff=cutoff)
        gb = GBSAOBCTerm(charge=_f32(charges), radius=_f32(radii),
                         scale=_f32(scales), solvent_dielectric=80.0)
        box = np.diag(_f32([box_size] * 3))
        self.system = System(masses=_f32(np.full(n, mass)), terms=(nb, gb),
                             constraints=no_constraints(), default_box=box,
                             periodic=True)
        self.positions = np.asarray(
            subrandom_particle_positions(n, box),
            dtype=np.float32)
