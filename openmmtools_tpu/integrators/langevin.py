"""Langevin splitting integrators as compiled JAX step programs.

The reference builds OpenMM ``CustomIntegrator`` programs from an
operator-splitting DSL (``LangevinIntegrator`` integrators.py:1015;
parser :1474; substep emitters :1404-1460; Metropolization :1539-1557).
Here the same DSL compiles — at Python build time — into a single pure
function ``step(state) -> state``:

* ``R``      position drift x += (dt/n_R) v, SHAKE + velocity correction
* ``V``      full-force kick; ``V0``..``V31`` per-force-group kicks (MTS)
* ``O``      Ornstein–Uhlenbeck: v = a v + b sqrt(kT/m) xi with
             a = exp(-gamma h), b = sqrt(1 - a^2)  (integrators.py:1143-1146)
* ``{ ... }`` Metropolization of the enclosed deterministic substeps
             (GHMC; integrators.py:1539-1557)

Work/heat bookkeeping (integrators.py:1173-1194): ``shadow_work`` accumulates
total-energy changes of deterministic substeps, ``heat`` accumulates kinetic
energy changes of O substeps. Both are optional at build time; per-group
potential energies are always carried (computed with the forces in one
``value_and_grad`` pass, so the extra cost is negligible).

One compiled program integrates ``n_steps`` under ``lax.scan``; replicas
batch with ``vmap``; the thermostat temperature is a *traced* field of the
state (ThermostatedIntegrator analog, integrators.py:124-253 — changing
temperature does not retrace).
"""
from __future__ import annotations

import logging
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from openmmtools_tpu.constants import kB
from openmmtools_tpu.ops.constraints import rattle_velocities, shake_positions
from openmmtools_tpu.states import SamplerState, ThermodynamicState
from openmmtools_tpu.system import System, make_energy_force_fn
from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field

logger = logging.getLogger(__name__)


class IntegratorError(Exception):
    pass


# ---------------------------------------------------------------------------
# splitting parser (reference _parse_splitting_string, integrators.py:1474)
# ---------------------------------------------------------------------------

_MAX_GROUPS = 32


def parse_splitting(splitting: str) -> List[str]:
    """Tokenize and validate a splitting string.

    Rules (mirroring integrators.py:1319-1402 sanity checks):
    tokens are R, O, V, V0..V31, {, }; braces must match, not nest, and may
    not contain O (the Metropolized block must be deterministic); bare V and
    numbered Vn may not be mixed.
    """
    tokens = splitting.upper().split()
    if not tokens:
        raise IntegratorError("empty splitting string")
    depth = 0
    seen_block = False
    has_bare_v = False
    has_numbered_v = False
    for tok in tokens:
        if tok == "{":
            if depth:
                raise IntegratorError("nested Metropolization blocks")
            if seen_block:
                raise IntegratorError("only one Metropolization block allowed")
            depth += 1
            seen_block = True
        elif tok == "}":
            if not depth:
                raise IntegratorError("unmatched '}'")
            depth -= 1
        elif tok == "R":
            pass
        elif tok == "O":
            if depth:
                raise IntegratorError("O step inside Metropolization block")
        elif tok == "V":
            has_bare_v = True
        elif tok.startswith("V") and tok[1:].isdigit():
            g = int(tok[1:])
            if not 0 <= g < _MAX_GROUPS:
                raise IntegratorError(f"force group {g} out of range")
            has_numbered_v = True
        elif tok == "H":
            pass  # alchemical perturbation (nonequilibrium subclasses)
        else:
            raise IntegratorError(f"unknown splitting token {tok!r}")
    if depth:
        raise IntegratorError("unmatched '{'")
    if has_bare_v and has_numbered_v:
        raise IntegratorError("cannot mix bare V with numbered Vn tokens")
    return tokens


# ---------------------------------------------------------------------------
# integrator state
# ---------------------------------------------------------------------------


@pytree_dataclass
class IntegratorState:
    """Carried state of a compiled integrator program.

    The analog of the reference's CustomIntegrator globals/per-DOF variables
    (kT, a, b, heat, shadow_work, protocol_work, naccept, ntrials —
    integrators.py:1139-1194,2242-2290) as a pytree.
    """

    positions: jax.Array
    velocities: jax.Array
    rng_key: jax.Array
    kT: jax.Array
    box: Optional[jax.Array] = None
    global_params: Dict[str, Any] = None
    # per-force-group caches, aligned with the builder's group list
    forces: Tuple[jax.Array, ...] = ()
    potentials: Tuple[jax.Array, ...] = ()
    heat: jax.Array = 0.0
    shadow_work: jax.Array = 0.0
    protocol_work: jax.Array = 0.0
    n_accepted: jax.Array = 0
    n_proposed: jax.Array = 0
    lambda_: jax.Array = 0.0
    lambda_step: jax.Array = 0
    step_count: jax.Array = 0
    # neighbor-list state (None when the dense path is active)
    nbr_idx: Optional[jax.Array] = None      # (N, K_max) int32
    nbr_mask: Optional[jax.Array] = None     # (N, K_max) bool
    nbr_overflow: Optional[jax.Array] = None  # () bool, sticky
    # bounded-sweep state (ops/sweep_nb.py; None when inactive)
    sweep_perm: Optional[jax.Array] = None   # (N,) sorted slot -> orig index
    sweep_inv: Optional[jax.Array] = None    # (N,) orig index -> sorted slot
    sweep_snap: Optional[jax.Array] = None   # (N, 3) sorted coords at rebuild
    sweep_nblk: Optional[jax.Array] = None   # () int32; -1 forces rebuild
    sweep_excl: Optional[jax.Array] = None   # (mask_rows, n_pad) int32
    sweep_overflow: Optional[jax.Array] = None  # () bool, sticky

    @property
    def temperature(self):
        return self.kT / kB


def thermalize_velocities(masses, kT, key, dtype=jnp.float32):
    """Draw Maxwell–Boltzmann velocities (massless particles get 0)."""
    n = masses.shape[0]
    sigma = jnp.where(masses > 0, jnp.sqrt(kT / jnp.maximum(masses, 1e-30)), 0.0)
    noise = jax.random.normal(key, (n, 3), dtype=dtype)
    return noise * sigma[:, None].astype(dtype)


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------


class _Env:
    """Mutable trace-time environment threaded through substep emitters."""

    def __init__(self):
        self.x = None
        self.v = None
        self.key = None
        self.kT = None
        self.params = None
        self.U: Dict[Any, Any] = {}      # group -> cached potential (or None)
        self.F: Dict[Any, Any] = {}      # group -> cached force (or None)
        self.heat = None
        self.shadow_work = None
        self.protocol_work = None
        self.n_accepted = None
        self.n_proposed = None
        self.lambda_ = None
        self.lambda_step = None
        self.step_count = None
        self.box = None
        self.nbr = None
        self.sweep = None
        self.stash = None


class BoundIntegrator:
    """An integrator compiled against a specific System.

    Provides the pure ``step_fn`` / ``run(state, n_steps)`` and state
    constructors. The (System-independent) integrator classes below bind
    lazily; binding plays the role of OpenMM Context creation
    (states.py:1094) minus device allocation.
    """

    def __init__(self, integrator: "LangevinIntegrator", system: System):
        self.integrator = integrator
        self.system = system
        self.masses = system.masses
        self.inv_mass = jnp.where(system.masses > 0,
                                  1.0 / jnp.maximum(system.masses, 1e-30), 0.0)
        self.tokens = parse_splitting(integrator.splitting)

        # group list: None = all forces in one evaluation
        numbered = sorted({int(t[1:]) for t in self.tokens
                           if t.startswith("V") and len(t) > 1})
        self.groups: List[Any] = numbered if numbered else [None]

        # analytic joint (U, F) per force group (ops/pair_forces.py);
        # _vg_fns keeps the legacy (u, grad) signature for subclasses
        self._ef_fns = {}
        self._vg_fns = {}
        for g in self.groups:
            ef = make_energy_force_fn(system,
                                      groups=None if g is None else [g])
            self._ef_fns[g] = ef

            def vg(x, box, params, _ef=ef):
                u, f = _ef(x, box, params)
                return u, -f

            self._vg_fns[g] = vg

        # substep counts → per-substep timesteps (integrators.py:1474 counts)
        self.n_R = max(1, self.tokens.count("R"))
        self.n_O = max(1, self.tokens.count("O"))
        self.n_V = {g: max(1, (self.tokens.count("V") if g is None
                               else self.tokens.count(f"V{g}")))
                    for g in self.groups}
        self.n_H = self.tokens.count("H")

        dt = integrator.timestep
        gamma = integrator.collision_rate
        self.h_R = dt / self.n_R
        self.h_O = dt / self.n_O
        # a, b constants per O substep (integrators.py:1143-1146)
        self.ou_a = math.exp(-gamma * self.h_O)
        self.ou_b = math.sqrt(1.0 - math.exp(-2.0 * gamma * self.h_O))

        # constraint solver dispatch (OpenMM's SETTLE + CCMA architecture):
        # analytic SETTLE for rigid isosceles triangles (rigid water) and
        # cluster-direct M-SHAKE for the remaining small clusters (protein
        # h-bonds) applied together on their disjoint atom sets; iterative
        # Jacobi SHAKE/RATTLE as the general fallback when clustering fails
        from openmmtools_tpu.ops.constraints import (
            analyze_clusters,
            partition_constraints,
        )

        self._settle = None
        self._clusters = None
        self._rest_constraints = None
        if system.constraints.n_constraints > 0:
            self._settle, rest = partition_constraints(system.constraints,
                                                       system.masses)
            if rest is not None:
                self._rest_constraints = rest
                self._clusters = analyze_clusters(rest, system.masses)
            if self._settle is None and self._clusters is None:
                self._rest_constraints = system.constraints

        self._neighbor_setup()
        self._sweep_setup()
        self._fused = None
        self._fused_setup()
        self._step_fn = self._build_step()
        # scan-interior step: the trailing velocity projection is dropped
        # when the next iteration's leading V/O re-projects at the same
        # positions (see _vproj_skip_eligible); run_program restores the
        # final state's projection once per chunk. Only the base
        # token-driven _build_step supports the skip — subclasses with
        # custom step builders (HMC/Andersen/Nose-Hoover) opt out here.
        self._vproj_skip = (
            type(self)._build_step is BoundIntegrator._build_step
            and self._vproj_skip_eligible())
        self._step_fn_fast = (self._build_step(skip_trailing_vproj=True)
                              if self._vproj_skip else self._step_fn)
        self._run_cache: Dict[int, Any] = {}

    # -- neighbor-list production path --------------------------------------
    def _neighbor_setup(self):
        """Enable the fixed-capacity neighbor-list force path when the
        system is a large single-group cutoff system (the production MD
        case). The dense O(N^2) path remains the correctness fallback."""
        from openmmtools_tpu.system import NonbondedTerm

        self.neighbor_mode = False
        integ = self.integrator
        if getattr(integ, "neighborlist", "auto") is None:
            return
        system = self.system
        if len(self.groups) != 1 or self.groups[0] is not None:
            return
        nb_terms = [t for t in system.terms
                    if isinstance(t, NonbondedTerm)
                    and t.cutoff is not None and t.method != "no_cutoff"
                    and t.periodic]
        # TPU XLA lowers (N, K) index gathers to serialized dynamic slices,
        # making the list path slower than the dense path until the fused
        # Pallas kernel takes over — keep the dense path there by default
        min_particles = 128 if jax.default_backend() == "cpu" else 100_000
        if len(nb_terms) != 1 or system.n_particles < min_particles:
            return
        if system.default_box is None:
            return
        term = nb_terms[0]
        cutoff = term.cutoff
        skin = getattr(integ, "neighbor_skin", None)
        if skin is None:
            skin = 0.35 * cutoff
        r_list = cutoff + skin
        vol = float(jnp.prod(jnp.diagonal(system.default_box)))
        density = system.n_particles / vol
        avg = density * 4.0 / 3.0 * math.pi * r_list**3
        k_max = int(math.ceil(2.5 * avg + 8))
        k_max = min(k_max, system.n_particles - 1)
        interval = getattr(integ, "neighbor_rebuild_interval", None)
        if interval is None:
            # conservative bound: 4x thermal drift per step must not exceed
            # skin/2 over the interval
            kT = kB * float(getattr(integ, "temperature", 300.0))
            masses = system.masses
            v_th = float(jnp.max(jnp.sqrt(
                kT / jnp.maximum(jnp.where(masses > 0, masses, jnp.inf),
                                 1e-30))))
            drift = 4.0 * max(v_th, 1e-6) * integ.timestep
            interval = max(1, int((0.5 * skin) / max(drift, 1e-12)))
            interval = min(interval, 200)
        self.neighbor_mode = True
        self._nb_term = term
        self.neighbor_k_max = k_max
        self.neighbor_r_list = r_list
        self.neighbor_rebuild_interval = interval
        other_terms = tuple(t for t in system.terms if t is not term)

        def u_total(x, box, params, nbr):
            total = term.energy_neighbors(x, box, params, nbr)
            for t in other_terms:
                total = total + t.energy(x, box, params)
            return total

        self._vg_nbr = jax.value_and_grad(u_total)

    # -- bounded-sweep production path (large heterogeneous systems) -------
    def _sweep_setup(self):
        """Enable the bounded-sweep Pallas direct-space kernel
        (ops/sweep_nb.py) for large periodic systems with real force
        fields (DHFR scale).  The kernel replaces the NonbondedTerm's
        standard pair sum (exception pairs masked, added back in XLA);
        bonded terms, reciprocal space, constraints and the splitting DSL
        run in XLA around it.  Replaces OpenMM's neighbor-list direct
        space (SURVEY.md §2.2 row 1) above ~8k atoms, where the dense
        O(N^2) path stops being practical."""
        from openmmtools_tpu.system import NonbondedTerm

        self.sweep_mode = False
        self._sweep_group = None
        integ = self.integrator
        policy = getattr(integ, "sweep", "auto")
        if policy is None:
            return
        system = self.system
        if system.default_box is None:
            return
        from openmmtools_tpu.alchemy import AlchemicalNonbondedTerm

        nb_terms = [t for t in system.terms
                    if type(t) in (NonbondedTerm, AlchemicalNonbondedTerm)]
        if len(nb_terms) != 1:
            return
        term = nb_terms[0]
        alchemical = isinstance(term, AlchemicalNonbondedTerm)
        if alchemical:
            # kernel covers the factory's softcore_beta = 0 (reff = r) and
            # c = 6 (no per-pair pow) configuration — the reference
            # defaults — for ANY region count (round-5: multi-region pair
            # classes dispatch in-kernel from region codes; VERDICT r4
            # item 6). beta != 0 / c != 6 fall back to the dense path.
            if term.softcore_beta != 0.0 or term.softcore_c != 6.0:
                if system.n_particles >= 4096:
                    # loud: the dense path is O(N^2) — at N >= 4096 the
                    # sweep kernel is the production path and silently
                    # losing it is a perf cliff
                    logger.warning(
                        "alchemical system with softcore_beta=%g, "
                        "softcore_c=%g (N=%d) falls back to the dense "
                        "O(N^2) force path — the sweep kernel covers the "
                        "beta=0, c=6 reference defaults only; expect a "
                        "2-10x step-time penalty at this size",
                        term.softcore_beta, term.softcore_c,
                        system.n_particles)
                return
        # the sweep serves the force group holding the NonbondedTerm; with
        # numbered Vn splittings (MTS/r-RESPA) other groups — e.g. the
        # reciprocal-space term on a slower timescale — evaluate normally
        if self.groups == [None]:
            sweep_group = None
        elif term.force_group in self.groups:
            sweep_group = term.force_group
        else:
            return
        if (term.method not in ("pme", "ewald", "cutoff_periodic")
                or term.cutoff is None):
            return
        # charge/lj scale params fold into the sorted per-particle
        # parameters (q*scale, sqrt_eps*sqrt(scale)) in _sweep_eval —
        # no kernel change needed (round-3 coverage fix, VERDICT #2)
        min_n = 1024 if policy == "auto" else 0
        if policy == "auto" and jax.default_backend() != "tpu":
            return
        if system.n_particles < min_n:
            return
        import numpy as _np

        diag = _np.diagonal(_np.asarray(system.default_box))
        if float(term.cutoff) > 0.5 * float(diag.min()):
            return
        from openmmtools_tpu.ops.sweep_nb import SweepNonbonded

        n_pad = -(-system.n_particles // 128) * 128
        mask_shells = min(2048, max(32, (n_pad // 2 // 32) * 32))
        kernel = SweepNonbonded(
            system.n_particles, term.method, float(term.cutoff),
            switch_width=term.switch_width, dielectric=term.dielectric,
            ewald_alpha=term.ewald_alpha, shift_rf=term.shift_rf,
            switch_coulomb=term.switch_coulomb,
            shell_block=getattr(integ, "sweep_shell_block", None) or 8,
            skin=getattr(integ, "neighbor_skin", None) or 0.1,
            mask_shells=mask_shells,
            alchemical=alchemical,
            n_regions=(len(term.annihilate_sterics) if alchemical else None),
            coulomb_pme_treatment=(alchemical
                                   and term.coulomb_pme_treatment),
            interpret=(policy == "interpret"))
        self.sweep_mode = True
        self._sweep_group = sweep_group
        self.neighbor_mode = False   # the sweep replaces the list path
        self._sweep_kernel = kernel
        self._sweep_term = term
        self._sweep_alch = term if alchemical else None
        self._sweep_sqrt_eps = _np.sqrt(_np.asarray(term.epsilon))
        self.sweep_sort_interval = getattr(
            integ, "sweep_sort_interval", None) or 100
        # dispersion tail: the pair-averaged integral is configuration-
        # independent — precompute it host-side in chunks (the jnp version
        # materializes (N, N) matrices: 2.2 GB at DHFR scale).  For the
        # alchemical term the per-pair lambda weight takes one of three
        # values by class (nn/na/aa), so three class sums make the tail a
        # runtime-scalar expression in lambda_sterics
        # (AlchemicalNonbondedTerm._dispersion_correction semantics).
        self._sweep_disp_avg = None
        self._sweep_disp_class = None
        if term.use_dispersion_correction:
            sig = _np.asarray(term.sigma, dtype=_np.float64)
            eps = _np.asarray(term.epsilon, dtype=_np.float64)
            if alchemical:
                sig = _np.maximum(sig, 1e-6)  # sigma=0 particles
            rc3 = float(term.cutoff) ** 3
            rc9 = rc3 ** 3
            n_p = sig.shape[0]
            chunk = max(1, (1 << 22) // n_p)
            if alchemical:
                # per-class pair sums over the region-pair classes
                # (including env-env first); consumed with per-class
                # lambda_eff^a weights — exactly the dense path's
                # lambda-weighted tail (alchemy._dispersion_correction)
                g = _np.asarray(term.region_id) + 1  # 0 = env
                n_regions = len(term.annihilate_sterics)
                classes_all = [(a, b) for a in range(n_regions + 1)
                               for b in range(a, n_regions + 1)]
                sums = _np.zeros(len(classes_all))
                for lo in range(0, n_p, chunk):
                    s_ij = 0.5 * (sig[lo:lo + chunk, None] + sig[None, :])
                    e_ij = _np.sqrt(eps[lo:lo + chunk, None] * eps[None, :])
                    s6 = s_ij ** 6
                    integral = 4.0 * e_ij * (s6 * s6 / (9.0 * rc9)
                                             - s6 / (3.0 * rc3))
                    a_ij = _np.minimum(g[lo:lo + chunk, None], g[None, :])
                    b_ij = _np.maximum(g[lo:lo + chunk, None], g[None, :])
                    for ci, (a, b) in enumerate(classes_all):
                        sums[ci] += float(_np.sum(
                            integral, where=(a_ij == a) & (b_ij == b)))
                self._sweep_disp_class = tuple(sums / (n_p * n_p))
            else:
                total = 0.0
                for lo in range(0, n_p, chunk):
                    s_ij = 0.5 * (sig[lo:lo + chunk, None] + sig[None, :])
                    e_ij = _np.sqrt(eps[lo:lo + chunk, None] * eps[None, :])
                    s3 = s_ij ** 3
                    s6 = s3 * s3
                    total += float(_np.sum(
                        4.0 * e_ij * (s6 * s6 / (9.0 * rc9)
                                      - s6 / (3.0 * rc3))))
                self._sweep_disp_avg = total / (n_p * n_p)

    def _resort_sweep(self, state: "IntegratorState") -> "IntegratorState":
        """Re-sort the sweep ring by current x; invalidates the block
        bound (next force eval rebuilds) and re-scatters the exception
        bitfield for the new permutation."""
        from openmmtools_tpu.ops.sweep_nb import (
            build_exclusion_bitfield,
            sort_for_sweep,
        )

        k = self._sweep_kernel
        box = state.box if state.box is not None else self.system.default_box
        perm, inv = sort_for_sweep(state.positions, box, k.n_pad)
        excl, max_sep = build_exclusion_bitfield(
            self._sweep_term.exception_index, inv, k.n_pad, k.mask_rows)
        overflow = max_sep > k.mask_shells
        if state.sweep_overflow is not None:
            overflow = overflow | state.sweep_overflow
        return state.replace(
            sweep_perm=perm, sweep_inv=inv,
            sweep_snap=jnp.zeros_like(state.positions),
            sweep_nblk=jnp.int32(-1), sweep_excl=excl,
            sweep_overflow=overflow)

    def _sweep_eval(self, x, box, params, sw):
        """Group energy/forces via the sweep kernel + XLA remainder.

        ``sw`` is a dict-like pytree of the sweep state fields; returns
        (u, F, new_sw).  The kernel covers the NonbondedTerm's standard
        pairs (exceptions masked); exceptions (plain no-cutoff LJ+Coulomb,
        OpenMM semantics system.py:163), all other terms, and the
        dispersion correction evaluate in XLA with autodiff forces.
        """
        from openmmtools_tpu.ops import nonbonded
        from openmmtools_tpu.ops.geometry import gather_rows, minimum_image

        k = self._sweep_kernel
        term = self._sweep_term
        n = self.system.n_particles
        L = jnp.diagonal(box)
        xw = x - L * jnp.floor(x / L)
        # barriered gather: an unfenced x[perm] fused into the arithmetic
        # below serializes on this backend (CLAUDE.md relay rule 3)
        y = gather_rows(xw, sw["perm"])                      # (N, 3) sorted
        disp = minimum_image(y - sw["snap"], box)
        moved = jnp.max(jnp.sum(disp * disp, axis=-1)) \
            > (0.5 * k.skin) ** 2
        rebuild = (sw["nblk"] < 0) | moved

        pad = k.n_pad - n
        y_pad = jnp.concatenate(
            [y, jnp.full((pad, 3), 1e6, y.dtype)]) if pad else y
        sqrt_eps = self._sweep_sqrt_eps
        charge = term.charge
        lj_scale = None
        lam = None
        lam_s_cls = None
        if self._sweep_alch is not None:
            # per-region-pair-class softcore scalars: the kernel
            # classifies each pair by its (unordered) region-code pair
            # and applies (lam_s, asc, lam_e) per class, computed here
            # from the effective pair lambda the dense path's
            # AlchemicalNonbondedTerm._pair_lambdas assigns to that
            # class (na: lam_r; same-region: lam_r if annihilating else
            # 1; cross: lam_a*lam_b, or 0 outside region_interactions)
            from openmmtools_tpu.alchemy import _region_lambdas
            from openmmtools_tpu.ops import softcore as _sc

            n_regions = len(term.annihilate_sterics)
            lam_s_reg = _region_lambdas(
                params, term.lambda_sterics_names, x.dtype)
            lam_e_reg = _region_lambdas(
                params, term.lambda_electrostatics_names, x.dtype)
            import numpy as _np
            allowed = _np.zeros((n_regions, n_regions), bool)
            for a, b in (term.region_interactions or ()):
                allowed[a, b] = allowed[b, a] = True
            classes = [(a, b) for a in range(n_regions + 1)
                       for b in range(a, n_regions + 1)][1:]
            one = jnp.ones((), x.dtype)
            zero = jnp.zeros((), x.dtype)

            def class_eff(reg, ann):
                vals = []
                for a, b in classes:
                    if a == 0:
                        vals.append(reg[b - 1])
                    elif a == b:
                        vals.append(reg[a - 1] if ann[a - 1] else one)
                    else:
                        vals.append(reg[a - 1] * reg[b - 1]
                                    if allowed[a - 1, b - 1] else zero)
                return jnp.stack(vals)

            ls_eff = class_eff(lam_s_reg, term.annihilate_sterics)
            lam_s_cls = _sc._pow(ls_eff, term.softcore_a)
            asc_cls = term.softcore_alpha * _sc._pow(
                1.0 - ls_eff, term.softcore_b)
            if term.exact_electrostatics:
                # per-particle linear charge scaling; kernel Coulomb
                # runs unscaled (lam_e entries = 1)
                lam_p = jnp.concatenate(
                    [jnp.ones((1,), x.dtype), lam_e_reg])[
                        jnp.asarray(term.region_id) + 1]
                charge = charge * lam_p
                lam_e_cls = jnp.ones_like(lam_s_cls)
            else:
                le_eff = class_eff(lam_e_reg,
                                   term.annihilate_electrostatics)
                lam_e_cls = _sc._pow(le_eff, term.softcore_d)
            lam = jnp.concatenate([lam_s_cls, asc_cls, lam_e_cls])
        # global charge/lj scale params fold into the per-particle rows:
        # q -> q*scale and sqrt_eps -> sqrt_eps*sqrt(lj_scale) reproduce
        # NonbondedTerm.energy's charge_scale/lj_scale semantics exactly
        # (eps_ij = se_i*se_j picks up one full factor of lj_scale)
        if getattr(term, "lj_scale_param", None) is not None:
            lj_scale = params.get(term.lj_scale_param, 1.0)
            sqrt_eps = sqrt_eps * jnp.sqrt(jnp.asarray(lj_scale, x.dtype))
        if getattr(term, "charge_scale_param", None) is not None:
            charge = charge * jnp.asarray(
                params.get(term.charge_scale_param, 1.0), x.dtype)
        rows = [term.sigma, sqrt_eps, charge]
        if self._sweep_alch is not None:
            rows[0] = jnp.maximum(term.sigma, 1e-6)  # sigma=0 particles
            rows.append(
                (jnp.asarray(term.region_id) + 1).astype(x.dtype))
        par = gather_rows(jnp.stack(rows, axis=1), sw["perm"])
        par_pad = jnp.concatenate(
            [par, jnp.zeros((pad, len(rows)), par.dtype)]) if pad else par
        F_s, u_s, nblk = k.forces(y_pad, par_pad, box, sw["excl"],
                                  rebuild, jnp.maximum(sw["nblk"], 0),
                                  lam=lam)
        # un-permute via the barriered inverse gather (a scatter-set here
        # serializes the same way the gathers do)
        F_direct = gather_rows(F_s, sw["inv"])
        snap_new = jnp.where(rebuild, y, sw["snap"])

        # XLA remainder: the terms sharing the sweep's force group
        g = self._sweep_group
        other_terms = tuple(
            t for t in self.system.terms
            if t is not term and (g is None or t.force_group == g))

        # ONE barriered gather (and ONE backward scatter) for the whole
        # O(B+A+T+E) remainder.  Separately, each valence term and the
        # exception add-back and the reciprocal term's exclusion
        # correction pay their own fenced gather + backward scatter-add
        # pass — 9+ serialized row passes totalling ~1.6 ms/step at DHFR
        # (round-5 profile_dhfr_step).  All their index columns
        # concatenate into one flat gather whose static slices feed the
        # rows-variant energy kernels (ops/bonded.py *_rows), the
        # exception pair math, and — when the recip term's exclusion list
        # is the same pair list (true by construction in the amber/water
        # builders) — the -erf(alpha r)/r correction from the same r.
        import numpy as _np

        from openmmtools_tpu.ops import bonded as _bonded
        from openmmtools_tpu.ops.pme import EwaldReciprocalTerm as _Recip
        from openmmtools_tpu.system import (
            HarmonicAngleTerm as _HA,
            HarmonicBondTerm as _HB,
            PeriodicTorsionTerm as _PT,
        )

        fused_recip = None
        if (self._sweep_alch is None
                and term.exception_index.shape[0] > 0):
            for t in other_terms:
                if (isinstance(t, _Recip) and t.kmax is not None
                        and _np.array_equal(
                            _np.asarray(t.exclusion_index),
                            _np.asarray(term.exception_index))):
                    fused_recip = t
                    break

        valence = []      # exact-type plain valence terms, fused gather
        leftover = []     # everything else evaluates via its own energy()
        cols = []
        for t in other_terms:
            if t is fused_recip:
                continue
            if type(t) in (_HB, _HA, _PT):
                if t.index.shape[0] == 0:
                    continue  # empty term contributes exactly 0
                valence.append(t)
                for c in range(t.index.shape[1]):
                    cols.append(_np.asarray(t.index[:, c], _np.int32))
            else:
                leftover.append(t)
        fuse_exceptions = (self._sweep_alch is None
                           and term.exception_index.shape[0] > 0)
        if fuse_exceptions:
            exc = _np.asarray(term.exception_index, _np.int32)
            cols += [exc[:, 0], exc[:, 1]]
        idx_all = _np.concatenate(cols) if cols else None

        def u_rest(xx):
            tot = jnp.zeros((), xx.dtype)
            X = gather_rows(xx, idx_all) if idx_all is not None else None
            off = 0

            def seg(count):
                nonlocal off
                rows = jax.lax.slice_in_dim(X, off, off + count, axis=0)
                off += count
                return rows

            for t in valence:
                m = t.index.shape[0]
                if type(t) is _HB:
                    tot = tot + _bonded.harmonic_bond_energy_rows(
                        seg(m), seg(m), t.length, t.k)
                elif type(t) is _HA:
                    tot = tot + _bonded.harmonic_angle_energy_rows(
                        seg(m), seg(m), seg(m), t.angle, t.k)
                else:
                    tot = tot + _bonded.periodic_torsion_energy_rows(
                        seg(m), seg(m), seg(m), seg(m),
                        t.periodicity, t.phase, t.k)
            if term.exception_index.shape[0] > 0:
                if self._sweep_alch is not None:
                    # kernel masking already removed the standard pair
                    # (the 'subtract'); only the softcore add remains
                    tot = tot + term.exception_add_energy(xx, box, params)
                else:
                    m = term.exception_index.shape[0]
                    d = seg(m) - seg(m)
                    if term.periodic:
                        d = minimum_image(d, box)
                    r2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
                    r = jnp.sqrt(r2)
                    # exception pairs REPLACE the combined-rule pair
                    # (plain no-cutoff LJ + Coulomb, system.py:163)...
                    e = (nonbonded.lj_pair(r2, term.exception_sigma,
                                           term.exception_epsilon)
                         + nonbonded.coulomb_pair(
                             r, term.exception_chargeprod, "no_cutoff"))
                    tot = tot + jnp.sum(e)
                    if fused_recip is not None:
                        # ...and the SAME r serves the reciprocal term's
                        # -erf(alpha r)/r exclusion correction
                        qr = fused_recip.effective_charge(params)
                        tot = tot + fused_recip.exclusion_correction_of_r(
                            qr, r)
            if fused_recip is not None:
                tot = tot + fused_recip.energy_without_exclusions(
                    xx, box, params)
            for t in leftover:
                tot = tot + t.energy(xx, box, params)
            return tot

        u_r, g_r = jax.value_and_grad(u_rest)(x)
        u = u_s + u_r
        if self._sweep_disp_avg is not None:
            volume = jnp.prod(L)
            tail = (2.0 * jnp.pi * n * n / volume) * self._sweep_disp_avg
            if lj_scale is not None:
                tail = tail * lj_scale  # eps_ij scales linearly in lj_scale
            u = u + tail
        elif self._sweep_disp_class is not None:
            # class sums include env-env first; weights are lambda_eff^a
            # per class (the dense path's lambda-weighted tail)
            c_cls = jnp.asarray(self._sweep_disp_class, x.dtype)
            weights = jnp.concatenate(
                [jnp.ones((1,), x.dtype), lam_s_cls])
            volume = jnp.prod(L)
            u = u + (2.0 * jnp.pi * n * n / volume) * jnp.sum(
                c_cls * weights)
        new_sw = dict(sw)
        new_sw["snap"] = snap_new
        new_sw["nblk"] = nblk
        return u, F_direct - g_r, new_sw

    def _fused_setup(self):
        """Enable the fully-fused dense-pair Pallas MD kernel for the
        production case: plain BAOAB on a monodisperse uncharged periodic
        LJ system with no constraints (the flagship benchmark
        configuration, BASELINE configs 1-2). Falls back to the XLA paths
        everywhere else.

        The kernel (ops/pallas_baoab.py) integrates whole chunks in ONE
        Pallas program: half-shell roll-sweep pair forces, both kicks and
        drifts, and in-kernel Box-Muller noise — measured ~12x the XLA
        dense path at N=2048 on v5e. It reads the box and temperature at
        run time, so states carrying a non-default box integrate
        correctly (ADVICE round-1 item 3)."""
        integ = self.integrator
        if getattr(integ, "neighborlist", "auto") is None:
            return
        if jax.default_backend() != "tpu":
            return
        if not set(self.tokens) <= {"R", "V", "O"}:
            return   # Metropolization/MTS/H need the XLA emitters
        if integ.measure_shadow_work or integ.measure_heat:
            return
        system = self.system
        # below ~192 particles the XLA dense path is already sub-5us/step
        # and kernel launch overhead dominates; above ~16k the O(N^2/2)
        # pair sweep loses to the cell-based kernels / neighbor paths
        if (system.constraints.n_constraints > 0 or len(system.terms) != 1
                or system.default_box is None
                or not 192 <= system.n_particles <= 32768):
            return
        from openmmtools_tpu.system import NonbondedTerm

        term = system.terms[0]
        if not isinstance(term, NonbondedTerm):
            return
        if (term.method != "cutoff_periodic" or term.cutoff is None
                or term.exception_index.shape[0] > 0):
            return
        import numpy as _np

        sig = _np.asarray(term.sigma)
        eps = _np.asarray(term.epsilon)
        q = _np.asarray(term.charge)
        mass = _np.asarray(system.masses)
        box = _np.asarray(system.default_box)
        diag = _np.diagonal(box)
        if not (_np.all(sig == sig[0]) and _np.all(eps == eps[0])
                and _np.all(q == 0.0) and _np.all(mass == mass[0])
                and _np.allclose(box, _np.diag(diag))):
            return
        if float(term.cutoff) > 0.5 * float(diag.min()):
            return  # minimum image invalid
        from openmmtools_tpu.ops.pallas_baoab import FusedSortedBAOAB

        self.sweep_mode = False   # the fused kernel supersedes the sweep
        self._fused_term = term
        # the sorted/bounded-sweep kernel: identical physics to the dense
        # half-shell kernel but sweeps only the measured interaction
        # range over x-sorted particles (2.8x at the bench state point)
        # and compiles in seconds instead of minutes (the block loop is
        # a fori_loop, not unrolled)
        self._fused = FusedSortedBAOAB(
            system.n_particles, float(term.cutoff), term.switch_width,
            float(sig[0]), float(eps[0]), float(mass[0]),
            integ.timestep, integ.collision_rate, sort_interval=250,
            tokens=tuple(self.tokens))

    def _build_nbr(self, x, box):
        from openmmtools_tpu.ops.neighborlist import build_neighbor_list

        return build_neighbor_list(x, box, self.neighbor_r_list,
                                   self.neighbor_k_max, periodic=True)

    def _rebuild_neighbors(self, state: IntegratorState) -> IntegratorState:
        nbr = self._build_nbr(state.positions, state.box)
        overflow = nbr.overflow
        if state.nbr_overflow is not None:
            overflow = overflow | state.nbr_overflow
        return state.replace(nbr_idx=nbr.idx, nbr_mask=nbr.mask,
                             nbr_overflow=overflow)

    # -- energy plumbing ----------------------------------------------------
    def _eval_group(self, g, x, box, params, nbr=None):
        if self.neighbor_mode and nbr is not None:
            u, grad = self._vg_nbr(x, box, params, nbr)
            return u, -grad
        return self._ef_fns[g](x, box, params)

    def _ensure_forces(self, env: _Env, groups=None):
        for g in (self.groups if groups is None else groups):
            if env.F[g] is None:
                if (self.sweep_mode and g == self._sweep_group
                        and getattr(env, "sweep", None) is not None):
                    u, f, env.sweep = self._sweep_eval(
                        env.x, env.box, env.params, env.sweep)
                else:
                    u, f = self._eval_group(g, env.x, env.box, env.params,
                                            nbr=env.nbr)
                env.U[g] = u
                env.F[g] = f

    def _total_potential(self, env: _Env):
        self._ensure_forces(env)
        total = env.U[self.groups[0]]
        for g in self.groups[1:]:
            total = total + env.U[g]
        return total

    def _kinetic(self, env: _Env):
        return 0.5 * jnp.sum(self.masses[:, None] * env.v * env.v)

    # -- constraint dispatch: SETTLE + M-SHAKE on disjoint partitions -----
    def _constrain_positions(self, x_new, x_old):
        from openmmtools_tpu.ops.constraints import (
            mshake_positions,
            settle_positions,
        )

        if self._settle is not None:
            x_new = settle_positions(x_new, x_old, self._settle, self.masses)
        if self._rest_constraints is not None:
            if self._clusters is not None:
                x_new = mshake_positions(
                    x_new, x_old, self._rest_constraints, self._clusters,
                    self.masses, tol=self.integrator.constraint_tolerance)
            else:
                x_new = shake_positions(
                    x_new, x_old, self._rest_constraints, self.masses,
                    tol=self.integrator.constraint_tolerance)
        return x_new

    def _constrain_velocities(self, x, v):
        from openmmtools_tpu.ops.constraints import (
            mrattle_velocities,
            settle_velocities,
        )

        if self._settle is not None:
            v = settle_velocities(x, v, self._settle, self.masses)
        if self._rest_constraints is not None:
            if self._clusters is not None:
                v = mrattle_velocities(x, v, self._rest_constraints,
                                       self._clusters, self.masses)
            else:
                v = rattle_velocities(
                    x, v, self._rest_constraints, self.masses,
                    tol=self.integrator.constraint_tolerance)
        return v

    # -- substep emitters (trace-time; reference integrators.py:1404-1557) --
    def _emit_R(self, env: _Env):
        integ = self.integrator
        if integ.measure_shadow_work:
            u_old = self._total_potential(env)
        x_old = env.x
        x_new = env.x + self.h_R * env.v
        if self.system.constraints.n_constraints > 0:
            x_proj = self._constrain_positions(x_new, x_old)
            # velocity correction v += (x_proj - x_unconstrained)/h
            env.v = env.v + (x_proj - x_new) / self.h_R
            x_new = x_proj
        env.x = x_new
        for g in self.groups:
            env.U[g] = None
            env.F[g] = None
        if integ.measure_shadow_work:
            u_new = self._total_potential(env)
            env.shadow_work = env.shadow_work + (u_new - u_old)

    def _emit_V(self, env: _Env, g, skip_constrain=False):
        integ = self.integrator
        self._ensure_forces(env, [g])
        if integ.measure_shadow_work:
            ke_old = self._kinetic(env)
        h = self.integrator.timestep / self.n_V[g]
        env.v = env.v + h * env.F[g] * self.inv_mass[:, None]
        if self.system.constraints.n_constraints > 0 and not skip_constrain:
            env.v = self._constrain_velocities(env.x, env.v)
        if integ.measure_shadow_work:
            env.shadow_work = env.shadow_work + (self._kinetic(env) - ke_old)

    def _emit_O(self, env: _Env, skip_constrain=False):
        integ = self.integrator
        if integ.measure_heat:
            ke_old = self._kinetic(env)
        env.key, sub = jax.random.split(env.key)
        sigma = jnp.sqrt(env.kT * self.inv_mass)[:, None]
        noise = jax.random.normal(sub, env.v.shape, dtype=env.v.dtype)
        env.v = self.ou_a * env.v + self.ou_b * sigma * noise
        if self.system.constraints.n_constraints > 0 and not skip_constrain:
            env.v = self._constrain_velocities(env.x, env.v)
        if integ.measure_heat:
            env.heat = env.heat + (self._kinetic(env) - ke_old)

    def _emit_block_start(self, env: _Env):
        e_old = self._total_potential(env) + self._kinetic(env)
        env.stash = (env.x, env.v, dict(env.U), dict(env.F), e_old,
                     env.protocol_work)

    def _emit_block_end(self, env: _Env):
        x0, v0, U0, F0, e_old, w0 = env.stash
        e_new = self._total_potential(env) + self._kinetic(env)
        # Metropolize on the block's SHADOW work (integrators.py:1550
        # 'exp(-(shadow_work)/kT)'), i.e. the energy change NOT accounted
        # for by H-step protocol work — raw dE would wrongly suppress
        # acceptance by the lambda-jump energy in NCMC splittings like the
        # default 'O { V R H R V } O' (no O inside a block, so no heat term)
        shadow = (e_new - e_old) - (env.protocol_work - w0)
        env.key, sub = jax.random.split(env.key)
        u = jax.random.uniform(sub, dtype=e_new.dtype)
        accept = u < jnp.exp(-shadow / env.kT)
        env.x = jnp.where(accept, env.x, x0)
        # momentum flip on rejection (GHMC; integrators.py:1556)
        env.v = jnp.where(accept, env.v, -v0)
        toks = self.tokens
        if "H" in toks[toks.index("{"):toks.index("}")]:
            # global params advanced inside the block: the stashed U/F were
            # computed at the OLD lambda and are stale at the reverted
            # positions — recompute at (selected x, current params)
            for g in self.groups:
                env.U[g] = None
                env.F[g] = None
            self._ensure_forces(env)
        else:
            for g in self.groups:
                env.U[g] = jnp.where(accept, env.U[g], U0[g])
                env.F[g] = jnp.where(accept, env.F[g], F0[g])
        env.n_accepted = env.n_accepted + accept.astype(jnp.int32)
        env.n_proposed = env.n_proposed + 1
        env.stash = None

    def _emit_H(self, env: _Env):
        raise IntegratorError(
            "H token requires a nonequilibrium integrator subclass")

    # -- program assembly ---------------------------------------------------
    def _pre_step(self, env: _Env):
        """Hook executed at the start of each step (neq reset logic)."""

    def _post_step(self, env: _Env):
        """Hook executed at the end of each step."""

    def _vproj_skip_eligible(self) -> bool:
        """True when the LAST substep's velocity projection is mathematically
        redundant inside a scanned run: RATTLE projection P is linear and
        idempotent in v (P depends on x only), so for adjacent velocity
        substeps at unchanged x, P(P(v + d1) + d2) == P(v + d1 + d2) — the
        next step's leading V/O projection at the same positions subsumes
        the trailing one. Requires: constraints present; the splitting both
        starts and ends with a projecting velocity substep (V/Vn/O); no
        Metropolis blocks ({} stashes projected velocities); no per-substep
        KE measurements at all — shadow work reads KE around every V and
        heat around every O, and the NEXT step's leading measurement would
        see the unprojected carry velocities (measured: ~15% shadow-work
        bias on a constrained diatom when only the skipped substep itself
        was guarded)."""
        toks = self.tokens
        if not toks or self.system.constraints.n_constraints == 0:
            return False
        if "{" in toks:
            return False
        if self.integrator.measure_shadow_work or self.integrator.measure_heat:
            return False

        def is_vel(t):
            return t == "O" or t == "V" or t.startswith("V")

        return is_vel(toks[0]) and is_vel(toks[-1])

    def _build_step(self, skip_trailing_vproj=False):
        skip_idx = len(self.tokens) - 1 if skip_trailing_vproj else -1

        def step(state: IntegratorState) -> IntegratorState:
            env = _Env()
            env.x = state.positions
            env.v = state.velocities
            env.key = state.rng_key
            env.kT = state.kT
            env.box = state.box
            env.params = state.global_params
            has_cache = len(state.forces) == len(self.groups)
            for i, g in enumerate(self.groups):
                env.F[g] = state.forces[i] if has_cache else None
                env.U[g] = state.potentials[i] if has_cache else None
            env.heat = state.heat
            env.shadow_work = state.shadow_work
            env.protocol_work = state.protocol_work
            env.n_accepted = state.n_accepted
            env.n_proposed = state.n_proposed
            env.lambda_ = state.lambda_
            env.lambda_step = state.lambda_step
            env.step_count = state.step_count
            if self.neighbor_mode and state.nbr_idx is not None:
                from openmmtools_tpu.ops.neighborlist import NeighborList

                env.nbr = NeighborList(idx=state.nbr_idx, mask=state.nbr_mask,
                                       overflow=state.nbr_overflow,
                                       r_list=self.neighbor_r_list)
            if self.sweep_mode and state.sweep_perm is not None:
                env.sweep = {"perm": state.sweep_perm,
                             "inv": state.sweep_inv,
                             "snap": state.sweep_snap,
                             "nblk": state.sweep_nblk,
                             "excl": state.sweep_excl}

            self._pre_step(env)
            for ti, tok in enumerate(self.tokens):
                if tok == "R":
                    self._emit_R(env)
                elif tok == "O":
                    self._emit_O(env, skip_constrain=(ti == skip_idx))
                elif tok == "V":
                    self._emit_V(env, None, skip_constrain=(ti == skip_idx))
                elif tok == "{":
                    self._emit_block_start(env)
                elif tok == "}":
                    self._emit_block_end(env)
                elif tok == "H":
                    self._emit_H(env)
                else:
                    self._emit_V(env, int(tok[1:]),
                                 skip_constrain=(ti == skip_idx))
            self._post_step(env)
            # leave caches valid for the next step
            self._ensure_forces(env)
            out = state.replace(
                positions=env.x, velocities=env.v, rng_key=env.key,
                kT=env.kT,
                global_params=env.params,
                forces=tuple(env.F[g] for g in self.groups),
                potentials=tuple(env.U[g] for g in self.groups),
                heat=env.heat, shadow_work=env.shadow_work,
                protocol_work=env.protocol_work,
                n_accepted=env.n_accepted, n_proposed=env.n_proposed,
                lambda_=env.lambda_, lambda_step=env.lambda_step,
                step_count=state.step_count + 1,
            )
            if env.sweep is not None:
                out = out.replace(sweep_snap=env.sweep["snap"],
                                  sweep_nblk=env.sweep["nblk"])
            return out

        return step

    # -- public API ---------------------------------------------------------
    @property
    def step_fn(self):
        return self._step_fn

    def initial_state(self, sampler_state: SamplerState, key,
                      temperature=None, thermodynamic_state: Optional[ThermodynamicState] = None,
                      global_params: Optional[Dict[str, Any]] = None) -> IntegratorState:
        """Build the integrator carry from a sampler state. Velocities are
        thermalized if absent. Forces/potentials are precomputed so the first
        V substep is exact."""
        if thermodynamic_state is not None:
            temperature = thermodynamic_state.temperature
            global_params = dict(thermodynamic_state.global_params)
        if temperature is None:
            temperature = self.integrator.temperature
        kT = jnp.asarray(kB) * temperature
        x = sampler_state.positions
        box = sampler_state.box_vectors
        if box is None:
            box = self.system.default_box
        # global params enter the scanned carry: cast to concrete arrays of
        # the position dtype so in-step updates (H steps) keep the carry type
        params = {k: jnp.asarray(v, dtype=x.dtype)
                  for k, v in (global_params or {}).items()}
        v = sampler_state.velocities
        if v is None:
            key, sub = jax.random.split(key)
            v = thermalize_velocities(self.masses, kT, sub, dtype=x.dtype)
        zero = jnp.zeros((), dtype=x.dtype)
        izero = jnp.zeros((), dtype=jnp.int32)
        nbr = None
        if self.neighbor_mode:
            nbr = self._build_nbr(x, box)
        sw = None
        if self.sweep_mode:
            from openmmtools_tpu.ops.sweep_nb import (
                build_exclusion_bitfield,
                sort_for_sweep,
            )

            k = self._sweep_kernel
            perm, inv = sort_for_sweep(x, box, k.n_pad)
            excl, max_sep = build_exclusion_bitfield(
                self._sweep_term.exception_index, inv, k.n_pad, k.mask_rows)
            sw = {"perm": perm, "inv": inv,
                  "snap": jnp.zeros_like(x),
                  "nblk": jnp.int32(-1), "excl": excl}
            sweep_overflow = max_sep > k.mask_shells
        forces, potentials = [], []
        for g in self.groups:
            if sw is not None and g == self._sweep_group:
                # jit: the eager per-op path costs minutes at DHFR scale
                fn = getattr(self, "_sweep_eval_jit", None)
                if fn is None:
                    self._sweep_eval_jit = fn = jax.jit(self._sweep_eval)
                u, f, sw = fn(x, box, params, sw)
            else:
                u, f = self._eval_group(g, x, box, params, nbr=nbr)
            potentials.append(u)
            forces.append(f)
        return IntegratorState(
            positions=x, velocities=v, rng_key=key,
            kT=jnp.asarray(kT, dtype=x.dtype), box=box,
            global_params=params,
            forces=tuple(forces), potentials=tuple(potentials),
            heat=zero, shadow_work=zero, protocol_work=zero,
            n_accepted=izero, n_proposed=izero,
            lambda_=zero, lambda_step=izero, step_count=izero,
            nbr_idx=None if nbr is None else nbr.idx,
            nbr_mask=None if nbr is None else nbr.mask,
            nbr_overflow=None if nbr is None else nbr.overflow,
            sweep_perm=None if sw is None else sw["perm"],
            sweep_inv=None if sw is None else sw["inv"],
            sweep_snap=None if sw is None else sw["snap"],
            sweep_nblk=None if sw is None else sw["nblk"],
            sweep_excl=None if sw is None else sw["excl"],
            sweep_overflow=None if sw is None else sweep_overflow,
        )

    def run_program(self, n_steps: int):
        """Pure function state -> state advancing n_steps, with periodic
        neighbor-list rebuilds folded in (the production MD loop shape:
        rebuild every ``neighbor_rebuild_interval`` steps, scan in between).
        Usable inside outer jit/vmap (e.g. multistate propagation)."""
        step = self._step_fn_fast

        def scan_steps(s, length):
            def body(carry, _):
                return step(carry), None

            out, _ = jax.lax.scan(body, s, None, length=length)
            return out

        def finish(s):
            # restore the (skipped) trailing velocity projection once for
            # the chunk's output state — exactly equivalent to projecting
            # inside every step (P linear/idempotent at fixed x)
            if self._vproj_skip and n_steps > 0:
                s = s.replace(velocities=self._constrain_velocities(
                    s.positions, s.velocities))
            return s

        if self.sweep_mode:
            interval = self.sweep_sort_interval
            n_chunks, remainder = divmod(n_steps, interval)

            def run_sweep(s):
                if n_chunks > 0:
                    def outer(carry, _):
                        carry = self._resort_sweep(carry)
                        return scan_steps(carry, interval), None

                    s, _ = jax.lax.scan(outer, s, None, length=n_chunks)
                if remainder:
                    s = self._resort_sweep(s)
                    s = scan_steps(s, remainder)
                return finish(s)

            return run_sweep

        if not self.neighbor_mode:
            return lambda s: finish(scan_steps(s, n_steps))

        interval = self.neighbor_rebuild_interval
        n_chunks, remainder = divmod(n_steps, interval)

        def run_fn(s):
            if n_chunks > 0:
                def outer(carry, _):
                    carry = self._rebuild_neighbors(carry)
                    return scan_steps(carry, interval), None

                s, _ = jax.lax.scan(outer, s, None, length=n_chunks)
            if remainder:
                s = self._rebuild_neighbors(s)
                s = scan_steps(s, remainder)
            return finish(s)

        return run_fn

    def run(self, state: IntegratorState, n_steps: int) -> IntegratorState:
        """Advance n_steps under one jitted program (with neighbor-list
        rebuild chunking when the neighbor path is active). Uses the fused
        Pallas cell-grid kernel when eligible (_fused_setup)."""
        if self._fused is not None:
            box = state.box if state.box is not None \
                else self.system.default_box
            x, v, f, u, key = self._fused.run(
                state.positions, state.velocities, box, state.kT,
                state.rng_key, n_steps)
            term = self._fused_term
            if term.use_dispersion_correction:
                from openmmtools_tpu.ops.nonbonded import (
                    dispersion_correction_energy,
                )

                u = u + dispersion_correction_energy(
                    box, term.sigma, term.epsilon, term.cutoff)
            return state.replace(
                positions=x, velocities=v, rng_key=key,
                forces=(f,), potentials=(u,),
                step_count=state.step_count + n_steps)
        fn = self._run_cache.get(n_steps)
        if fn is None:
            self._run_cache[n_steps] = fn = jax.jit(self.run_program(n_steps))
        state = fn(state)
        if (self.sweep_mode and state.sweep_overflow is not None
                and getattr(self.integrator, "check_sweep_overflow", True)):
            # one 4-byte D2H read per run() call; a set bit means an
            # exception pair fell outside the bitfield's shell coverage
            # and its full LJ/Coulomb interaction was evaluated at bonded
            # distance — silently wrong forces (ADVICE round-2 item 2).
            # Raise EVERY time the sticky bit is set: a caller that catches
            # the first error and keeps running must not get silent
            # corruption back
            if bool(state.sweep_overflow):
                raise IntegratorError(
                    "sweep kernel exclusion-bitfield overflow: an exception "
                    "pair's sorted separation exceeded mask_shells="
                    f"{self._sweep_kernel.mask_shells}; forces are wrong. "
                    "Increase mask_shells or disable sweep mode "
                    "(integrator.sweep=None).")
        return state

    def sampler_state_from(self, state: IntegratorState) -> SamplerState:
        return SamplerState(positions=state.positions,
                            velocities=state.velocities, box_vectors=state.box)

    def pretty_print(self) -> str:
        """Human-readable program listing (PrettyPrintableIntegrator analog,
        integrators.py:58)."""
        lines = [f"# splitting: {self.integrator.splitting}"]
        for tok in self.tokens:
            if tok == "R":
                lines.append(f"x += {self.h_R:.6g} * v   ; constrain positions")
            elif tok == "O":
                lines.append(
                    f"v = {self.ou_a:.6g} v + {self.ou_b:.6g} sqrt(kT/m) xi")
            elif tok.startswith("V"):
                g = tok[1:] or "all"
                lines.append(f"v += h * F[{g}]/m       ; constrain velocities")
            elif tok == "{":
                lines.append("begin Metropolize(save x, v, E)")
            elif tok == "}":
                lines.append("end Metropolize(accept/reject; flip v on reject)")
            elif tok == "H":
                lines.append("lambda step: perturb global params, "
                             "protocol_work += dU")
        return "\n".join(lines)


class LangevinIntegrator:
    """System-independent integrator spec; binds to a System on demand.

    Parameters mirror the reference LangevinIntegrator (integrators.py:1071):
    temperature (K), collision_rate (1/ps), timestep (ps), splitting,
    constraint_tolerance, measure_shadow_work, measure_heat.
    """

    _default_splitting = "V R O R V"

    def __init__(self, temperature=298.0, collision_rate=1.0, timestep=0.001,
                 splitting: Optional[str] = None, constraint_tolerance=1e-8,
                 measure_shadow_work=False, measure_heat=False,
                 neighborlist="auto", neighbor_skin=None,
                 neighbor_rebuild_interval=None, sweep="auto",
                 sweep_sort_interval=None, sweep_shell_block=None):
        self.temperature = temperature
        self.collision_rate = collision_rate
        self.timestep = timestep
        self.splitting = splitting or self._default_splitting
        self.constraint_tolerance = constraint_tolerance
        self.measure_shadow_work = measure_shadow_work
        self.measure_heat = measure_heat
        # neighbor-list policy: 'auto' enables the fixed-capacity list path
        # for large periodic cutoff systems; None forces the dense path
        self.neighborlist = neighborlist
        self.neighbor_skin = neighbor_skin
        self.neighbor_rebuild_interval = neighbor_rebuild_interval
        # bounded-sweep policy: 'auto' enables the Pallas sweep kernel on
        # TPU above ~8k atoms; 'force'/'interpret' enable unconditionally
        # (interpret = CPU interpreter, for tests); None disables
        self.sweep = sweep
        self.sweep_sort_interval = sweep_sort_interval
        self.sweep_shell_block = sweep_shell_block
        parse_splitting(self.splitting)  # fail fast
        self._bound: Dict[int, BoundIntegrator] = {}

    _bound_class = BoundIntegrator

    def bind(self, system: System) -> BoundIntegrator:
        # structural content hash, not id(): structurally identical systems
        # share one compiled program, and a GC'd/recreated system can never
        # alias a stale key (VERDICT round-2 weak item 10)
        key = system.fingerprint
        bound = self._bound.get(key)
        if bound is None:
            self._bound[key] = bound = self._bound_class(self, system)
        return bound

    # acceptance statistics for metropolized splittings (GHMC)
    @staticmethod
    def acceptance_rate(state: IntegratorState):
        return state.n_accepted / jnp.maximum(state.n_proposed, 1)


class BAOABIntegrator(LangevinIntegrator):
    """BAOAB: 'V R O R V' (integrators.py:2152)."""

    _default_splitting = "V R O R V"


class VVVRIntegrator(LangevinIntegrator):
    """VVVR: 'O V R V O' (integrators.py:2125)."""

    _default_splitting = "O V R V O"


class GeodesicBAOABIntegrator(LangevinIntegrator):
    """g-BAOAB with K_r position substeps: 'V R..R O R..R V'
    (integrators.py:2194)."""

    def __init__(self, K_r=2, temperature=298.0, collision_rate=1.0,
                 timestep=0.001, constraint_tolerance=1e-8,
                 measure_shadow_work=False, measure_heat=False):
        r = " ".join(["R"] * K_r)
        super().__init__(temperature=temperature, collision_rate=collision_rate,
                         timestep=timestep, splitting=f"V {r} O {r} V",
                         constraint_tolerance=constraint_tolerance,
                         measure_shadow_work=measure_shadow_work,
                         measure_heat=measure_heat)
        self.K_r = K_r


class GHMCIntegrator(LangevinIntegrator):
    """Generalized hybrid MC: 'O { V R V } O' (integrators.py:2242)."""

    _default_splitting = "O { V R V } O"


class VelocityVerletIntegrator(LangevinIntegrator):
    """Deterministic velocity Verlet: 'V R V' (integrators.py:456)."""

    _default_splitting = "V R V"

    def __init__(self, timestep=0.001, **kwargs):
        kwargs.setdefault("temperature", 298.0)
        kwargs.setdefault("collision_rate", 1.0)
        super().__init__(timestep=timestep, **kwargs)
