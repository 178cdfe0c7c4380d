"""MCMC move framework: moves, containers, samplers.

TPU-native redesign of ``/root/reference/openmmtools/mcmc.py`` (1920 LoC).
The reference contract ``MCMCMove.apply(thermodynamic_state, sampler_state,
context_cache)`` (mcmc.py:157) becomes a *pure* transition on pytrees —
``apply`` returns the new SamplerState instead of mutating, and device
"contexts" are replaced by cached bound integrators / jitted kernels. Move
objects remain stateful only for Python-side bookkeeping (RNG seed chain and
acceptance statistics), mirroring the reference's ``statistics`` dicts
(mcmc.py:872-970, 1323-1493).

Failure handling ports the reference policy (mcmc.py:706-776): on NaN the
move retries up to ``n_restart_attempts`` with fresh velocities/RNG, then
raises :class:`IntegratorMoveError` after dumping the failing state to
``nan-error-logs/`` (serialize_error analog, mcmc.py:538).
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.integrators.langevin import (
    BAOABIntegrator,
    BoundIntegrator,
    GHMCIntegrator,
    LangevinIntegrator,
)
from openmmtools_tpu.states import (
    CompoundThermodynamicState,
    SamplerState,
    ThermodynamicState,
)
from openmmtools_tpu.system import volume as box_volume

logger = logging.getLogger(__name__)


def _resolve(thermodynamic_state):
    """Accept plain or compound thermodynamic states."""
    if isinstance(thermodynamic_state, CompoundThermodynamicState):
        return thermodynamic_state.resolve()
    return thermodynamic_state


class MCMCMoveError(Exception):
    pass


class IntegratorMoveError(MCMCMoveError):
    """Raised when integration produced NaN despite restarts (mcmc.py:538).

    ``serialize_error`` writes positions/velocities and move metadata to a
    directory for post-mortem (reference writes OpenMM XML; we write npz+repr).
    """

    def __init__(self, message, move, sampler_state: SamplerState):
        super().__init__(message)
        self.move = move
        self.sampler_state = sampler_state

    def serialize_error(self, path_prefix: str):
        os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
        arrays = {"positions": np.asarray(self.sampler_state.positions)}
        if self.sampler_state.velocities is not None:
            arrays["velocities"] = np.asarray(self.sampler_state.velocities)
        if self.sampler_state.box_vectors is not None:
            arrays["box_vectors"] = np.asarray(self.sampler_state.box_vectors)
        np.savez(path_prefix + "-state.npz", **arrays)
        with open(path_prefix + "-move.txt", "w") as f:
            f.write(repr(self.move))


class MCMCMove:
    """Base move. Subclasses implement ``_apply(thermo, sampler_state, key)``
    returning the new sampler state (+ update their own statistics)."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def apply(self, thermodynamic_state, sampler_state: SamplerState,
              key=None, context_cache=None) -> SamplerState:
        """Apply the move. ``context_cache`` is accepted for reference API
        parity (mcmc.py:157); compiled-program reuse is automatic here, so
        it is unused."""
        if key is None:
            key = self._next_key()
        return self._apply(_resolve(thermodynamic_state), sampler_state, key)

    def _apply(self, thermodynamic_state, sampler_state, key):
        raise NotImplementedError

    @property
    def statistics(self) -> Dict[str, Any]:
        return {}

    @statistics.setter
    def statistics(self, value: Dict[str, Any]):
        pass

    def __repr__(self):
        return f"{type(self).__name__}()"


class SequenceMove(MCMCMove):
    """Apply a list of moves in order (mcmc.py:350)."""

    def __init__(self, move_list: Sequence[MCMCMove], seed: int = 0):
        super().__init__(seed)
        self.move_list = list(move_list)

    def _apply(self, thermodynamic_state, sampler_state, key):
        for move in self.move_list:
            sampler_state = move.apply(thermodynamic_state, sampler_state)
        return sampler_state

    @property
    def statistics(self):
        return [m.statistics for m in self.move_list]

    @statistics.setter
    def statistics(self, value):
        for m, s in zip(self.move_list, value):
            m.statistics = s

    def __repr__(self):
        return f"SequenceMove({self.move_list!r})"


class WeightedMove(MCMCMove):
    """Pick one move at random by weight each application (mcmc.py:439)."""

    def __init__(self, move_set: Sequence[Tuple[MCMCMove, float]], seed: int = 0):
        super().__init__(seed)
        self.move_set = list(move_set)

    def _apply(self, thermodynamic_state, sampler_state, key):
        weights = np.asarray([w for _, w in self.move_set], dtype=np.float64)
        weights /= weights.sum()
        idx = int(jax.random.choice(key, len(self.move_set),
                                    p=jnp.asarray(weights)))
        move = self.move_set[idx][0]
        return move.apply(thermodynamic_state, sampler_state)

    @property
    def statistics(self):
        return [m.statistics for m, _ in self.move_set]

    @statistics.setter
    def statistics(self, value):
        for (m, _), s in zip(self.move_set, value):
            m.statistics = s


# ---------------------------------------------------------------------------
# integrator moves
# ---------------------------------------------------------------------------


class BaseIntegratorMove(MCMCMove):
    """n_steps of dynamics as one MCMC move (mcmc.py:603-776 semantics).

    Parameters mirror the reference: n_steps, reassign_velocities (draw fresh
    Maxwell–Boltzmann velocities before integrating), n_restart_attempts.
    """

    def __init__(self, n_steps: int, reassign_velocities: bool = False,
                 n_restart_attempts: int = 4, seed: int = 0):
        super().__init__(seed)
        self.n_steps = n_steps
        self.reassign_velocities = reassign_velocities
        self.n_restart_attempts = n_restart_attempts

    def _get_integrator(self, thermodynamic_state) -> LangevinIntegrator:
        raise NotImplementedError

    def _bound(self, thermodynamic_state) -> BoundIntegrator:
        # per-system bind cache lives on the integrator object
        integ = self._get_integrator(thermodynamic_state)
        return integ.bind(thermodynamic_state.system)

    def _on_integration_end(self, final_state):
        """Hook to harvest statistics from the integrator state."""

    def _apply(self, thermodynamic_state, sampler_state, key):
        bound = self._bound(thermodynamic_state)
        for attempt in range(self.n_restart_attempts + 1):
            key, sub = jax.random.split(key)
            ss = sampler_state
            if self.reassign_velocities or attempt == self.n_restart_attempts:
                # last-chance restart reinitializes velocities (mcmc.py:746)
                ss = ss.replace(velocities=None)
            state = bound.initial_state(
                ss, sub, thermodynamic_state=thermodynamic_state)
            state = bound.run(state, self.n_steps)
            if state.nbr_overflow is not None and bool(state.nbr_overflow):
                raise MCMCMoveError(
                    "neighbor-list capacity exceeded during integration; "
                    "increase neighbor_skin/k_max or density changed "
                    "drastically")
            new_ss = bound.sampler_state_from(state)
            if not bool(new_ss.has_nan()):
                self._on_integration_end(state)
                return new_ss
            logger.warning(
                "NaN in %s (attempt %d/%d); restarting",
                type(self).__name__, attempt + 1, self.n_restart_attempts)
        err = IntegratorMoveError(
            f"NaN after {self.n_restart_attempts} restarts", self, sampler_state)
        err.serialize_error(os.path.join("nan-error-logs",
                                         type(self).__name__))
        raise err

    def __repr__(self):
        return (f"{type(self).__name__}(n_steps={self.n_steps}, "
                f"reassign_velocities={self.reassign_velocities})")


class IntegratorMove(BaseIntegratorMove):
    """Wrap an arbitrary integrator spec as a move (mcmc.py:977)."""

    def __init__(self, integrator: LangevinIntegrator, n_steps: int, **kwargs):
        super().__init__(n_steps, **kwargs)
        self.integrator = integrator

    def _get_integrator(self, thermodynamic_state):
        self.integrator.temperature = float(thermodynamic_state.temperature)
        return self.integrator


class LangevinDynamicsMove(BaseIntegratorMove):
    """BAOAB ('middle') Langevin dynamics (mcmc.py:1023 uses OpenMM's
    LangevinMiddleIntegrator, i.e. the V R O R V scheme)."""

    def __init__(self, timestep=0.001, collision_rate=10.0, n_steps=1000,
                 reassign_velocities=False, **kwargs):
        super().__init__(n_steps, reassign_velocities=reassign_velocities,
                         **kwargs)
        self.timestep = timestep
        self.collision_rate = collision_rate
        self._integrators: Dict[float, LangevinIntegrator] = {}

    splitting = "V R O R V"

    def _get_integrator(self, thermodynamic_state):
        t = float(thermodynamic_state.temperature)
        integ = self._integrators.get(t)
        if integ is None:
            self._integrators[t] = integ = LangevinIntegrator(
                temperature=t, collision_rate=self.collision_rate,
                timestep=self.timestep, splitting=self.splitting)
        return integ


class LangevinSplittingDynamicsMove(LangevinDynamicsMove):
    """Langevin dynamics with a custom splitting string (mcmc.py:1175)."""

    def __init__(self, timestep=0.001, collision_rate=10.0, n_steps=1000,
                 splitting="V R O R V", constraint_tolerance=1e-8,
                 measure_shadow_work=False, measure_heat=False, **kwargs):
        super().__init__(timestep=timestep, collision_rate=collision_rate,
                         n_steps=n_steps, **kwargs)
        self.splitting = splitting
        self.constraint_tolerance = constraint_tolerance
        self.measure_shadow_work = measure_shadow_work
        self.measure_heat = measure_heat

    def _get_integrator(self, thermodynamic_state):
        t = float(thermodynamic_state.temperature)
        integ = self._integrators.get(t)
        if integ is None:
            self._integrators[t] = integ = LangevinIntegrator(
                temperature=t, collision_rate=self.collision_rate,
                timestep=self.timestep, splitting=self.splitting,
                constraint_tolerance=self.constraint_tolerance,
                measure_shadow_work=self.measure_shadow_work,
                measure_heat=self.measure_heat)
        return integ


class _MetropolizedIntegratorMove(BaseIntegratorMove):
    """Shared statistics plumbing for GHMC/HMC moves (mcmc.py:1323,1493)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_accepted = 0
        self.n_proposed = 0

    def _on_integration_end(self, final_state):
        self.n_accepted += int(final_state.n_accepted)
        self.n_proposed += int(final_state.n_proposed)

    @property
    def fraction_accepted(self):
        if self.n_proposed == 0:
            return float("nan")
        return self.n_accepted / self.n_proposed

    @property
    def statistics(self):
        return {"n_accepted": self.n_accepted, "n_proposed": self.n_proposed}

    @statistics.setter
    def statistics(self, value):
        self.n_accepted = value["n_accepted"]
        self.n_proposed = value["n_proposed"]


class GHMCMove(_MetropolizedIntegratorMove):
    """Generalized hybrid Monte Carlo (mcmc.py:1323): 'O { V R V } O' with
    momentum flip on rejection; exact sampling at any timestep."""

    def __init__(self, timestep=0.001, collision_rate=20.0, n_steps=1000,
                 **kwargs):
        super().__init__(n_steps, **kwargs)
        self.timestep = timestep
        self.collision_rate = collision_rate
        self._integrators: Dict[float, GHMCIntegrator] = {}

    def _get_integrator(self, thermodynamic_state):
        t = float(thermodynamic_state.temperature)
        integ = self._integrators.get(t)
        if integ is None:
            self._integrators[t] = integ = GHMCIntegrator(
                temperature=t, collision_rate=self.collision_rate,
                timestep=self.timestep)
        return integ


class HMCMove(_MetropolizedIntegratorMove):
    """Hybrid Monte Carlo (mcmc.py:1493): fresh velocities each move, then
    ``n_inner_steps`` of velocity Verlet accepted/rejected as a block
    (HMCIntegrator analog, integrators.py:885)."""

    def __init__(self, timestep=0.001, n_inner_steps=10, n_steps=1,
                 **kwargs):
        kwargs.setdefault("reassign_velocities", True)
        super().__init__(n_steps, **kwargs)
        self.timestep = timestep
        self.n_inner_steps = n_inner_steps
        self._integrators: Dict[float, LangevinIntegrator] = {}

    def _get_integrator(self, thermodynamic_state):
        t = float(thermodynamic_state.temperature)
        integ = self._integrators.get(t)
        if integ is None:
            inner = " ".join(["V R V"] * self.n_inner_steps)
            self._integrators[t] = integ = LangevinIntegrator(
                temperature=t, collision_rate=1.0, timestep=self.timestep,
                splitting="{ " + inner + " }")
        return integ


# ---------------------------------------------------------------------------
# Metropolized configurational moves
# ---------------------------------------------------------------------------


class MetropolizedMove(MCMCMove):
    """Propose → evaluate reduced potential → accept/reject (mcmc.py:810).

    Subclasses implement ``_propose_positions(key, positions)`` on the
    selected atom subset. Proposal + energies + acceptance run as one jitted
    program per (system, subset-size) signature.
    """

    def __init__(self, atom_subset: Optional[Sequence[int]] = None, seed: int = 0):
        super().__init__(seed)
        self.atom_subset = atom_subset
        self.n_accepted = 0
        self.n_proposed = 0
        self._kernel_cache: Dict[Any, Any] = {}

    @property
    def statistics(self):
        return {"n_accepted": self.n_accepted, "n_proposed": self.n_proposed}

    @statistics.setter
    def statistics(self, value):
        self.n_accepted = value["n_accepted"]
        self.n_proposed = value["n_proposed"]

    def _propose_positions(self, key, sub_positions):
        raise NotImplementedError

    def _metropolis_kernel(self, ts, ss, key):
        """Pure propose→evaluate→accept transition (traceable): returns
        ``(new_sampler_state, accept)``. Shared between the host-driven
        ``apply`` path and the fused multistate move program
        (sampler._compile_segment)."""
        n = ss.positions.shape[0]
        subset = (jnp.arange(n, dtype=jnp.int32)
                  if self.atom_subset is None
                  else jnp.asarray(self.atom_subset, dtype=jnp.int32))
        u_old = ts.reduced_potential(ss)
        k1, k2 = jax.random.split(key)
        sub_x = ss.positions[subset]
        new_sub = self._propose_positions(k1, sub_x)
        x_new = ss.positions.at[subset].set(new_sub)
        ss_new = ss.replace(positions=x_new)
        u_new = ts.reduced_potential(ss_new)
        log_alpha = -(u_new - u_old)
        accept = jnp.log(jax.random.uniform(k2)) < log_alpha
        x_final = jnp.where(accept, x_new, ss.positions)
        return ss.replace(positions=x_final), accept

    def _apply(self, thermodynamic_state, sampler_state, key):
        cache_key = ("kernel",)
        fn = self._kernel_cache.get(cache_key)
        if fn is None:
            self._kernel_cache[cache_key] = fn = jax.jit(
                self._metropolis_kernel)
        new_ss, accept = fn(thermodynamic_state, sampler_state, key)
        self.n_proposed += 1
        self.n_accepted += int(accept)
        return new_ss


class MCDisplacementMove(MetropolizedMove):
    """Rigid Gaussian translation of the atom subset (mcmc.py:1704)."""

    def __init__(self, displacement_sigma=0.1, **kwargs):
        super().__init__(**kwargs)
        self.displacement_sigma = displacement_sigma

    def _propose_positions(self, key, sub_positions):
        disp = self.displacement_sigma * jax.random.normal(
            key, (3,), dtype=sub_positions.dtype)
        return sub_positions + disp


class MCRotationMove(MetropolizedMove):
    """Random rigid rotation of the subset about its centroid (mcmc.py:1777),
    uniform over SO(3) via random unit quaternion."""

    def _propose_positions(self, key, sub_positions):
        q = self._random_quaternion(key, sub_positions.dtype)
        R = self._quat_to_matrix(q)
        centroid = jnp.mean(sub_positions, axis=0, keepdims=True)
        # full f32 precision: TPU MXU's default bf16 passes would drift bond
        # lengths by ~1e-3 per rotation
        rotated = jnp.einsum("ij,kj->ki", R, sub_positions - centroid,
                             precision=jax.lax.Precision.HIGHEST)
        return rotated + centroid

    @staticmethod
    def _random_quaternion(key, dtype):
        u = jax.random.uniform(key, (3,), dtype=dtype)
        a = jnp.sqrt(1.0 - u[0])
        b = jnp.sqrt(u[0])
        return jnp.stack([
            a * jnp.sin(2 * jnp.pi * u[1]),
            a * jnp.cos(2 * jnp.pi * u[1]),
            b * jnp.sin(2 * jnp.pi * u[2]),
            b * jnp.cos(2 * jnp.pi * u[2]),
        ])

    @staticmethod
    def _quat_to_matrix(q):
        x, y, z, w = q[0], q[1], q[2], q[3]
        return jnp.asarray([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])


class MonteCarloBarostatMove(MetropolizedMove):
    """Isotropic volume-scaling Metropolis move for NPT sampling.

    The reference delegates this to OpenMM's MonteCarloBarostat triggered via
    a dummy integrator (mcmc.py:1597); here it is a native move:
    propose V' = V + dV, scale *molecule centroids* (particles move rigidly
    with their molecule, so constraints and bond lengths are preserved —
    OpenMM MonteCarloBarostatImpl semantics) and the box; accept with
    exp(-[beta dU + beta p dV - N_molecules ln(V'/V)]).

    Molecules are the connected components of the bond + constraint +
    virtual-site graph, computed once per system on the host. For a
    monatomic fluid every particle is its own molecule and this reduces
    to per-particle scaling.
    """

    def __init__(self, volume_scale=0.01, n_attempts=1, **kwargs):
        super().__init__(**kwargs)
        self.volume_scale = volume_scale
        # reference default is 5 attempts per apply (mcmc.py:1645); the
        # attempts run as one scanned device program here
        self.n_attempts = int(n_attempts)
        self._kernels = {}  # per-system: molecule ids are baked in
        self._molecules_cache = {}

    @staticmethod
    def _molecule_ids(system):
        """Connected components of the bonded graph -> (ids (N,), count)."""
        import numpy as np
        from openmmtools_tpu.system import HarmonicBondTerm

        n = system.n_particles
        parent = np.arange(n)

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb

        for _, term in system.find_terms(HarmonicBondTerm):
            for i, j in np.asarray(term.index):
                union(int(i), int(j))
        if system.constraints.n_constraints > 0:
            for i, j in np.asarray(system.constraints.index):
                union(int(i), int(j))
        vs = system.virtual_sites
        if vs is not None and vs.n_sites > 0:
            sites = np.asarray(vs.site)
            parents_arr = np.asarray(vs.parents)
            for s, ps in zip(sites, parents_arr):
                for p in ps:
                    union(int(s), int(p))
        roots = np.array([find(i) for i in range(n)])
        _, ids = np.unique(roots, return_inverse=True)
        return jnp.asarray(ids, jnp.int32), int(ids.max()) + 1 if n else 0

    def _molecules_for(self, system):
        """Cached molecule decomposition. Content-hash key: id() could alias
        a stale decomposition after GC (ADVICE round-2 item 3)."""
        cache_key = system.fingerprint
        if cache_key not in self._molecules_cache:
            self._molecules_cache[cache_key] = self._molecule_ids(system)
        return self._molecules_cache[cache_key]

    def _attempt_kernel(self, ts, ss, key, mol_ids, n_molecules):
        """One pure volume-scaling Metropolis attempt (traceable): returns
        ``(new_sampler_state, accept)``. Shared between the host-driven
        ``apply`` path and the fused multistate move program."""
        from openmmtools_tpu.constants import BAR_TO_KJ_PER_MOL_NM3

        k1, k2 = jax.random.split(key)
        box = ss.box_vectors
        v_old = box_volume(box)
        u_old = ts.potential_energy(ss)
        # Symmetric proposal in ln V: V' = V exp(s(2u-1)). OpenMM proposes
        # dV uniformly with a FIXED (host-adapted) width; the naive traced
        # analog — width proportional to the *current* volume — is an
        # asymmetric proposal (Hastings ratio V/V') whose missing
        # correction biases <V> low by O(1/N) (measured ~5% at N=32 on the
        # NPT ideal gas). The log-space walk is symmetric in ln V, needs no
        # step-size adaptation inside a fused program, and is exactly
        # unbiased with the (N_mol + 1) ln(V'/V) Jacobian below.
        eps = self.volume_scale * (
            2.0 * jax.random.uniform(k1, dtype=v_old.dtype) - 1.0)
        v_new = v_old * jnp.exp(eps)
        scale = jnp.exp(eps / 3.0)
        box_new = box * scale
        x = ss.positions
        # rigid molecule translation: x += (scale - 1) * centroid[mol]
        counts = jax.ops.segment_sum(
            jnp.ones((x.shape[0],), x.dtype), mol_ids,
            num_segments=n_molecules)
        centers = jax.ops.segment_sum(
            x, mol_ids, num_segments=n_molecules) / counts[:, None]
        x_new = x + (scale - 1.0) * centers[mol_ids]
        ss_new = ss.replace(positions=x_new, box_vectors=box_new)
        u_new = ts.potential_energy(ss_new)
        beta = ts.beta
        p = ts.pressure * BAR_TO_KJ_PER_MOL_NM3
        # molecule-COM scaling Jacobian V^N_mol (OpenMM's N_mol ln(V'/V))
        # plus the ln-V proposal measure's extra ln(V'/V)
        log_alpha = (-(beta * (u_new - u_old) + beta * p * (v_new - v_old))
                     + (n_molecules + 1) * eps)
        accept = jnp.log(jax.random.uniform(k2, dtype=v_old.dtype)) < log_alpha
        return jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), ss_new, ss), accept

    def _scan_attempts(self, ts, ss, key, mol_ids, n_molecules):
        """n_attempts sequential volume moves under one scan: returns
        ``(new_sampler_state, n_accepted)``."""
        def body(carry_ss, k):
            return self._attempt_kernel(ts, carry_ss, k, mol_ids,
                                        n_molecules)

        keys = jax.random.split(key, self.n_attempts)
        final_ss, accepts = jax.lax.scan(body, ss, keys)
        return final_ss, jnp.sum(accepts)

    def _apply(self, thermodynamic_state, sampler_state, key):
        ts = thermodynamic_state
        if ts.pressure is None:
            raise MCMCMoveError("MonteCarloBarostatMove requires an NPT state")
        mol_ids, n_molecules = self._molecules_for(ts.system)

        def n_attempt_kernel(ts, ss, key):
            return self._scan_attempts(ts, ss, key, mol_ids, n_molecules)

        kernel_key = (ts.system.fingerprint, self.n_attempts)
        if kernel_key not in self._kernels:
            self._kernels[kernel_key] = jax.jit(n_attempt_kernel)
        new_ss, n_acc = self._kernels[kernel_key](ts, sampler_state, key)
        self.n_proposed += self.n_attempts
        self.n_accepted += int(n_acc)
        return new_ss


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------


class MCMCSampler:
    """Single-chain MCMC driver (mcmc.py:216): holds the current states and
    applies its move repeatedly."""

    def __init__(self, thermodynamic_state, sampler_state: SamplerState,
                 move: MCMCMove):
        self.thermodynamic_state = thermodynamic_state
        self.sampler_state = sampler_state
        self.move = move

    def run(self, n_iterations: int = 1):
        for _ in range(n_iterations):
            self.sampler_state = self.move.apply(
                self.thermodynamic_state, self.sampler_state)

    def minimize(self, tolerance=1.0, max_iterations=500):
        from openmmtools_tpu.integrators.minimize import minimize

        self.sampler_state = minimize(
            _resolve(self.thermodynamic_state), self.sampler_state,
            tolerance=tolerance, max_iterations=max_iterations)
