"""Additional integrators outside the Langevin splitting DSL.

Ports of the reference's standalone CustomIntegrator programs:

* :class:`NoseHooverChainVelocityVerletIntegrator` (integrators.py:569) —
  deterministic NVT via a Nosé–Hoover chain with Yoshida–Suzuki suzuki-yoshida
  multi-timestepping of the bath, exposing bath kinetic/potential energy.
* :class:`AndersenVelocityVerletIntegrator` (integrators.py:501) — velocity
  Verlet + Andersen collisions (per-particle velocity redraws at rate nu).
* :class:`MetropolisMonteCarloIntegrator` (integrators.py:799) — gaussian
  displacement Metropolis "dynamics" with acceptance statistics.

All reuse the BoundIntegrator/IntegratorState machinery: each "integrator"
compiles to a pure step function scanned under jit.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from openmmtools_tpu.constants import kB
from openmmtools_tpu.integrators.langevin import (
    BoundIntegrator,
    IntegratorState,
    LangevinIntegrator,
    thermalize_velocities,
)

_YS_WEIGHTS = {
    1: (1.0,),
    3: (0.828981543588751, -0.657963087177502, 0.828981543588751),
    5: (0.2967324292201065, 0.2967324292201065, -0.186929716880426,
        0.2967324292201065, 0.2967324292201065),
}


class _BoundNoseHoover(BoundIntegrator):
    """Nose-Hoover chain around velocity Verlet.

    Chain state is carried in ``global_params`` under reserved keys
    ('_nhc_xi_i', '_nhc_vxi_i'), keeping IntegratorState's structure."""

    def _chain_params(self):
        integ = self.integrator
        return (integ.chain_length, integ.collision_frequency,
                integ.n_ys, integ.n_mts)

    def initial_state(self, sampler_state, key, **kwargs):
        state = super().initial_state(sampler_state, key, **kwargs)
        m, _, _, _ = self._chain_params()
        params = dict(state.global_params)
        dtype = state.positions.dtype
        for i in range(m):
            params[f"_nhc_xi_{i}"] = jnp.zeros((), dtype=dtype)
            params[f"_nhc_vxi_{i}"] = jnp.zeros((), dtype=dtype)
        return state.replace(global_params=params)

    def _build_step(self):
        m_chain, freq, n_ys, n_mts = (
            self.integrator.chain_length, self.integrator.collision_frequency,
            self.integrator.n_ys, self.integrator.n_mts)
        ys = _YS_WEIGHTS[n_ys]
        dt = self.integrator.timestep
        inv_mass = self.inv_mass
        masses = self.masses
        n_mobile = float(jnp.sum(masses > 0))
        ndf = 3.0 * n_mobile - self.system.constraints.n_constraints

        def nhc_propagate(v, xi, vxi, kT):
            """Half-step Nose–Hoover chain propagation (Martyna–Tuckerman–
            Klein suzuki-yoshida scheme). Returns (velocity scale, xi, vxi)."""
            # thermostat masses Q_0 = Ndf kT / freq^2, Q_j = kT / freq^2
            q = [ndf * kT / freq**2] + [kT / freq**2] * (m_chain - 1)
            ke2 = jnp.sum(masses[:, None] * v * v)  # 2*KE
            scale = jnp.ones((), dtype=v.dtype)
            xi = list(xi)
            vxi = list(vxi)

            def g_of(j, ke2_now):
                if j == 0:
                    return (ke2_now - ndf * kT) / q[0]
                return (q[j - 1] * vxi[j - 1] ** 2 - kT) / q[j]

            for _ in range(n_mts):
                for w in ys:
                    wdt = w * dt / n_mts
                    # downward sweep: tail -> head
                    vxi[m_chain - 1] = (vxi[m_chain - 1]
                                        + 0.25 * wdt
                                        * g_of(m_chain - 1, ke2 * scale**2))
                    for j in range(m_chain - 2, -1, -1):
                        ef = jnp.exp(-0.125 * wdt * vxi[j + 1])
                        vxi[j] = (vxi[j] * ef
                                  + 0.25 * wdt * g_of(j, ke2 * scale**2)) * ef
                    # scale particle velocities
                    ds = jnp.exp(-0.5 * wdt * vxi[0])
                    scale = scale * ds
                    for j in range(m_chain):
                        xi[j] = xi[j] + 0.5 * wdt * vxi[j]
                    # upward sweep: head -> tail with updated KE
                    for j in range(m_chain - 1):
                        ef = jnp.exp(-0.125 * wdt * vxi[j + 1])
                        vxi[j] = (vxi[j] * ef
                                  + 0.25 * wdt * g_of(j, ke2 * scale**2)) * ef
                    vxi[m_chain - 1] = (vxi[m_chain - 1]
                                        + 0.25 * wdt
                                        * g_of(m_chain - 1, ke2 * scale**2))
            return scale, xi, vxi

        def step(state: IntegratorState) -> IntegratorState:
            params = dict(state.global_params)
            xi = [params[f"_nhc_xi_{i}"] for i in range(m_chain)]
            vxi = [params[f"_nhc_vxi_{i}"] for i in range(m_chain)]
            kT = state.kT
            x, v = state.positions, state.velocities
            f = state.forces[0]
            u_pot = state.potentials[0]

            scale, xi, vxi = nhc_propagate(v, xi, vxi, kT)
            v = v * scale
            # velocity Verlet
            v = v + 0.5 * dt * f * inv_mass[:, None]
            x = x + dt * v
            u_pot, grad = self._vg_fns[None](x, state.box, params)
            f = -grad
            v = v + 0.5 * dt * f * inv_mass[:, None]
            scale, xi, vxi = nhc_propagate(v, xi, vxi, kT)
            v = v * scale

            for i in range(m_chain):
                params[f"_nhc_xi_{i}"] = xi[i]
                params[f"_nhc_vxi_{i}"] = vxi[i]
            return state.replace(positions=x, velocities=v, forces=(f,),
                                 potentials=(u_pot,), global_params=params,
                                 step_count=state.step_count + 1)

        return step

    def bath_energy(self, state: IntegratorState):
        """Bath KE + PE (reference exposes these as globals)."""
        m_chain = self.integrator.chain_length
        freq = self.integrator.collision_frequency
        kT = state.kT
        masses = self.masses
        n_mobile = float(jnp.sum(masses > 0))
        ndf = 3.0 * n_mobile - self.system.constraints.n_constraints
        q = [ndf * kT / freq**2] + [kT / freq**2] * (m_chain - 1)
        ke = sum(0.5 * q[i] * state.global_params[f"_nhc_vxi_{i}"] ** 2
                 for i in range(m_chain))
        pe = (ndf * kT * state.global_params["_nhc_xi_0"]
              + kT * sum(state.global_params[f"_nhc_xi_{i}"]
                         for i in range(1, m_chain)))
        return ke, pe


class NoseHooverChainVelocityVerletIntegrator(LangevinIntegrator):
    """Deterministic NVT integrator (integrators.py:569).

    Parameters: temperature, collision_frequency (1/ps; thermostat
    frequency), chain_length, n_ys (Yoshida-Suzuki order in {1,3,5}),
    n_mts (bath multi-timestep subdivisions).
    """

    _bound_class = _BoundNoseHoover
    _default_splitting = "V R V"  # parsed for bookkeeping only

    def __init__(self, temperature=298.0, collision_frequency=50.0,
                 timestep=0.001, chain_length=5, n_ys=5, n_mts=5, **kwargs):
        if n_ys not in _YS_WEIGHTS:
            raise ValueError("n_ys must be 1, 3, or 5")
        super().__init__(temperature=temperature, collision_rate=1.0,
                         timestep=timestep, splitting="V R V", **kwargs)
        self.collision_frequency = collision_frequency
        self.chain_length = chain_length
        self.n_ys = n_ys
        self.n_mts = n_mts


class _BoundAndersen(BoundIntegrator):
    def _build_step(self):
        dt = self.integrator.timestep
        nu = self.integrator.collision_rate
        inv_mass = self.inv_mass
        masses = self.masses
        p_collide = 1.0 - math.exp(-nu * dt)

        def step(state: IntegratorState) -> IntegratorState:
            x, v = state.positions, state.velocities
            f = state.forces[0]
            key, k1, k2 = jax.random.split(state.rng_key, 3)
            v = v + 0.5 * dt * f * inv_mass[:, None]
            x = x + dt * v
            u_pot, grad = self._vg_fns[None](x, state.box,
                                             state.global_params)
            f = -grad
            v = v + 0.5 * dt * f * inv_mass[:, None]
            # Andersen collisions: full velocity redraw per selected particle
            fresh = thermalize_velocities(masses, state.kT, k1, dtype=v.dtype)
            collide = jax.random.uniform(k2, (v.shape[0], 1),
                                         dtype=v.dtype) < p_collide
            v = jnp.where(collide, fresh, v)
            return state.replace(positions=x, velocities=v, rng_key=key,
                                 forces=(f,), potentials=(u_pot,),
                                 step_count=state.step_count + 1)

        return step


class AndersenVelocityVerletIntegrator(LangevinIntegrator):
    """Velocity Verlet + Andersen thermostat (integrators.py:501)."""

    _bound_class = _BoundAndersen
    _default_splitting = "V R V"

    def __init__(self, temperature=298.0, collision_rate=91.0,
                 timestep=0.001, **kwargs):
        super().__init__(temperature=temperature,
                         collision_rate=collision_rate, timestep=timestep,
                         splitting="V R V", **kwargs)


class _BoundMetropolisMC(BoundIntegrator):
    def _build_step(self):
        sigma = self.integrator.displacement_sigma

        def step(state: IntegratorState) -> IntegratorState:
            x = state.positions
            u_old = state.potentials[0]
            key, k1, k2 = jax.random.split(state.rng_key, 3)
            x_new = x + sigma * jax.random.normal(k1, x.shape, dtype=x.dtype)
            u_new, grad = self._vg_fns[None](x_new, state.box,
                                             state.global_params)
            accept = (jnp.log(jax.random.uniform(k2, dtype=u_new.dtype))
                      < -(u_new - u_old) / state.kT)
            x = jnp.where(accept, x_new, x)
            u = jnp.where(accept, u_new, u_old)
            f = jnp.where(accept, -grad, state.forces[0])
            return state.replace(
                positions=x, rng_key=key, forces=(f,), potentials=(u,),
                n_accepted=state.n_accepted + accept.astype(jnp.int32),
                n_proposed=state.n_proposed + 1,
                step_count=state.step_count + 1)

        return step


class MetropolisMonteCarloIntegrator(LangevinIntegrator):
    """Gaussian-displacement Metropolis 'integrator' (integrators.py:799).

    ``displacement_sigma`` in nm; acceptance statistics in
    state.n_accepted / n_proposed."""

    _bound_class = _BoundMetropolisMC
    _default_splitting = "R"

    def __init__(self, temperature=298.0, displacement_sigma=0.01,
                 timestep=0.001, **kwargs):
        super().__init__(temperature=temperature, collision_rate=1.0,
                         timestep=timestep, splitting="R", **kwargs)
        self.displacement_sigma = displacement_sigma


class _BoundHMC(BoundIntegrator):
    def _build_step(self):
        n_inner = self.integrator.nsteps
        dt = self.integrator.timestep
        inv_mass = self.inv_mass
        masses = self.masses
        has_constraints = self.system.constraints.n_constraints > 0

        def step(state: IntegratorState) -> IntegratorState:
            key, kv, ka = jax.random.split(state.rng_key, 3)
            v = thermalize_velocities(masses, state.kT, kv,
                                      dtype=state.positions.dtype)
            if has_constraints:
                v = self._constrain_velocities(state.positions, v)
            x0, u0, f0 = state.positions, state.potentials[0], state.forces[0]
            ke0 = 0.5 * jnp.sum(masses[:, None] * v * v)

            def vv(_, carry):
                x, v, u, f = carry
                v = v + 0.5 * dt * f * inv_mass[:, None]
                x_new = x + dt * v
                if has_constraints:
                    x_proj = self._constrain_positions(x_new, x)
                    v = v + (x_proj - x_new) / dt
                    x_new = x_proj
                u, grad = self._vg_fns[None](x_new, state.box,
                                             state.global_params)
                f = -grad
                v = v + 0.5 * dt * f * inv_mass[:, None]
                if has_constraints:
                    v = self._constrain_velocities(x_new, v)
                return x_new, v, u, f

            x, v, u, f = jax.lax.fori_loop(0, n_inner, vv, (x0, v, u0, f0))
            ke1 = 0.5 * jnp.sum(masses[:, None] * v * v)
            log_p = -((u + ke1) - (u0 + ke0)) / state.kT
            accept = jnp.log(jax.random.uniform(ka, dtype=u.dtype)) < log_p
            return state.replace(
                positions=jnp.where(accept, x, x0),
                velocities=jnp.where(accept, v, -v),
                rng_key=key,
                forces=(jnp.where(accept, f, f0),),
                potentials=(jnp.where(accept, u, u0),),
                n_accepted=state.n_accepted + accept.astype(jnp.int32),
                n_proposed=state.n_proposed + 1,
                step_count=state.step_count + 1)

        return step


class HMCIntegrator(LangevinIntegrator):
    """Hybrid Monte Carlo (integrators.py:885): each step draws fresh
    Maxwell-Boltzmann velocities, runs ``nsteps`` of velocity Verlet, and
    Metropolis-accepts on the total-energy change. Acceptance statistics
    live in state.n_accepted / n_proposed."""

    _bound_class = _BoundHMC
    _default_splitting = "V R V"

    def __init__(self, temperature=298.0, nsteps=10, timestep=0.001,
                 **kwargs):
        super().__init__(temperature=temperature, collision_rate=1.0,
                         timestep=timestep, splitting="V R V", **kwargs)
        self.nsteps = nsteps


class MTSIntegrator(LangevinIntegrator):
    """r-RESPA multiple-timestep integrator (respa.py:39, re-exported at
    integrators.py:321).

    ``groups``: list of (force_group, n_substeps) pairs, slowest first, e.g.
    [(1, 1), (0, 4)] evaluates group 0 four times per group-1 evaluation.
    Expressed through the splitting DSL by nesting Vn R Vn patterns.
    """

    def __init__(self, timestep=0.002, groups=((0, 1),), temperature=298.0,
                 **kwargs):
        groups = sorted(groups, key=lambda kv: kv[1])

        def build(levels):
            (grp, n_sub), rest = levels[0], levels[1:]
            if rest:
                inner = build(rest)
            else:
                inner = "R"
            unit = f"V{grp} " + inner + f" V{grp}"
            return " ".join([unit] * n_sub)

        # substep counts are relative: normalize so outermost runs once
        relative = [(g, 1) for g, _ in groups[:1]] + [
            (g, max(1, groups[i][1] // max(1, groups[i - 1][1])))
            for i, (g, _) in enumerate(groups) if i > 0]
        splitting = build(relative)
        super().__init__(temperature=temperature, timestep=timestep,
                         splitting=splitting, **kwargs)
        self.groups = groups


class _BoundDummy(BoundIntegrator):
    def _build_step(self):
        def step(state: IntegratorState) -> IntegratorState:
            return state.replace(step_count=state.step_count + 1)
        return step


class DummyIntegrator(LangevinIntegrator):
    """No-op integrator (integrators.py:361) — used by moves that only need
    a context-like binding (e.g. the reference's barostat move)."""

    _bound_class = _BoundDummy
    _default_splitting = "R"

    def __init__(self, **kwargs):
        kwargs.setdefault("temperature", 298.0)
        kwargs.setdefault("timestep", 0.001)
        kwargs.setdefault("collision_rate", 1.0)
        kwargs.setdefault("splitting", "R")
        super().__init__(**kwargs)
