"""Energy minimizers: FIRE and gradient descent, as jitted loops.

TPU-native replacement for (a) OpenMM's ``LocalEnergyMinimizer`` (L-BFGS)
used by ``MCMCSampler.minimize`` (mcmc.py:305) and the multistate samplers'
``_minimize_replica`` (multistatesampler.py:1351), and (b) the reference's
``FIREMinimizationIntegrator`` (integrators.py:2290) and
``GradientDescentMinimizationIntegrator`` (:388).

The multistate sampler mirrors the reference's policy: FIRE first, fall back
if non-finite (multistatesampler.py:1414-1420; there FIRE→L-BFGS).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from openmmtools_tpu.states import SamplerState, ThermodynamicState
from openmmtools_tpu.system import System, make_energy_fn


def fire_minimize(system: System, x, box=None, params=None, *,
                  timestep=1e-3, max_steps=500, alpha0=0.1, f_inc=1.1,
                  f_dec=0.5, alpha_shrink=0.99, n_min=5, dt_max_factor=10.0):
    """FIRE (Fast Inertial Relaxation Engine) minimization.

    Same scheme/defaults as the reference FIREMinimizationIntegrator
    (integrators.py:2290): velocity mixing v = (1-a) v + a |v| F/|F|,
    accelerate dt after n_min consecutive downhill steps, halve dt and zero
    velocities on uphill steps.
    Returns (x_min, U_min).
    """
    u_fn = make_energy_fn(system)
    vg = jax.value_and_grad(u_fn)
    masses = jnp.maximum(system.masses, 1e-30)[:, None]
    dt_max = dt_max_factor * timestep

    def body(carry, _):
        x, v, dt, alpha, n_up, _u = carry
        u, g = vg(x, box, params)
        f = -g
        power = jnp.sum(f * v)
        f_norm = jnp.sqrt(jnp.sum(f * f) + 1e-30)
        v_norm = jnp.sqrt(jnp.sum(v * v))
        v_mixed = (1.0 - alpha) * v + alpha * v_norm * f / f_norm
        uphill = power < 0.0
        v_new = jnp.where(uphill, jnp.zeros_like(v), v_mixed)
        n_up_new = jnp.where(uphill, 0, n_up + 1)
        grow = (~uphill) & (n_up_new > n_min)
        dt_new = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max),
                           jnp.where(uphill, dt * f_dec, dt))
        alpha_new = jnp.where(grow, alpha * alpha_shrink,
                              jnp.where(uphill, alpha0, alpha))
        # MD step (velocity Verlet style kick-drift)
        v_next = v_new + dt_new * f / masses
        x_next = x + dt_new * v_next
        # guard against NaN blowups: keep previous iterate if energy explodes
        finite = jnp.all(jnp.isfinite(x_next))
        x_next = jnp.where(finite, x_next, x)
        v_next = jnp.where(finite, v_next, jnp.zeros_like(v))
        return (x_next, v_next, dt_new, alpha_new, n_up_new, u), None

    v0 = jnp.zeros_like(x)
    init = (x, v0, jnp.asarray(timestep, x.dtype), jnp.asarray(alpha0, x.dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((), x.dtype))
    (x_min, _, _, _, _, _), _ = jax.lax.scan(body, init, None, length=max_steps)
    return x_min, u_fn(x_min, box, params)


def gradient_descent_minimize(system: System, x, box=None, params=None, *,
                              initial_step=1e-4, max_steps=200):
    """Adaptive-step gradient descent (GradientDescentMinimizationIntegrator,
    integrators.py:388): step x -= gamma F/|F|max, accept if energy drops,
    else halve gamma."""
    u_fn = make_energy_fn(system)
    vg = jax.value_and_grad(u_fn)

    def body(carry, _):
        x, gamma, u = carry
        _, g = vg(x, box, params)
        gmax = jnp.maximum(jnp.max(jnp.abs(g)), 1e-12)
        x_try = x - gamma * g / gmax
        u_try = u_fn(x_try, box, params)
        better = u_try < u
        x_new = jnp.where(better, x_try, x)
        u_new = jnp.where(better, u_try, u)
        gamma_new = jnp.where(better, gamma * 1.2, gamma * 0.5)
        return (x_new, gamma_new, u_new), None

    u0 = u_fn(x, box, params)
    (x_min, _, u_min), _ = jax.lax.scan(
        body, (x, jnp.asarray(initial_step, x.dtype), u0), None, length=max_steps)
    return x_min, u_min


def lbfgs_minimize(system: System, x, box=None, params=None, *,
                   max_steps=200, history=10, tolerance=10.0,
                   max_backtracks=25):
    """L-BFGS with two-loop recursion and Armijo backtracking, fully under
    jit with bounded loops.

    The analog of OpenMM's ``LocalEnergyMinimizer`` (L-BFGS), which the
    reference uses as the fallback when FIRE produces NaN
    (multistatesampler.py:1414-1420). ``tolerance`` is the RMS force
    (kJ/mol/nm) below which iterations become no-ops (static shapes: the
    scan always runs max_steps, converged steps carry through unchanged).
    Returns (x_min, U_min).
    """
    u_fn = make_energy_fn(system)
    vg = jax.value_and_grad(u_fn)
    m = int(history)
    shape = x.shape
    n = x.size
    dtype = x.dtype

    def flat_vg(xf):
        u, g = vg(xf.reshape(shape), box, params)
        return u, g.reshape(-1)

    def body(carry, _):
        xf, g, u, S, Y, rho, valid = carry
        # two-loop recursion: rows are oldest..newest
        q = g
        alphas = [None] * m
        for i in reversed(range(m)):
            a = jnp.where(valid[i], rho[i] * jnp.dot(S[i], q), 0.0)
            q = q - a * Y[i]
            alphas[i] = a
        sy = jnp.dot(S[m - 1], Y[m - 1])
        yy = jnp.dot(Y[m - 1], Y[m - 1])
        gamma = jnp.where(valid[m - 1], sy / jnp.maximum(yy, 1e-30), 1.0)
        r = gamma * q
        for i in range(m):
            b = jnp.where(valid[i], rho[i] * jnp.dot(Y[i], r), 0.0)
            r = r + S[i] * (alphas[i] - b)
        d = -r  # descent direction

        g_dot_d = jnp.dot(g, d)
        # safeguard: if not a descent direction, fall back to -g
        bad = g_dot_d >= 0.0
        d = jnp.where(bad, -g, d)
        g_dot_d = jnp.where(bad, -jnp.dot(g, g), g_dot_d)
        # trust region: cap the largest per-atom displacement at 0.05 nm
        # per iteration so bare-charge singularities (zero-vdW hydrogens)
        # aren't reachable in one jump; mirrors the local character of
        # OpenMM's LocalEnergyMinimizer steps
        max_disp = jnp.max(jnp.sqrt(jnp.sum(
            d.reshape(shape) ** 2, axis=-1)))
        cap = jnp.minimum(1.0, 0.05 / jnp.maximum(max_disp, 1e-12))
        d = d * cap
        g_dot_d = g_dot_d * cap

        # Armijo backtracking, bounded
        def ls_cond(state):
            t, u_try, it = state
            return (u_try > u + 1e-4 * t * g_dot_d) & (it < max_backtracks)

        def ls_body(state):
            t, _, it = state
            t = t * 0.5
            u_try = u_fn((xf + t * d).reshape(shape), box, params)
            return t, u_try, it + 1

        t0 = jnp.asarray(1.0, dtype)
        u_try0 = u_fn((xf + t0 * d).reshape(shape), box, params)
        t, u_try, _ = jax.lax.while_loop(ls_cond, ls_body, (t0, u_try0,
                                                            jnp.int32(0)))
        accept = jnp.isfinite(u_try) & (u_try <= u)
        x_new = jnp.where(accept, xf + t * d, xf)
        u_new2, g_new = flat_vg(x_new)
        u_new = jnp.where(accept, u_try, u)

        s_vec = x_new - xf
        y_vec = g_new - g
        sy_new = jnp.dot(s_vec, y_vec)
        ok = accept & (sy_new > 1e-10)
        S2 = jnp.where(ok, jnp.roll(S, -1, axis=0).at[m - 1].set(s_vec), S)
        Y2 = jnp.where(ok, jnp.roll(Y, -1, axis=0).at[m - 1].set(y_vec), Y)
        rho2 = jnp.where(
            ok, jnp.roll(rho, -1).at[m - 1].set(1.0 / jnp.maximum(sy_new,
                                                                  1e-30)),
            rho)
        valid2 = jnp.where(ok, jnp.roll(valid, -1).at[m - 1].set(True), valid)

        return (x_new, g_new, u_new, S2, Y2, rho2, valid2), None

    u0, g0 = flat_vg(x.reshape(-1))
    S0 = jnp.zeros((m, n), dtype)
    Y0 = jnp.zeros((m, n), dtype)
    rho0 = jnp.zeros((m,), dtype)
    valid0 = jnp.zeros((m,), bool)
    (xf, _, u_min, *_), _ = jax.lax.scan(
        body, (x.reshape(-1), g0, u0, S0, Y0, rho0, valid0), None,
        length=max_steps)
    return xf.reshape(shape), u_min


def minimize(thermodynamic_state: ThermodynamicState,
             sampler_state: SamplerState, tolerance: float = 1.0,
             max_iterations: int = 500) -> SamplerState:
    """Minimize a sampler state under a thermodynamic state — the
    ``MCMCSampler.minimize``/LocalEnergyMinimizer analog (mcmc.py:305).

    FIRE with a gradient-descent fallback on non-finite results
    (multistatesampler.py:1414-1420 policy). ``tolerance`` is accepted for
    API parity; the loop runs a fixed (bounded) number of steps under jit.
    """
    system = thermodynamic_state.system
    box = sampler_state.box_vectors
    if box is None:
        box = system.default_box
    params = thermodynamic_state.global_params
    x0 = sampler_state.positions

    x_min, u_min = jax.jit(
        lambda x: fire_minimize(system, x, box, params,
                                max_steps=max_iterations))(x0)
    if not bool(jnp.isfinite(u_min)):
        # reference fallback chain: FIRE -> L-BFGS
        # (multistatesampler.py:1414-1420)
        x_min, u_min = jax.jit(
            lambda x: lbfgs_minimize(system, x, box, params,
                                     max_steps=max_iterations))(x0)
    if not bool(jnp.isfinite(u_min)):
        x_min, u_min = jax.jit(
            lambda x: gradient_descent_minimize(system, x, box, params,
                                                max_steps=max_iterations))(x0)
    # re-project onto constraints if present — BEFORE the acceptance check:
    # on constrained systems (rigid water) the unconstrained minimum can lie
    # far off the constraint manifold, and the projection can raise the
    # energy back above the input
    if system.constraints.n_constraints > 0:
        from openmmtools_tpu.ops.constraints import shake_positions

        x_min = shake_positions(x_min, x_min, system.constraints, system.masses)
        u_min = make_energy_fn(system)(x_min, box, params)
    # never return something worse than the input (final, post-projection)
    u0 = thermodynamic_state.potential_energy(sampler_state)
    if bool(u_min > u0) or not bool(jnp.isfinite(u_min)):
        return sampler_state
    return sampler_state.replace(positions=x_min)


class FIREMinimizationIntegrator:
    """Name-parity wrapper for the FIRE minimizer
    (FIREMinimizationIntegrator, integrators.py:2290): exposes
    ``minimize(system, x, ...)`` via the functional implementation."""

    def __init__(self, timestep=1e-3, alpha=0.1, n_min=5, **kwargs):
        self.timestep = timestep
        self.alpha = alpha
        self.n_min = n_min

    def minimize(self, system, x, box=None, params=None, max_steps=500):
        return fire_minimize(system, x, box, params,
                             timestep=self.timestep, alpha0=self.alpha,
                             n_min=self.n_min, max_steps=max_steps)


class GradientDescentMinimizationIntegrator:
    """Name-parity wrapper (integrators.py:388)."""

    def __init__(self, initial_step_size=1e-4):
        self.initial_step_size = initial_step_size

    def minimize(self, system, x, box=None, params=None, max_steps=200):
        return gradient_descent_minimize(
            system, x, box, params, initial_step=self.initial_step_size,
            max_steps=max_steps)
