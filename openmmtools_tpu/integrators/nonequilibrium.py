"""Nonequilibrium (NCMC) Langevin integrators: protocol work + H steps.

Reference: ``NonequilibriumLangevinIntegrator`` (integrators.py:1559),
``AlchemicalNonequilibriumLangevinIntegrator`` (:1654) whose ``H`` substep
advances the master ``lambda`` = lambda_step/n_lambda_steps, evaluates each
alchemical function of lambda into its global parameter, and accumulates
``protocol_work += U_new - U_old`` (:1845-1867); per-cycle reset via
step/lambda counters (:1869-1912); ``PeriodicNonequilibriumIntegrator``
(:1914) drives lambda 0→1→0 with equilibration dwells;
``ExternalPerturbationLangevinIntegrator`` (:2058) measures work from
externally-changed parameters — here the explicit
:meth:`BoundNonequilibriumIntegrator.perturb` transition.

Lambda functions are math-expression strings of ``lambda`` evaluated by
:func:`openmmtools_tpu.utils.math_eval` on *traced* values, so the whole
protocol (H steps included) stays inside one jitted ``lax.scan``.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from openmmtools_tpu.integrators.langevin import (
    BoundIntegrator,
    IntegratorError,
    IntegratorState,
    LangevinIntegrator,
)
from openmmtools_tpu.utils.math_eval import math_eval


class BoundNonequilibriumIntegrator(BoundIntegrator):
    """BoundIntegrator with H-step support and per-cycle work/lambda reset."""

    def _lambda_schedule(self, lambda_step):
        return self.integrator._schedule(lambda_step, max(1, self.n_H))

    def _pre_step(self, env):
        cycle = self.integrator._n_steps_per_cycle()
        if cycle <= 0:
            return
        # reset work/lambda at the start of each cycle (integrators.py:1869)
        reset = (env.step_count % cycle) == 0
        zero = jnp.zeros((), dtype=env.x.dtype)
        env.protocol_work = jnp.where(reset, zero, env.protocol_work)
        env.shadow_work = jnp.where(reset, zero, env.shadow_work)
        env.heat = jnp.where(reset, zero, env.heat)
        env.lambda_step = jnp.where(reset, 0, env.lambda_step)
        env.lambda_ = self._lambda_schedule(env.lambda_step).astype(env.x.dtype)
        # The reference reset also re-evaluates every alchemical function at
        # lambda0 (_add_alchemical_reset_step, integrators.py:1905-1911) —
        # without it, a wrap-around protocol starts from the lambda=1
        # parameter values and its first H charges no work. Trace-time
        # guard: schedules that end where they start (Periodic's 0->1->0)
        # need no param snap-back, and pay no extra force evaluation.
        funcs = self.integrator.alchemical_functions
        if not funcs:
            return
        n_H = max(1, self.n_H)
        with jax.ensure_compile_time_eval():
            lam0 = float(self.integrator._schedule(0, n_H))
            lam_end = float(self.integrator._schedule(cycle * n_H, n_H))
        if lam_end == lam0:
            return
        new_params = dict(env.params)
        for name, expr in funcs.items():
            v0 = jnp.asarray(math_eval(expr, {"lambda": lam0}),
                             dtype=env.x.dtype)
            new_params[name] = jnp.where(reset, v0, env.params[name])
        env.params = new_params
        # params (conditionally) changed: carried force caches are stale
        for g in self.groups:
            env.U[g] = None
            env.F[g] = None

    def _emit_H(self, env):
        functions = self.integrator.alchemical_functions
        u_old = self._total_potential(env)
        env.lambda_step = env.lambda_step + 1
        lam = self._lambda_schedule(env.lambda_step).astype(env.x.dtype)
        new_params = dict(env.params)
        for name, expr in functions.items():
            new_params[name] = jnp.asarray(math_eval(expr, {"lambda": lam}),
                                           dtype=env.x.dtype)
        env.params = new_params
        for g in self.groups:
            env.U[g] = None
            env.F[g] = None
        u_new = self._total_potential(env)
        env.protocol_work = env.protocol_work + (u_new - u_old)
        env.lambda_ = lam.astype(env.x.dtype)

    # -- external perturbation work (ExternalPerturbationLangevinIntegrator)
    def perturb(self, state: IntegratorState, new_params: Dict) -> IntegratorState:
        """Change global parameters between steps, charging the energy
        difference to protocol_work (integrators.py:2058 semantics)."""
        # Recompute u_old HERE instead of trusting the step program's cached
        # potentials: the same f32 energy function rounds differently inside
        # the scanned step program vs in this out-of-jit call (XLA
        # fusion/FMA order, ~1e-5 relative), so differencing cached-vs-fresh
        # would leak that cross-program noise into the work. Evaluating both
        # sides in the same program makes the lambda-independent bulk cancel
        # exactly (reference integrators.py:2103 evaluates both in-context).
        u_old = jnp.zeros((), state.positions.dtype)
        for g in self.groups:
            u, _ = self._eval_group(g, state.positions, state.box,
                                    state.global_params)
            u_old = u_old + u
        forces, potentials = [], []
        for g in self.groups:
            u, f = self._eval_group(g, state.positions, state.box, new_params)
            potentials.append(u)
            forces.append(f)
        u_new = sum(potentials[1:], potentials[0])
        return state.replace(
            global_params=dict(new_params),
            forces=tuple(forces), potentials=tuple(potentials),
            protocol_work=state.protocol_work + (u_new - u_old),
        )


class NonequilibriumLangevinIntegrator(LangevinIntegrator):
    """Langevin integrator tracking protocol work (integrators.py:1559).

    Work accumulates through explicit :meth:`perturb` calls (external
    protocols) or through H substeps (alchemical subclasses).
    """

    _bound_class = BoundNonequilibriumIntegrator
    alchemical_functions: Dict[str, str] = {}

    def _schedule(self, lambda_step, n_H: int):
        return jnp.asarray(lambda_step, dtype=jnp.float32) * 0.0

    def _n_steps_per_cycle(self) -> int:
        return 0


# ExternalPerturbationLangevinIntegrator is behaviorally the same object:
# NonequilibriumLangevinIntegrator + bound.perturb().
ExternalPerturbationLangevinIntegrator = NonequilibriumLangevinIntegrator


class AlchemicalNonequilibriumLangevinIntegrator(NonequilibriumLangevinIntegrator):
    """NCMC switching integrator (integrators.py:1654).

    Parameters
    ----------
    alchemical_functions : dict str -> str
        Global parameter name -> expression of ``lambda``
        (e.g. ``{'lambda_sterics': 'min(1, 2*lambda)'}``).
    splitting : default 'O { V R H R V } O' (reference default :1753)
    n_steps_neq : integrator steps per switching protocol;
        n_lambda_steps = n_steps_neq * (H count per step).
    """

    _default_splitting = "O { V R H R V } O"

    def __init__(self, alchemical_functions: Optional[Dict[str, str]] = None,
                 splitting: Optional[str] = None, n_steps_neq=100, **kwargs):
        super().__init__(splitting=splitting, **kwargs)
        self.alchemical_functions = dict(alchemical_functions or {})
        if n_steps_neq < 0:
            raise IntegratorError("n_steps_neq must be >= 0")
        # n_steps_neq == 0: instantaneous switching — one integrator step
        # completes the whole protocol (integrators.py:1776-1782,1833)
        self.n_steps_neq = n_steps_neq
        if "H" not in self.splitting.upper().split():
            raise IntegratorError("alchemical splitting must contain an H step")

    def _schedule(self, lambda_step, n_H: int):
        # instantaneous switching: n_lambda_steps = n_H (integrators.py:1833)
        n = max(1, self.n_steps_neq) * max(1, n_H)
        return jnp.clip(jnp.asarray(lambda_step, jnp.float32) / n, 0.0, 1.0)

    def _n_steps_per_cycle(self) -> int:
        return max(1, self.n_steps_neq)

    def initial_params(self):
        """Global parameter values at lambda = 0."""
        return {name: float(math_eval(expr, {"lambda": 0.0}))
                for name, expr in self.alchemical_functions.items()}


class PeriodicNonequilibriumIntegrator(AlchemicalNonequilibriumLangevinIntegrator):
    """Periodic 0→1→0 protocol with equilibration dwells (integrators.py:1914).

    Cycle: n_steps_eq at lambda=0 → n_steps_neq ramp up → n_steps_eq at
    lambda=1 → n_steps_neq ramp down. Schedule in H-substep units:
    lambda(s) = clip((s-Neq)/Nneq, 0, 1) - clip((s-2Neq-Nneq)/Nneq, 0, 1).
    """

    def __init__(self, alchemical_functions=None, splitting=None,
                 n_steps_eq=1000, n_steps_neq=100, **kwargs):
        super().__init__(alchemical_functions=alchemical_functions,
                         splitting=splitting, n_steps_neq=n_steps_neq, **kwargs)
        self.n_steps_eq = n_steps_eq

    def _schedule(self, lambda_step, n_H: int):
        n_eq = self.n_steps_eq * n_H
        n_neq = max(1, self.n_steps_neq * n_H)
        s = jnp.asarray(lambda_step, jnp.float32)
        up = jnp.clip((s - n_eq) / n_neq, 0.0, 1.0)
        down = jnp.clip((s - (2 * n_eq + n_neq)) / n_neq, 0.0, 1.0)
        return up - down

    def _n_steps_per_cycle(self) -> int:
        return 2 * self.n_steps_eq + 2 * self.n_steps_neq
