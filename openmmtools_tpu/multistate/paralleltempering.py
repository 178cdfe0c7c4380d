"""Parallel tempering: temperature-ladder replica exchange with the O(N)
energy-matrix optimization.

TPU-native port of ``multistate/paralleltempering.py`` (260 LoC): one
reference thermodynamic state at K temperatures; since states differ only in
beta, the K-state energy sweep computes U(x_n) (+ pV) once per replica and
rescales by each beta_k (paralleltempering.py:175-238) — here a single
vmapped potential evaluation and an outer product.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.constants import BAR_TO_KJ_PER_MOL_NM3, kB
from openmmtools_tpu.multistate.replicaexchange import ReplicaExchangeSampler
from openmmtools_tpu.states import SamplerState, ThermodynamicState
from openmmtools_tpu.system import make_energy_fn, volume as box_volume


class ParallelTemperingSampler(ReplicaExchangeSampler):
    """Replica exchange over a temperature ladder (paralleltempering.py:44)."""

    def create(self, thermodynamic_state, sampler_states, storage=None,
               temperatures: Optional[Sequence[float]] = None,
               min_temperature: Optional[float] = None,
               max_temperature: Optional[float] = None,
               n_temperatures: Optional[int] = None, **kwargs):
        """Create from ONE reference state + a temperature specification
        (paralleltempering.py:109): explicit ``temperatures``, or a
        logarithmic ladder between min/max over n_temperatures
        (exponential spacing, the reference's choice)."""
        if isinstance(thermodynamic_state, (list, tuple)):
            raise ValueError(
                "ParallelTemperingSampler.create takes a single reference "
                "thermodynamic state (paralleltempering.py:109)")
        if temperatures is not None:
            temps = [float(t) for t in temperatures]
        elif None not in (min_temperature, max_temperature, n_temperatures):
            tmin, tmax = float(min_temperature), float(max_temperature)
            temps = list(tmin + (tmax - tmin) *
                         (np.exp(np.linspace(0, 1, n_temperatures)) - 1.0)
                         / (np.e - 1.0))
        else:
            raise ValueError("give either temperatures or "
                             "min/max_temperature + n_temperatures")
        states = [thermodynamic_state.replace(temperature=jnp.asarray(t))
                  for t in temps]
        super().create(states, sampler_states, storage=storage, **kwargs)

    def _build_iteration_fn(self):
        """Same pipeline as the base class but with the O(N) energy path."""
        moves = self._moves_per_state()
        stacked = self._stacked_sampled
        system = self._thermodynamic_states[0].system
        homogeneous = all(self._moves_equal(m, moves[0])
                          for m in moves[1:])

        def _bind(m):
            integ = m._get_integrator(self._thermodynamic_states[0])
            return integ.bind(system), m.n_steps, m.reassign_velocities

        u_fn = make_energy_fn(system)
        # beta-rescale over sampled + same-system unsampled columns (the
        # stacked states); different-system endpoint states are appended
        # via their own bound reduced_potential below
        stacked_all = self._stacked_states
        betas = 1.0 / (kB * stacked_all.temperature)  # (K [+ n_uns],)
        pressure = stacked_all.pressure  # or None (same p across ladder)
        unsampled_separate = self._unsampled_separate
        separate_u = self._separate_unsampled_u

        def _make_propagate(bound, n_steps, reassign):
            def prop(x, v, box, key, temperature, params):
                ss = SamplerState(positions=x,
                                  velocities=None if reassign else v,
                                  box_vectors=box)
                state = bound.initial_state(ss, key, temperature=temperature,
                                            global_params=params)
                state = bound.run_program(n_steps)(state)
                return state.positions, state.velocities
            return prop

        if homogeneous:
            prop0 = _make_propagate(*_bind(moves[0]))

            def propagate_one(x, v, box, key, s):
                temperature = stacked.temperature[s]
                params = {k: v_[s]
                          for k, v_ in stacked.global_params.items()}
                return prop0(x, v, box, key, temperature, params)
        else:
            # heterogeneous per-state moves: same lax.switch dispatch as
            # the base class (previously this override silently propagated
            # every state with moves[0])
            branches = [_make_propagate(*_bind(m)) for m in moves]

            def propagate_one(x, v, box, key, s):
                temperature = stacked.temperature[s]
                params = {k: v_[s]
                          for k, v_ in stacked.global_params.items()}
                return jax.lax.switch(
                    s, [lambda op, p=p: p(*op) for p in branches],
                    (x, v, box, key, temperature, params))

        def energies_one(x, box, s):
            # U(x) once; u_k = beta_k (U + p_k V)  (paralleltempering.py:175)
            params = {k: v_[s] for k, v_ in stacked.global_params.items()}
            u_pot = u_fn(x, box, params)
            if pressure is not None:
                pv = pressure * BAR_TO_KJ_PER_MOL_NM3 * box_volume(box)
                u = betas * (u_pot + pv)
            else:
                u = betas * u_pot
            if unsampled_separate:
                u = jnp.concatenate([u, separate_u(x, box)])
            return u

        mix_kernel = self._mix_kernel

        def iteration_fn(carry, mix_params):
            # counter-based keys (see MultiStateCarry): must match the base
            # sampler's derivation so PT resumes are bitwise-continuous too
            base_key = jax.random.fold_in(carry.rng_key, carry.iteration)
            mix_key, prop_key = jax.random.split(base_key)
            states = carry.replica_states
            n_acc, n_prop = carry.n_accepted, carry.n_proposed
            if mix_kernel is not None:
                states, n_acc, n_prop = mix_kernel(
                    mix_key, states, carry.energies, n_acc, n_prop,
                    mix_params)
            n = carry.positions.shape[0]
            keys = jax.random.split(prop_key, n)
            box_axis = None if carry.boxes is None else 0
            xs, vs = jax.vmap(propagate_one, in_axes=(0, 0, box_axis, 0, 0))(
                carry.positions, carry.velocities, carry.boxes, keys, states)
            u = jax.vmap(energies_one, in_axes=(0, box_axis, 0))(
                xs, carry.boxes, states)
            return carry.replace(
                positions=xs, velocities=vs, replica_states=states,
                energies=u, n_accepted=n_acc, n_proposed=n_prop,
                iteration=carry.iteration + 1)

        self._iteration_program = iteration_fn  # raw, for batched scans
        if self._sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(self._sharding.rng_key.mesh, P())
            mix_shardings = jax.tree.map(lambda _: replicated,
                                         self._mix_params())
            return jax.jit(iteration_fn,
                           in_shardings=(self._sharding, mix_shardings),
                           out_shardings=self._sharding)
        return jax.jit(iteration_fn)


from openmmtools_tpu.multistate.analyzer import (  # noqa: E402,F401
    ParallelTemperingAnalyzer,
)
