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

import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.constants import BAR_TO_KJ_PER_MOL_NM3, kB
from openmmtools_tpu.multistate.replicaexchange import ReplicaExchangeSampler
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

    def _build_energies_fn(self):
        """O(N) energy path: U(x) once per replica; u_k = beta_k (U + p_k V)
        (paralleltempering.py:175). Plugs into the base class's fused
        iteration program (propagation/mixing/stats are shared)."""
        system = self._thermodynamic_states[0].system
        stacked = self._stacked_sampled
        u_fn = make_energy_fn(system)
        # beta-rescale over sampled + same-system unsampled columns (the
        # stacked states); different-system endpoint states are appended
        # via their own bound reduced_potential below
        stacked_all = self._stacked_states
        betas = 1.0 / (kB * stacked_all.temperature)  # (K [+ n_uns],)
        pressure = stacked_all.pressure  # or None (same p across ladder)
        unsampled_separate = self._unsampled_separate
        separate_u = self._separate_unsampled_u

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

        return energies_one


from openmmtools_tpu.multistate.analyzer import (  # noqa: E402,F401
    ParallelTemperingAnalyzer,
)
