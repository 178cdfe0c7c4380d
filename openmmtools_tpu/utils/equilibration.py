"""Gentle staged equilibration protocol.

Port of ``run_gentle_equilibration`` (reference utils/equilibration.py:12):
a sequence of stages, each {EquilibrationStage}: minimize or run dynamics at
a temperature (optionally NPT) with positional restraints of a given
strength on selected atoms, stepping the restraints down stage by stage.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from openmmtools_tpu.forces import restrain_atoms
from openmmtools_tpu.integrators import BAOABIntegrator, minimize
from openmmtools_tpu.mcmc import MonteCarloBarostatMove
from openmmtools_tpu.states import SamplerState, ThermodynamicState

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class EquilibrationStage:
    """One stage of the protocol (mirrors the reference's stage dicts)."""

    stage_type: str = "npt"            # 'minimize' | 'nvt' | 'npt'
    temperature: float = 300.0          # K
    pressure: Optional[float] = None    # bar (npt only)
    n_steps: int = 1000
    timestep: float = 0.001             # ps
    collision_rate: float = 10.0        # 1/ps
    restraint_sigma: Optional[float] = None   # nm; None = no restraints
    restrained_atoms: Sequence[int] = ()


def run_gentle_equilibration(thermodynamic_state: ThermodynamicState,
                             sampler_state: SamplerState,
                             stages: Sequence[EquilibrationStage],
                             seed: int = 0) -> SamplerState:
    """Run the staged protocol and return the final sampler state."""
    key = jax.random.PRNGKey(seed)
    for i, stage in enumerate(stages):
        system = thermodynamic_state.system
        if stage.restraint_sigma is not None and len(stage.restrained_atoms):
            system = restrain_atoms(system, sampler_state.positions,
                                    stage.restrained_atoms,
                                    sigma=stage.restraint_sigma)
        state = ThermodynamicState(
            system=system, temperature=jnp.asarray(stage.temperature),
            pressure=(None if stage.pressure is None
                      else jnp.asarray(stage.pressure)),
            global_params=thermodynamic_state.global_params)

        if stage.stage_type == "minimize":
            sampler_state = minimize(state, sampler_state,
                                     max_iterations=stage.n_steps)
            logger.info("stage %d: minimized", i)
            continue

        integ = BAOABIntegrator(temperature=stage.temperature,
                                collision_rate=stage.collision_rate,
                                timestep=stage.timestep)
        bound = integ.bind(system)
        key, sub = jax.random.split(key)
        istate = bound.initial_state(sampler_state, sub,
                                     temperature=stage.temperature,
                                     global_params=state.global_params)
        istate = bound.run(istate, stage.n_steps)
        sampler_state = bound.sampler_state_from(istate)

        if stage.stage_type == "npt":
            if stage.pressure is None:
                raise ValueError("npt stage requires a pressure")
            barostat = MonteCarloBarostatMove(seed=seed + i)
            for _ in range(max(1, stage.n_steps // 25)):
                sampler_state = barostat.apply(state, sampler_state)
        logger.info("stage %d (%s): done", i, stage.stage_type)
    return sampler_state
