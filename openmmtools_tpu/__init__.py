"""openmmtools_tpu — a TPU-native enhanced-sampling framework.

From-scratch rebuild of the capabilities of choderalab/openmmtools
(reference at /root/reference) on JAX/XLA/Pallas: states are pytrees, forces
are pure functions, integrators are fused jitted step programs, and the
multistate layer shards replicas over a device mesh. See SURVEY.md for the
structural map this build follows.
"""

__version__ = "0.1.0"

from openmmtools_tpu import constants  # noqa: F401
from openmmtools_tpu.system import (  # noqa: F401
    System,
    Constraints,
    no_constraints,
    make_energy_fn,
    make_force_fn,
    kinetic_energy,
    volume,
)
from openmmtools_tpu.states import (  # noqa: F401
    ThermodynamicState,
    SamplerState,
    CompoundThermodynamicState,
    GlobalParameterState,
    GlobalParameterFunction,
    create_thermodynamic_state_protocol,
    reduced_potential_at_states,
    reduced_potential_matrix,
    stack_thermodynamic_states,
    stack_sampler_states,
    is_state_compatible,
    group_by_compatibility,
)
