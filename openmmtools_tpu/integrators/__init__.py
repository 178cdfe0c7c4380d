"""Integrators: Langevin operator-splitting DSL compiled to jitted steps.

TPU-native redesign of ``/root/reference/openmmtools/integrators.py``: the
same splitting-string language (R/V/O/{}/Vn tokens, reference
integrators.py:1015-1557), but instead of emitting OpenMM CustomIntegrator
bytecode interpreted on-device by Lepton, each splitting compiles at trace
time into a fused JAX step function executed under ``jit`` +
``lax.scan(n_steps)`` (SURVEY.md §7 design table).
"""

from openmmtools_tpu.integrators.langevin import (  # noqa: F401
    IntegratorState,
    LangevinIntegrator,
    BoundIntegrator,
    parse_splitting,
    BAOABIntegrator,
    GeodesicBAOABIntegrator,
    VVVRIntegrator,
    GHMCIntegrator,
    VelocityVerletIntegrator,
    thermalize_velocities,
)
from openmmtools_tpu.integrators.nonequilibrium import (  # noqa: F401
    NonequilibriumLangevinIntegrator,
    AlchemicalNonequilibriumLangevinIntegrator,
    ExternalPerturbationLangevinIntegrator,
    PeriodicNonequilibriumIntegrator,
)
from openmmtools_tpu.integrators.minimize import (  # noqa: F401
    FIREMinimizationIntegrator,
    GradientDescentMinimizationIntegrator,
    fire_minimize,
    gradient_descent_minimize,
    minimize,
)
from openmmtools_tpu.integrators.extras import (  # noqa: F401
    AndersenVelocityVerletIntegrator,
    DummyIntegrator,
    HMCIntegrator,
    MetropolisMonteCarloIntegrator,
    MTSIntegrator,
    NoseHooverChainVelocityVerletIntegrator,
)
