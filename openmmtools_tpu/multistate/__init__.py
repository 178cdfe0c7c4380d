"""Multistate samplers: replica exchange, SAMS, parallel tempering + analysis.

TPU-native redesign of ``/root/reference/openmmtools/multistate/`` (~6700
LoC). The MPI rank-0 star (mpiplus) becomes a device mesh with a ``replica``
axis: propagation is replica-sharded, the N×K reduced-potential matrix is one
vmapped program, and Gibbs swap mixing runs on-device from the gathered
matrix (SURVEY.md §5.8).
"""

from openmmtools_tpu.multistate.mbar import mbar_free_energies, MBARResult
from openmmtools_tpu.multistate.utils import (
    statistical_inefficiency,
    detect_equilibration,
    subsample_correlated_data,
    SimulationNaNError,
)
from openmmtools_tpu.multistate.sampler import MultiStateSampler
from openmmtools_tpu.multistate.replicaexchange import ReplicaExchangeSampler
from openmmtools_tpu.multistate.sams import SAMSSampler
from openmmtools_tpu.multistate.paralleltempering import ParallelTemperingSampler
from openmmtools_tpu.multistate.reporter import MultiStateReporter
from openmmtools_tpu.multistate.analyzer import (
    MultiStateSamplerAnalyzer,
    ReplicaExchangeAnalyzer,
    SAMSAnalyzer,
    ParallelTemperingAnalyzer,
)

__all__ = [
    "mbar_free_energies", "MBARResult",
    "statistical_inefficiency", "detect_equilibration",
    "subsample_correlated_data", "SimulationNaNError",
    "MultiStateSampler", "ReplicaExchangeSampler", "SAMSSampler",
    "ParallelTemperingSampler", "MultiStateReporter",
    "MultiStateSamplerAnalyzer", "ReplicaExchangeAnalyzer", "SAMSAnalyzer",
    "ParallelTemperingAnalyzer",
]
