"""Distribution layer: device meshes and replica sharding.

TPU-native replacement for the reference's mpiplus/MPI distribution
(SURVEY.md §5.8): instead of `mpiplus.distribute(fn, jobs, send_results_to=0)`
over MPI ranks, replicas live on a `jax.sharding.Mesh` axis and the
per-iteration program runs SPMD — XLA inserts the all-gather that plays the
role of the reference's rank-0 star.
"""

from openmmtools_tpu.parallel.mesh import (
    replica_mesh,
    replica_sharding,
    replicated_sharding,
    distribute,
    on_single_device,
)

__all__ = ["replica_mesh", "replica_sharding", "replicated_sharding",
           "distribute", "on_single_device"]
