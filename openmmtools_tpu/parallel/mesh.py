"""Mesh construction and the mpiplus-primitive analogs.

The reference's distribution primitives (SURVEY.md §5.8) map as:

* ``mpiplus.distribute(task, jobs, send_results_to=0)``
  (multistatesampler.py:1296)  ->  :func:`distribute`: vmap/shard_map the
  task over a replica-sharded batch axis; results are sharded arrays (the
  "gather to rank 0" is XLA's job when a consumer needs them replicated).
* ``@mpiplus.on_single_node(0, broadcast_result=True)``
  (replicaexchange.py:255)  ->  :func:`on_single_device`: run a host-side
  function once on fully-gathered arrays (device_get), results broadcast by
  re-device_put — used only for host-side analysis; mixing itself runs
  on-device inside the iteration program.
* ``mpiplus.delayed_termination``  ->  unnecessary: there are no processes
  to protect; host Python is single-threaded and device programs are atomic.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replica_mesh(n_devices: Optional[int] = None,
                 devices: Optional[Sequence] = None,
                 axis_name: str = "replica") -> Mesh:
    """1D mesh over available devices with a 'replica' axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replica_sharding(mesh: Mesh, axis_name: str = "replica") -> NamedSharding:
    """Shard the leading (replica) axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distribute(task: Callable, batched_args, mesh: Optional[Mesh] = None,
               axis_name: str = "replica"):
    """Apply ``task`` to every replica of a batched pytree.

    The vmapped program is jitted with replica-sharded inputs when a mesh is
    given, so each device computes its own replicas (the mpiplus.distribute
    analog); without a mesh it is a plain vmap.
    """
    fn = jax.vmap(task)
    if mesh is None:
        return jax.jit(fn)(batched_args)
    sharding = replica_sharding(mesh, axis_name)
    shardings = jax.tree.map(lambda _: sharding, batched_args)
    return jax.jit(fn, in_shardings=(shardings,))(batched_args)


def on_single_device(fn: Callable):
    """Decorator: gather inputs to host, run once, return plain values
    (the on_single_node(0, broadcast_result=True) analog for host-side
    analysis code)."""

    def wrapper(*args, **kwargs):
        host_args = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, args)
        return fn(*host_args, **kwargs)

    return wrapper
