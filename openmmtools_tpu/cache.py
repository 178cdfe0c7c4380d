"""Compiled-program cache: the ContextCache analog.

The reference's ``ContextCache`` (cache.py:378) is the de-facto GPU memory
manager: an LRU of live OpenMM Contexts keyed by (standard-system hash,
standardized integrator), recycling expensive device allocations across
compatible states. In the TPU design there are no context objects — XLA's
compilation cache already recycles compiled executables by (structure,
shape) — so this module provides:

* :class:`LRUCache` — same capacity + time-to-live-in-accesses semantics as
  the reference (cache.py:34), used by the pieces of the framework that
  cache host-side built artifacts (bound integrators, jitted kernels);
* :class:`ContextCache` — API-parity wrapper whose ``get_context`` returns a
  (BoundIntegrator, IntegratorState-factory) pair keyed by state
  compatibility, mirroring ``get_context(thermo_state, integrator)``;
* ``global_context_cache`` — the module-level singleton (cache.py:791);
* :class:`DummyContextCache` — builds unshared bindings (cache.py:703).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

from openmmtools_tpu.states import ThermodynamicState, _abstract_signature


class LRUCache:
    """Least-recently-used cache with optional capacity and time-to-live
    measured in total accesses (reference cache.py:34-224 semantics).

    >>> cache = LRUCache(capacity=2)
    >>> cache['a'] = 1
    >>> cache['b'] = 2
    >>> cache['c'] = 3   # evicts 'a'
    >>> 'a' in cache
    False
    """

    def __init__(self, capacity: Optional[int] = None,
                 time_to_live: Optional[int] = None):
        self._data: Dict[Any, Any] = {}
        self._order: Dict[Any, int] = {}
        self._expirations: Dict[Any, int] = {}
        self._capacity = capacity
        self._ttl = time_to_live
        self._n_access = 0

    @property
    def capacity(self):
        return self._capacity

    @capacity.setter
    def capacity(self, value):
        self._capacity = value
        while value is not None and len(self._data) > value:
            self._evict_oldest()

    @property
    def time_to_live(self):
        return self._ttl

    @time_to_live.setter
    def time_to_live(self, value):
        # reference cache.py time_to_live setter semantics: re-assign every
        # entry's expiration when the ttl changes, then purge
        if value == self._ttl:
            return
        if self._ttl is None:
            # entries had no expiration: let them live `value` more accesses
            self._expirations = {k: self._n_access + value for k in self._data}
        elif value is None:
            self._expirations = {}
        else:
            delta = value - self._ttl
            self._expirations = {k: exp + delta
                                 for k, exp in self._expirations.items()}
        self._ttl = value
        self._flush_expired()

    def __len__(self):
        return len(self._data)

    def __contains__(self, key):
        return key in self._data

    def __getitem__(self, key):
        # reference cache.py __getitem__: the access counter only moves on a
        # successful read, and the accessed entry's expiration is refreshed
        # BEFORE the purge — a read can never expire the entry it returns
        value = self._data[key]
        self._n_access += 1
        self._order[key] = self._n_access
        if self._ttl is not None:
            self._expirations[key] = self._n_access + self._ttl
            self._flush_expired()
        return value

    def __setitem__(self, key, value):
        self._n_access += 1
        self._flush_expired()
        self._data[key] = value
        self._order[key] = self._n_access
        if self._ttl is not None:
            self._expirations[key] = self._n_access + self._ttl
        if self._capacity is not None and len(self._data) > self._capacity:
            self._evict_oldest()

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def pop(self, key):
        self._order.pop(key, None)
        self._expirations.pop(key, None)
        return self._data.pop(key)

    def keys(self):
        return self._data.keys()

    def _evict_oldest(self):
        oldest = min(self._order, key=self._order.get)
        self.pop(oldest)

    def _flush_expired(self):
        if self._ttl is None:
            return
        dead = [k for k, exp in self._expirations.items()
                if exp <= self._n_access]
        for k in dead:
            self.pop(k)


class ContextCache:
    """API-parity cache of bound integrators keyed by state compatibility.

    ``get_context(thermodynamic_state, integrator)`` returns
    ``(bound_integrator, thermodynamic_state)`` — the analog of the
    reference's (context, integrator) pair. Two compatible states (same
    system structure/shapes) share the same compiled programs, exactly as
    the reference shares one Context across a lambda ladder (cache.py:
    616-652); incompatible states compile separately.
    """

    def __init__(self, capacity: Optional[int] = None,
                 time_to_live: Optional[int] = None, **kwargs):
        self._lru = LRUCache(capacity, time_to_live)

    def __len__(self):
        return len(self._lru)

    @property
    def capacity(self):
        return self._lru.capacity

    @capacity.setter
    def capacity(self, value):
        self._lru.capacity = value

    @property
    def time_to_live(self):
        return self._lru.time_to_live

    @time_to_live.setter
    def time_to_live(self, value):
        self._lru.time_to_live = value

    def empty(self):
        self._lru = LRUCache(self._lru.capacity, self._lru.time_to_live)

    def get_context(self, thermodynamic_state: ThermodynamicState,
                    integrator=None):
        from openmmtools_tpu.integrators.langevin import LangevinIntegrator

        if integrator is None:
            integrator = LangevinIntegrator(
                temperature=float(thermodynamic_state.temperature))
        key = (_abstract_signature(thermodynamic_state),
               type(integrator).__name__, integrator.splitting,
               integrator.timestep, integrator.collision_rate,
               integrator.measure_shadow_work, integrator.measure_heat)
        bound = self._lru.get(key)
        if bound is None:
            bound = integrator.bind(thermodynamic_state.system)
            self._lru[key] = bound
        return bound, thermodynamic_state


class DummyContextCache:
    """Always builds a fresh binding (reference cache.py:703)."""

    def __init__(self, **kwargs):
        pass

    def get_context(self, thermodynamic_state, integrator=None):
        from openmmtools_tpu.integrators.langevin import LangevinIntegrator

        if integrator is None:
            integrator = LangevinIntegrator(
                temperature=float(thermodynamic_state.temperature))
        return integrator.bind(thermodynamic_state.system), thermodynamic_state


global_context_cache = ContextCache(capacity=None, time_to_live=None)
