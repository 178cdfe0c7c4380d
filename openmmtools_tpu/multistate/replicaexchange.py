"""Replica-exchange sampler: on-device Gibbs swap mixing.

TPU-native port of ``multistate/replicaexchange.py`` (447 LoC). The
reference's numba-JIT swap kernel (replicaexchange.py:294-349: n_replicas^3
sequential Metropolis swap attempts between random state pairs, run on rank
0 and broadcast) becomes a ``lax.fori_loop`` over the same sequential
recurrence executed on-device from the resident N×K energy matrix — the
permutation never leaves the chip (SURVEY.md §2.3, §5.8).

``swap-neighbors`` (replicaexchange.py:366) is the vectorized even/odd
neighbor sweep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from openmmtools_tpu.multistate.analyzer import ReplicaExchangeAnalyzer  # noqa: F401 (re-export parity)
from openmmtools_tpu.multistate.sampler import MultiStateSampler


class ReplicaExchangeSampler(MultiStateSampler):
    """Gibbs-sampled state swaps every iteration (replicaexchange.py:52).

    replica_mixing_scheme: 'swap-all' (default; n^3 random-pair attempts),
    'swap-neighbors', or None (no mixing).
    """

    def __init__(self, *args, replica_mixing_scheme="swap-all", **kwargs):
        super().__init__(*args, **kwargs)
        if replica_mixing_scheme not in ("swap-all", "swap-neighbors", None):
            raise ValueError(
                f"unknown replica_mixing_scheme {replica_mixing_scheme!r}")
        self.replica_mixing_scheme = replica_mixing_scheme

    def _mix_kernel(self, key, states, u, n_acc, n_prop,
                    mix_params=None):
        if self.replica_mixing_scheme is None:
            return states, n_acc, n_prop
        if self.replica_mixing_scheme == "swap-neighbors":
            return _mix_neighbors(key, states, u, n_acc, n_prop)
        return _mix_all(key, states, u, n_acc, n_prop)


def _mix_all(key, states, u, n_acc, n_prop):
    """Sequential Gibbs swap-all kernel (replicaexchange.py:296-349 math):
    log_p = -(u[i,s_j] + u[j,s_i]) + u[i,s_i] + u[j,s_j]."""
    n = states.shape[0]
    n_attempts = n ** 3
    pair_keys, accept_key = jax.random.split(key)
    # pre-draw all randomness outside the sequential loop (vectorized)
    pairs = jax.random.randint(pair_keys, (n_attempts, 2), 0, n)
    log_us = jnp.log(jax.random.uniform(
        accept_key, (n_attempts,), dtype=u.dtype))

    def body(t, carry):
        states, n_acc, n_prop = carry
        i = pairs[t, 0]
        j = pairs[t, 1]
        s_i = states[i]
        s_j = states[j]
        log_p = -(u[i, s_j] + u[j, s_i]) + u[i, s_i] + u[j, s_j]
        accept = (log_us[t] < log_p) & (i != j)
        new_si = jnp.where(accept, s_j, s_i)
        new_sj = jnp.where(accept, s_i, s_j)
        states = states.at[i].set(new_si).at[j].set(new_sj)
        distinct = (i != j).astype(jnp.int32)
        n_prop = n_prop.at[s_i, s_j].add(distinct)
        n_prop = n_prop.at[s_j, s_i].add(distinct)
        inc = accept.astype(jnp.int32)
        n_acc = n_acc.at[s_i, s_j].add(inc)
        n_acc = n_acc.at[s_j, s_i].add(inc)
        return states, n_acc, n_prop

    return jax.lax.fori_loop(0, n_attempts, body, (states, n_acc, n_prop))


def _mix_neighbors(key, states, u, n_acc, n_prop):
    """Vectorized neighbor-state swap sweep (replicaexchange.py:366):
    pick a random parity, attempt swaps between replicas holding states
    (k, k+1) for k = parity, parity+2, ..."""
    n = states.shape[0]
    k_states = u.shape[1]
    key_par, key_acc = jax.random.split(key)
    parity = jax.random.randint(key_par, (), 0, 2)

    # replica currently at each state (states is a permutation when N == K)
    replica_of = jnp.argsort(states)

    n_pairs = k_states // 2
    pair_start = (jnp.arange(n_pairs, dtype=jnp.int32) * 2
                  + parity.astype(jnp.int32))  # state index k
    valid = pair_start + 1 < k_states
    s_a = jnp.clip(pair_start, 0, k_states - 1)
    s_b = jnp.clip(pair_start + 1, 0, k_states - 1)
    i = replica_of[s_a]
    j = replica_of[s_b]
    log_p = -(u[i, s_b] + u[j, s_a]) + u[i, s_a] + u[j, s_b]
    log_r = jnp.log(jax.random.uniform(key_acc, (n_pairs,), dtype=u.dtype))
    accept = (log_r < log_p) & valid

    new_states = states
    new_states = new_states.at[i].set(jnp.where(accept, s_b, s_a))
    new_states = new_states.at[j].set(jnp.where(accept, s_a, s_b))
    inc_p = valid.astype(jnp.int32)
    inc_a = accept.astype(jnp.int32)
    n_prop = n_prop.at[s_a, s_b].add(inc_p).at[s_b, s_a].add(inc_p)
    n_acc = n_acc.at[s_a, s_b].add(inc_a).at[s_b, s_a].add(inc_a)
    return new_states, n_acc, n_prop
