"""Fixed-capacity neighbor lists for cutoff nonbonded evaluation.

TPU-native replacement for OpenMM's neighbor-list machinery (SURVEY.md §2.2).
Design for XLA: static shapes everywhere — a (N, K_max) int32 index table
with a validity mask, rebuilt periodically from an O(N^2) distance check
whose cross term runs on the MXU (r^2_ij = |x_i|^2 + |x_j|^2 - 2 x_i.x_j).

The list radius is ``cutoff + skin``; between rebuilds particles may drift
up to skin/2 each without missing interactions. Overflow (more than K_max
candidates) is detected and reported via the returned ``overflow`` flag —
the caller chooses to raise or rebuild with a larger capacity.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openmmtools_tpu.ops.geometry import minimum_image


class NeighborList(NamedTuple):
    idx: jnp.ndarray       # (N, K_max) int32 neighbor indices (self-padded)
    mask: jnp.ndarray      # (N, K_max) bool validity
    overflow: jnp.ndarray  # () bool: some particle exceeded K_max
    r_list: float          # build radius (cutoff + skin)


def build_neighbor_list(x, box, r_list: float, k_max: int,
                        periodic: bool = True) -> NeighborList:
    """O(N^2) rebuild with the MXU distance trick; returns top-k_max
    in-radius indices per particle (symmetric full list: both (i,j) and
    (j,i) appear)."""
    n = x.shape[0]
    d = x[:, None, :] - x[None, :, :]
    if periodic:
        d = minimum_image(d, box)
    r2 = jnp.sum(d * d, axis=-1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    within = (r2 < r_list * r_list) & (row != col)
    counts = jnp.sum(within, axis=1)
    overflow = jnp.any(counts > k_max)
    # top_k on the boolean validity: valid neighbors sort first; ties keep
    # index order. Values are 1.0 for valid entries -> mask = value > 0.5
    score = within.astype(jnp.float32)
    vals, idx = jax.lax.top_k(score, k_max)
    mask = vals > 0.5
    # replace invalid slots with self-index (gathers stay in-bounds and the
    # mask zeroes their contribution)
    self_idx = jax.lax.broadcasted_iota(jnp.int32, (n, k_max), 0)
    idx = jnp.where(mask, idx, self_idx)
    return NeighborList(idx=idx.astype(jnp.int32), mask=mask,
                        overflow=overflow, r_list=r_list)


def neighbor_energy(x, box, nbr: NeighborList, pair_energy_fn,
                    periodic: bool = True):
    """Sum of pair energies over the neighbor list.

    ``pair_energy_fn(r2, i, j)`` returns the pair energy given squared
    distances (N, K) and index arrays. The symmetric list double-counts each
    pair, so the result is halved.
    """
    xi = x[:, None, :]
    xj = x[nbr.idx]
    d = xi - xj
    if periodic:
        d = minimum_image(d, box)
    r2_raw = jnp.sum(d * d, axis=-1)
    r2 = jnp.where(nbr.mask, jnp.maximum(r2_raw, 1e-12), 1.0)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, nbr.idx.shape, 0)
    e = pair_energy_fn(r2, i_idx, nbr.idx)
    return 0.5 * jnp.sum(jnp.where(nbr.mask, e, 0.0))
