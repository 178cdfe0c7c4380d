"""Bonded energy terms: harmonic bonds/angles, periodic torsions.

TPU-native replacement for OpenMM's HarmonicBondForce / HarmonicAngleForce /
PeriodicTorsionForce kernels (SURVEY.md §2.2; used throughout
``/root/reference/openmmtools/alchemy/alchemy.py:1115-1338`` as the base forms
that alchemy softens). Energy conventions match OpenMM:

* bond:    U = (k/2) (r - r0)^2
* angle:   U = (k/2) (theta - theta0)^2
* torsion: U = k (1 + cos(n*phi - phase))

All functions are vectorized over the leading term axis and return the summed
energy; empty term arrays contribute 0.
"""
from __future__ import annotations

import jax.numpy as jnp

from openmmtools_tpu.ops.geometry import (
    angle,
    dihedral,
    gather_rows,
    safe_norm,
)

# All row gathers below pass through optimization_barrier: XLA's fused
# gather+compute loops serialize on TPU (measured 33 ms vs 0.04 ms for a
# 35k-row gather feeding arithmetic), while standalone gathers lower to
# the fast path.


def harmonic_bond_energy_rows(xi, xj, length, k, scale=None):
    """Bond energy from pre-gathered endpoint rows (fused-gather path)."""
    r = safe_norm(xi - xj)
    e = 0.5 * k * (r - length) ** 2
    if scale is not None:
        e = e * scale
    return jnp.sum(e)


def harmonic_bond_energy(x, index, length, k, scale=None):
    """Sum of (k/2)(r - r0)^2 over bonds.

    x: (N,3); index: (B,2) int; length,k: (B,). ``scale`` optionally
    multiplies each bond's energy (used by alchemical bond softening).
    """
    if index.shape[0] == 0:
        return jnp.zeros((), dtype=x.dtype)
    xi = gather_rows(x, index[:, 0])
    xj = gather_rows(x, index[:, 1])
    return harmonic_bond_energy_rows(xi, xj, length, k, scale)


def harmonic_angle_energy_rows(xi, xj, xk, theta0, k, scale=None):
    """Angle energy from pre-gathered rows (fused-gather path)."""
    th = angle(xi, xj, xk)
    e = 0.5 * k * (th - theta0) ** 2
    if scale is not None:
        e = e * scale
    return jnp.sum(e)


def harmonic_angle_energy(x, index, theta0, k, scale=None):
    """Sum of (k/2)(theta - theta0)^2 over angles. index: (A,3)."""
    if index.shape[0] == 0:
        return jnp.zeros((), dtype=x.dtype)
    xi = gather_rows(x, index[:, 0])
    xj = gather_rows(x, index[:, 1])
    xk = gather_rows(x, index[:, 2])
    return harmonic_angle_energy_rows(xi, xj, xk, theta0, k, scale)


def periodic_torsion_energy_rows(xi, xj, xk, xl, periodicity, phase, k,
                                 scale=None):
    """Torsion energy from pre-gathered rows (fused-gather path)."""
    phi = dihedral(xi, xj, xk, xl)
    e = k * (1.0 + jnp.cos(periodicity * phi - phase))
    if scale is not None:
        e = e * scale
    return jnp.sum(e)


def periodic_torsion_energy(x, index, periodicity, phase, k, scale=None):
    """Sum of k(1 + cos(n*phi - phase)) over torsions. index: (T,4)."""
    if index.shape[0] == 0:
        return jnp.zeros((), dtype=x.dtype)
    xi = gather_rows(x, index[:, 0])
    xj = gather_rows(x, index[:, 1])
    xk = gather_rows(x, index[:, 2])
    xl = gather_rows(x, index[:, 3])
    return periodic_torsion_energy_rows(xi, xj, xk, xl, periodicity, phase,
                                        k, scale)
