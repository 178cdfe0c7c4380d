"""Holonomic distance constraints: SHAKE (positions) and RATTLE (velocities).

TPU-native replacement for OpenMM's SETTLE/CCMA constraint kernels
(SURVEY.md §2.2). The reference's integrators emit
``addConstrainPositions/addConstrainVelocities`` after R/V/O substeps
(integrators.py:1404-1460); here the same projections are pure functions used
by the splitting-DSL step builder.

Algorithm: Jacobi-parallel SHAKE — all constraints compute their Lagrange
corrections from the current iterate simultaneously and scatter-add them
(TPU-friendly: no sequential Gauss–Seidel sweep), iterated under
``lax.while_loop`` until the worst relative violation is below tolerance.
An SOR factor ~1.0-1.3 accelerates coupled chains (H-X constraints in
biomolecules are weakly coupled, convergence is fast).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from openmmtools_tpu.system import Constraints


def _inv_mass(masses):
    return jnp.where(masses > 0, 1.0 / jnp.maximum(masses, 1e-30), 0.0)


def shake_positions(x, x_ref, constraints: Constraints, masses,
                    tol=1e-8, max_iter=100, omega=1.0):
    """Project positions onto the constraint manifold.

    ``x_ref`` supplies the constraint directions (pre-step positions), as in
    classic SHAKE; corrections are along r_ref so the projection is
    time-reversible for the leapfrog-style R substep.

    Returns the corrected positions. No-op if there are no constraints.
    """
    if constraints.n_constraints == 0:
        return x
    i = constraints.index[:, 0]
    j = constraints.index[:, 1]
    d0 = constraints.distance
    d0sq = d0 * d0
    inv_m = _inv_mass(masses)
    imi = inv_m[i][:, None]
    imj = inv_m[j][:, None]
    s = x_ref[i] - x_ref[j]  # reference directions

    def violation(xc):
        r = xc[i] - xc[j]
        r2 = jnp.sum(r * r, axis=-1)
        return jnp.max(jnp.abs(r2 - d0sq) / d0sq)

    def cond(carry):
        xc, it = carry
        return (violation(xc) > 2.0 * tol) & (it < max_iter)

    def body(carry):
        xc, it = carry
        r = xc[i] - xc[j]
        r2 = jnp.sum(r * r, axis=-1)
        rs = jnp.sum(r * s, axis=-1)
        # guard: if r ⟂ s (pathological), fall back to r·r
        denom = 2.0 * (inv_m[i] + inv_m[j]) * jnp.where(
            jnp.abs(rs) > 1e-12, rs, r2)
        g = omega * (r2 - d0sq) / denom
        dxi = -(g[:, None] * imi) * s
        dxj = (g[:, None] * imj) * s
        xc = xc.at[i].add(dxi)
        xc = xc.at[j].add(dxj)
        return xc, it + 1

    x_out, _ = jax.lax.while_loop(cond, body, (x, jnp.zeros((), jnp.int32)))
    return x_out


def rattle_velocities(x, v, constraints: Constraints, masses,
                      tol=1e-8, max_iter=100, omega=1.0):
    """Project velocities onto the tangent space of the constraint manifold:
    (v_i - v_j) · r_ij = 0 for every constraint."""
    if constraints.n_constraints == 0:
        return v
    i = constraints.index[:, 0]
    j = constraints.index[:, 1]
    d0sq = constraints.distance ** 2
    inv_m = _inv_mass(masses)
    imi = inv_m[i][:, None]
    imj = inv_m[j][:, None]
    r = x[i] - x[j]
    r2 = jnp.sum(r * r, axis=-1)

    # velocity scale for the relative tolerance (avoids 0/0 for v = 0)
    vscale = jnp.maximum(jnp.max(jnp.abs(v)), 1e-8)

    def violation(vc):
        dv = vc[i] - vc[j]
        return jnp.max(jnp.abs(jnp.sum(dv * r, axis=-1))
                       / (jnp.sqrt(d0sq) * vscale))

    def cond(carry):
        vc, it = carry
        return (violation(vc) > tol) & (it < max_iter)

    def body(carry):
        vc, it = carry
        dv = vc[i] - vc[j]
        g = omega * jnp.sum(dv * r, axis=-1) / (r2 * (inv_m[i] + inv_m[j]))
        vc = vc.at[i].add(-(g[:, None] * imi) * r)
        vc = vc.at[j].add((g[:, None] * imj) * r)
        return vc, it + 1

    v_out, _ = jax.lax.while_loop(cond, body, (v, jnp.zeros((), jnp.int32)))
    return v_out
