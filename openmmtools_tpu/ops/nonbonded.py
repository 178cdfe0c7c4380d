"""Nonbonded energy: Lennard-Jones + Coulomb with OpenMM-compatible methods.

TPU-native replacement for OpenMM's NonbondedForce kernels (SURVEY.md §2.2).
Supported methods (matching ``openmm.NonbondedForce`` semantics):

* ``"no_cutoff"``         — plain LJ + Coulomb over all pairs
* ``"cutoff_periodic"``   — truncated LJ (optional switching) + reaction-field
                            Coulomb, minimum-image PBC
* ``"cutoff_nonperiodic"``— same functional forms, no PBC
* ``"pme"`` / ``"ewald"`` — erfc direct space here; reciprocal space lives in
                            :mod:`openmmtools_tpu.ops.pme`

Energy conventions:

* LJ:            U = 4 eps [ (sig/r)^12 - (sig/r)^6 ], Lorentz–Berthelot mixing
* switching:     U *= 1 - 10x^3 + 15x^4 - 6x^5,  x = (r - r_switch)/(rc - r_switch)
                 (applied to LJ only, as OpenMM does)
* reaction field: U = qq k_e [ 1/r + k_rf r^2 - c_rf ] for r < rc with
                 k_rf = (1/rc^3)(eps-1)/(2 eps+1), c_rf = (1/rc)(3 eps)/(2 eps+1)
                 (cf. reference ``forces.py:1110-1352`` UnshiftedReactionFieldForce)
* Ewald direct:  U = qq k_e erfc(alpha r)/r

The dense all-pairs path below is the *correctness* path (used for energy
matrices, alchemy parity tests, small systems). The production MD path uses
the neighbor-list / Pallas kernels in :mod:`openmmtools_tpu.ops.neighborlist`
and :mod:`openmmtools_tpu.ops.pallas_md`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from openmmtools_tpu.constants import ONE_4PI_EPS0
from openmmtools_tpu.ops.geometry import minimum_image

# ---------------------------------------------------------------------------
# pair interaction forms
# ---------------------------------------------------------------------------


def lj_pair(r2, sigma, epsilon):
    """4*eps*[(sig^2/r^2)^6 - (sig^2/r^2)^3] computed from squared distance."""
    s2 = sigma * sigma / r2
    s6 = s2 * s2 * s2
    return 4.0 * epsilon * (s6 * s6 - s6)


def switch_factor(r, r_switch, r_cutoff):
    """OpenMM's quintic switching function; 1 below r_switch, 0 above cutoff."""
    x = (r - r_switch) / (r_cutoff - r_switch)
    x = jnp.clip(x, 0.0, 1.0)
    return 1.0 + x * x * x * (-10.0 + x * (15.0 - 6.0 * x))


def reaction_field_constants(cutoff, dielectric):
    k_rf = (1.0 / cutoff**3) * (dielectric - 1.0) / (2.0 * dielectric + 1.0)
    c_rf = (1.0 / cutoff) * (3.0 * dielectric) / (2.0 * dielectric + 1.0)
    return k_rf, c_rf


def coulomb_pair(r, qq, method, cutoff=None, dielectric=78.3, alpha=None,
                 shift_rf=True):
    """Per-pair Coulomb energy for a given method.

    ``qq`` is the charge product (e^2); returns kJ/mol.
    ``shift_rf=False`` gives the 'unshifted' reaction field (c_rf = 0) used by
    the reference's UnshiftedReactionFieldForce (forces.py:1110).
    """
    if method in ("no_cutoff", "cutoff_nonperiodic_nocoulombmod"):
        return ONE_4PI_EPS0 * qq / r
    if method in ("cutoff_periodic", "cutoff_nonperiodic"):
        k_rf, c_rf = reaction_field_constants(cutoff, dielectric)
        if not shift_rf:
            c_rf = 0.0
        return ONE_4PI_EPS0 * qq * (1.0 / r + k_rf * r * r - c_rf)
    if method in ("pme", "ewald"):
        return ONE_4PI_EPS0 * qq * jax.scipy.special.erfc(alpha * r) / r
    raise ValueError(f"unknown nonbonded method {method!r}")


# ---------------------------------------------------------------------------
# dense all-pairs reducer
# ---------------------------------------------------------------------------


def _pair_displacements(x, box, periodic):
    d = x[:, None, :] - x[None, :, :]
    if periodic:
        d = minimum_image(d, box)
    return d


def all_pairs_energy(
    x,
    box,
    charges,
    sigmas,
    epsilons,
    *,
    method="no_cutoff",
    cutoff=None,
    switch_width=None,
    dielectric=78.3,
    alpha=None,
    periodic=False,
    charge_scale=None,
    lj_scale=None,
    shift_rf=True,
    switch_coulomb=False,
    exclude_index=None,
):
    """Total LJ + Coulomb energy over all i<j pairs (dense O(N^2) path).

    ``charge_scale``/``lj_scale`` optionally scale per-particle charges and
    per-particle epsilon *before* combination (used by non-softcore lambda
    scaling paths such as exact-PME-style alchemical charge offsets,
    cf. reference ``alchemy.py:1664-1683``).

    ``exclude_index`` (E, 2) pairs are masked OUT of the sum — exceptions
    must never enter the accumulation at all: subtracting them back in f32
    loses ~1e-4 of their magnitude, and 1-2 Coulomb pairs at r ~ 0.1 nm
    are ~1e3 kJ/mol each (measured 0.27 kJ/mol error on alanine dipeptide
    vacuum, over the reference's 0.06 kcal/mol platform-parity tolerance;
    OpenMM's kernels likewise skip excluded pairs rather than subtract).
    """
    n = x.shape[0]
    dtype = x.dtype
    if n < 2:
        return jnp.zeros((), dtype=dtype)

    q = charges if charge_scale is None else charges * charge_scale
    eps = epsilons if lj_scale is None else epsilons * lj_scale

    d = _pair_displacements(x, box, periodic)
    r2_raw = jnp.sum(d * d, axis=-1)

    # dense (N, N) combined parameters + strictly-upper-triangular mask;
    # avoids large gathers (TPU-hostile) in favor of VPU-friendly broadcasts
    sig_ij = 0.5 * (sigmas[:, None] + sigmas[None, :])
    eps_ij = jnp.sqrt(eps[:, None] * eps[None, :])
    qq_ij = q[:, None] * q[None, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    mask = row < col
    if cutoff is not None and method != "no_cutoff":
        mask = mask & (r2_raw < cutoff * cutoff)
    if exclude_index is not None and exclude_index.shape[0] > 0:
        keep = jnp.ones((n, n), jnp.bool_)
        keep = keep.at[exclude_index[:, 0], exclude_index[:, 1]].set(False)
        keep = keep.at[exclude_index[:, 1], exclude_index[:, 0]].set(False)
        mask = mask & jax.lax.optimization_barrier(keep)

    # double-where: masked-out entries (self pairs!) are clamped to a safe
    # distance BEFORE the pair functions run, else their inf/overflowing
    # energies poison the gradient through the final where (NaN = 0 * inf)
    r2 = jnp.where(mask, jnp.maximum(r2_raw, 1e-12), 1.0)
    r = jnp.sqrt(r2)

    e_lj = lj_pair(r2, sig_ij, eps_ij)
    e_coul = coulomb_pair(r, qq_ij, method, cutoff=cutoff,
                          dielectric=dielectric, alpha=alpha,
                          shift_rf=shift_rf)
    if switch_width is not None and cutoff is not None:
        S = switch_factor(r, cutoff - switch_width, cutoff)
        e_lj = e_lj * S
        if switch_coulomb:
            # the reference's [Unshifted/Switched]ReactionFieldForce
            # switches the whole pair energy (forces.py:1110,1231)
            e_coul = e_coul * S

    return jnp.sum(jnp.where(mask, e_lj + e_coul, 0.0))


def pair_list_energy(
    x,
    box,
    pairs,
    qq,
    sigma,
    epsilon,
    *,
    method="no_cutoff",
    cutoff=None,
    switch_width=None,
    dielectric=78.3,
    alpha=None,
    periodic=False,
    apply_cutoff=True,
    shift_rf=True,
    switch_coulomb=False,
):
    """LJ + Coulomb energy over an explicit pair list with per-pair parameters.

    Used for exceptions (which *replace* the combined-rule interaction, as in
    OpenMM) and for subtracting excluded pairs from the dense sum. ``qq`` is
    the per-pair charge product.
    """
    if pairs.shape[0] == 0:
        return jnp.zeros((), dtype=x.dtype)
    # barriered gathers (both autodiff directions; ops/geometry.py
    # gather_rows): XLA's fused gather/scatter+compute loops serialize
    # on TPU (33 ms vs 0.04 ms for 35k rows measured on v5e)
    from openmmtools_tpu.ops.geometry import gather_rows

    d = gather_rows(x, pairs[:, 0]) - gather_rows(x, pairs[:, 1])
    if periodic:
        d = minimum_image(d, box)
    r2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
    r = jnp.sqrt(r2)
    e_lj = lj_pair(r2, sigma, epsilon)
    e_coul = coulomb_pair(r, qq, method, cutoff=cutoff, dielectric=dielectric,
                          alpha=alpha, shift_rf=shift_rf)
    if switch_width is not None and cutoff is not None:
        S = switch_factor(r, cutoff - switch_width, cutoff)
        e_lj = e_lj * S
        if switch_coulomb:
            e_coul = e_coul * S
    e = e_lj + e_coul
    if apply_cutoff and cutoff is not None and method != "no_cutoff":
        e = jnp.where(r2 < cutoff * cutoff, e, 0.0)
    return jnp.sum(e)


# ---------------------------------------------------------------------------
# long-range dispersion correction
# ---------------------------------------------------------------------------


def dispersion_correction_energy(box, sigmas, epsilons, cutoff,
                                 lj_scale=None):
    """Analytic isotropic LJ tail correction (no-switch form).

    E = (2 pi N^2 / V) < 4 eps_ij [ sig_ij^12/(9 rc^9) - sig_ij^6/(3 rc^3) ] >
    averaged over all N^2 ordered particle pairs, matching OpenMM's
    class-pair-averaged correction. Volume from the box diagonal.
    """
    n = sigmas.shape[0]
    eps = epsilons if lj_scale is None else epsilons * lj_scale
    sig_ij = 0.5 * (sigmas[:, None] + sigmas[None, :])
    eps_ij = jnp.sqrt(eps[:, None] * eps[None, :])
    s3 = sig_ij**3
    s6 = s3 * s3
    s12 = s6 * s6
    rc3 = cutoff**3
    rc9 = rc3**3
    integral = 4.0 * eps_ij * (s12 / (9.0 * rc9) - s6 / (3.0 * rc3))
    avg = jnp.mean(integral)
    volume = jnp.prod(jnp.diagonal(box))
    return 2.0 * jnp.pi * n * n / volume * avg
