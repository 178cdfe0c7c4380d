"""Ewald / PME electrostatics: reciprocal space as MXU matmuls.

TPU-native replacement for OpenMM's PME kernels (SURVEY.md §2.2). The
classic PME pipeline (B-spline charge spreading -> FFT -> influence
function) is scatter/gather-bound — exactly what TPUs do worst. For the
system sizes this framework targets (10^2-10^5 particles), the *direct
k-space Ewald sum* is the better hardware fit: the structure factor
S(k) = sum_j q_j exp(i k . r_j) is two (n_k x N) matrix products
(cos/sin against the phase matrix k . r), which run on the MXU at
hundreds of TFLOP/s, and the energy is a weighted reduction over k.

    E_rec = k_e * (2 pi / V) sum_{k != 0} exp(-k^2/(4 alpha^2))/k^2 |S(k)|^2
    E_self = -k_e * alpha/sqrt(pi) sum_j q_j^2
    E_excl = -k_e * sum_{excluded pairs} q_i q_j erf(alpha r_ij)/r_ij

combined with the erfc direct-space term evaluated by the nonbonded pair
paths (method='pme'/'ewald'). Alpha and k-space extent follow OpenMM's
error-tolerance heuristics: alpha = sqrt(-ln(2 tol))/cutoff,
n_max = ceil(alpha L sqrt(-ln(2 tol)) / pi).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.constants import ONE_4PI_EPS0
from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field

# OpenMM NonbondedForce's default PME tolerance.  NOTE: the reference's
# *testsystems* override this to 1e-5 (testsystems.py:69); builders take
# a tol argument, so systems can ask for either.
DEFAULT_EWALD_ERROR_TOLERANCE = 5e-4

# MXU precision for the structure-factor contractions.  DEFAULT (single
# bf16 pass) silently loses the large-k phases (DHFR recip off by ~1e6
# kJ/mol, ROADMAP round-2 finding 4).  HIGH (3-pass bf16) measured on
# hardware against HIGHEST (6-pass): energy rel 7.8e-8, max force rel
# 5.7e-6 at N=4096/kmax=32 and within the DHFR dense-parity gate at
# 23.5k atoms — both far below the 5e-4 Ewald error tolerance — at 2.2x
# the speed.  Overridable for experiments/tests.
SF_PRECISION = jax.lax.Precision.HIGH

# Backward contraction structure for the hand VJP (round-5 DHFR recip
# profile, ROADMAP).  The 3-axis form runs three heavy (N, K_c) matmuls,
# each forcing XLA to materialize a DIFFERENT (N, ~K^2) phase-product
# staging in HBM (yz: (2M+1)^2 cols, xz/xy: (M+1)(2M+1) cols — ~415 MB
# total at DHFR shape, the measured 0.78 ms backward is their traffic,
# not MACs).  The finishing stages only ever need four per-particle
# SCALARS (H0, Hx, Hy, Hz = Σ_k B·m_axis·Px·Py·Pz), so all four fold
# into ONE matmul against a single shared staging D[n, yz]:
#     V[n, x, a] = Σ_yz D[n, yz] · (B·m_a)[x, yz]   (a = 1, mx, my, mz)
#     H[n, a]    = Σ_x  V[n, x, a] · Px[n, x]
# halving backward HBM traffic.  False restores the 3-axis form (kept
# for A/B measurement; both are exact).
SF_BWD_SHARED = True

# Precision override for the backward contraction only (None -> follow
# SF_PRECISION).  Experiment knob: the force tolerance (5e-4) is 100x
# looser than what HIGH delivers (5.7e-6), so a cheaper backward pass
# may be admissible where the forward is not — measured, not assumed.
SF_BWD_PRECISION = None


def ewald_alpha(cutoff: float, tol: float = DEFAULT_EWALD_ERROR_TOLERANCE
                ) -> float:
    """OpenMM's alpha heuristic: sqrt(-ln(2 tol)) / cutoff."""
    return math.sqrt(-math.log(2.0 * tol)) / cutoff


def ewald_kmax(alpha: float, box_edge: float,
               tol: float = DEFAULT_EWALD_ERROR_TOLERANCE) -> int:
    """Number of reciprocal lattice shells per axis."""
    return max(1, int(math.ceil(alpha * box_edge
                                * math.sqrt(-math.log(2.0 * tol)) / math.pi)))


def _phase_tables(theta, M, half=False):
    """(N, 2M+1) complex phase tables exp(i m theta), m = -M..M.

    With ``half=True``, only m = 0..M: real charges give the Hermitian
    symmetry S(-k) = conj(S(k)), so |S|^2 over the full k-cube equals the
    kx >= 0 half with a factor-2 weight on kx > 0 — this halves every
    heavy (N x K^3-ish) contraction in both the forward and backward
    structure-factor passes.
    """
    lo = 0 if half else -M
    mj = jnp.arange(lo, M + 1, dtype=theta.dtype)
    th = theta[:, None] * mj[None, :]
    return jax.lax.complex(jnp.cos(th), jnp.sin(th))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _sf_weighted_sum(q, tx, ty, tz, w, M):
    """W = Σ_k w(k) |S(k)|² with S(k) = Σ_n q_n exp(i(kx tx + ky ty + kz tz)).

    The k-grid is the Hermitian HALF cube: kx = 0..M, ky/kz = -M..M, with
    the caller folding the factor 2 for kx > 0 into ``w`` (shape
    (M+1, 2M+1, 2M+1)) — exact for real charges.

    Hand-written VJP: the autodiff backward of the forward einsum picks a
    pathological contraction path on TPU (measured 5.1 ms vs 0.75 ms
    forward at DHFR scale); the hand path shares one heavy (N, K)
    contraction per axis and returns exact cotangents for q, the phase
    angles AND the weight grid (so box derivatives remain correct).
    """
    S = _sf_forward(q, tx, ty, tz, M)
    s2 = jnp.real(S) ** 2 + jnp.imag(S) ** 2
    return jnp.sum(w * s2)


def _sf_forward(q, tx, ty, tz, M):
    return jnp.einsum(
        'n,nx,ny,nz->xyz',
        jax.lax.complex(q, jnp.zeros_like(q)),
        _phase_tables(tx, M, half=True),
        _phase_tables(ty, M), _phase_tables(tz, M),
        precision=SF_PRECISION)


def _sf_fwd(q, tx, ty, tz, w, M):
    S = _sf_forward(q, tx, ty, tz, M)
    s2 = jnp.real(S) ** 2 + jnp.imag(S) ** 2
    return jnp.sum(w * s2), (q, tx, ty, tz, w, S)


def _sf_bwd(M, res, g):
    q, tx, ty, tz, w, S = res
    Px = _phase_tables(tx, M, half=True)
    Py = _phase_tables(ty, M)
    Pz = _phase_tables(tz, M)
    mj = jnp.arange(-M, M + 1, dtype=tx.dtype)
    mjx = jnp.arange(0, M + 1, dtype=tx.dtype)
    B = jax.lax.complex(w, jnp.zeros_like(w)) * jnp.conj(S)
    hi = functools.partial(
        jnp.einsum,
        precision=SF_PRECISION if SF_BWD_PRECISION is None
        else SF_BWD_PRECISION)
    if SF_BWD_SHARED:
        # ONE shared staging D[n, y, z] = Py·Pz and ONE heavy matmul for
        # all four finishing sums (see the SF_BWD_SHARED note at the top).
        # Expressed as einsum, never reshape+dot (the axon backend
        # miscompiles reshape-of-padded-3D + dot, ROADMAP round-2 #3).
        D = Py[:, :, None] * Pz[:, None, :]            # (N, 2M+1, 2M+1)
        G = jnp.stack(
            [B,
             B * jax.lax.complex(mjx, jnp.zeros_like(mjx))[:, None, None],
             B * jax.lax.complex(mj, jnp.zeros_like(mj))[None, :, None],
             B * jax.lax.complex(mj, jnp.zeros_like(mj))[None, None, :]],
            axis=-1)                                   # (M+1, 2M+1, 2M+1, 4)
        V = hi('nyz,xyza->nxa', D, G)                  # heavy (the only one)
        H = jnp.sum(V * Px[:, :, None], axis=1)        # (N, 4)
        H0, Hx, Hy, Hz = H[:, 0], H[:, 1], H[:, 2], H[:, 3]
    else:
        # one heavy contraction per axis; the per-axis m factor applies in
        # the cheap (N, K) finishing stage
        Cx = hi('xyz,ny,nz->nx', B, Py, Pz)     # heavy
        Cy = hi('xyz,nx,nz->ny', B, Px, Pz)     # heavy
        Cz = hi('xyz,nx,ny->nz', B, Px, Py)     # heavy
        H0 = jnp.sum(Cx * Px, axis=1)
        Hx = jnp.sum(Cx * Px * mjx[None, :], axis=1)
        Hy = jnp.sum(Cy * Py * mj[None, :], axis=1)
        Hz = jnp.sum(Cz * Pz * mj[None, :], axis=1)
    dq = g * 2.0 * jnp.real(H0)
    dtx = g * q * (-2.0) * jnp.imag(Hx)
    dty = g * q * (-2.0) * jnp.imag(Hy)
    dtz = g * q * (-2.0) * jnp.imag(Hz)
    s2 = jnp.real(S) ** 2 + jnp.imag(S) ** 2
    dw = g * s2
    return dq, dtx, dty, dtz, dw


_sf_weighted_sum.defvjp(_sf_fwd, _sf_bwd)


# ---------------------------------------------------------------------------
# real-basis (parity-folded) structure factors — round-5 recip push
# ---------------------------------------------------------------------------
#
# The complex path contracts (N, 2M+1) complex phase tables: every heavy
# matmul is 4 real matmuls over (2M+1)^2 staged columns.  Real charges
# give one more symmetry beyond the Hermitian kx-fold: w(k) is even in
# ky and kz separately, and summing |S|^2 over the four (±ky, ±kz) sign
# combinations DIAGONALIZES in the cos/sin basis:
#
#   S(kx, ±my, ±mz) = T1 ∓∓ T4 + i(±T2 + ±T3)   with
#   T1 = Σ q Px Cy Cz,  T2 = Σ q Px Cy Sz,  T3 = Σ q Px Sy Cz,
#   T4 = Σ q Px Sy Sz   (all complex through Px)
#   Σ_signs |S|^2 = 4 (|T1|^2 + |T2|^2 + |T3|^2 + |T4|^2)
#
# so with stacked real tables X = [cos, sin](N, 2(M+1)) per axis (sin
# column 0 = 0 makes the boundary my=0 / mz=0 terms exact automatically),
# ONE real einsum T[x2, yb, zb] = Σ_n (q X)·(Y ⊗ Z) and
# W = Σ tile(w·wy·wz, (2,2,2)) ⊙ T² replace the complex contraction —
# half the staged columns ((M+1)^2·4 vs (2M+1)^2 complex) and half the
# real MACs (2 vs 4 matmuls of half width) in BOTH directions.  The
# backward reuses the shared-staging trick: all four finishing sums
# (dq, dθx, dθy, dθz) are trilinear forms against the SAME (N, yb·zb)
# staging with block-swapped/±m-folded copies of B = dW/dT.


def _real_tables(theta, M):
    """(N, 2(M+1)) stacked [cos(mθ) | sin(mθ)], m = 0..M (sin col 0 = 0)."""
    m = jnp.arange(0, M + 1, dtype=theta.dtype)
    th = theta[:, None] * m[None, :]
    return jnp.concatenate([jnp.cos(th), jnp.sin(th)], axis=1)


def _real_weight_full(w, M):
    """tile(w_quadrant·wy·wz, (2,2,2)) from the signed (M+1, 2M+1, 2M+1)
    weight grid (w is even in ky and kz: w[:, M+m, :] == w[:, M-m, :])."""
    wq = w[:, M:, M:]
    mult = jnp.where(jnp.arange(M + 1) > 0, 2.0, 1.0).astype(w.dtype)
    wq = wq * mult[None, :, None] * mult[None, None, :]
    return jnp.tile(wq, (2, 2, 2))


def _sf_forward_real(q, tx, ty, tz, M):
    X = _real_tables(tx, M)
    Y = _real_tables(ty, M)
    Z = _real_tables(tz, M)
    D = Y[:, :, None] * Z[:, None, :]
    T = jnp.einsum('nx,nyz->xyz', q[:, None] * X, D,
                   precision=SF_PRECISION)
    return T, X, Y, Z


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _sf_weighted_sum_real(q, tx, ty, tz, w, M):
    """Real-basis W = Σ_k w(k)|S(k)|² (same contract as _sf_weighted_sum;
    ``w`` is the SAME signed Hermitian-half grid — folded internally)."""
    T, _, _, _ = _sf_forward_real(q, tx, ty, tz, M)
    return jnp.sum(_real_weight_full(w, M) * T * T)


def _sfr_fwd(q, tx, ty, tz, w, M):
    T, _, _, _ = _sf_forward_real(q, tx, ty, tz, M)
    return (jnp.sum(_real_weight_full(w, M) * T * T),
            (q, tx, ty, tz, w, T))


def _swap_mblocks(B, axis, M):
    """Fold d[cos|sin]/dθ into the k-tensor: Σ_b B ⊙ d(table)/dθ ==
    Σ_b B' ⊙ table with B' = [m·B_sin | -m·B_cos] along ``axis``."""
    Bc = jax.lax.slice_in_dim(B, 0, M + 1, axis=axis)
    Bs = jax.lax.slice_in_dim(B, M + 1, 2 * (M + 1), axis=axis)
    m = jnp.arange(0, M + 1, dtype=B.dtype)
    shape = [1] * B.ndim
    shape[axis] = M + 1
    m = m.reshape(shape)
    return jnp.concatenate([m * Bs, -m * Bc], axis=axis)


def _sfr_bwd(M, res, g):
    q, tx, ty, tz, w, T = res
    X = _real_tables(tx, M)
    Y = _real_tables(ty, M)
    Z = _real_tables(tz, M)
    B = (2.0 * g) * _real_weight_full(w, M) * T
    G = jnp.stack([B,
                   _swap_mblocks(B, 0, M),
                   _swap_mblocks(B, 1, M),
                   _swap_mblocks(B, 2, M)], axis=-1)
    D = Y[:, :, None] * Z[:, None, :]
    V = jnp.einsum('nyz,xyza->nxa', D, G,
                   precision=SF_PRECISION if SF_BWD_PRECISION is None
                   else SF_BWD_PRECISION)
    H = jnp.sum(V * X[:, :, None], axis=1)          # (N, 4)
    dq = H[:, 0]
    dtx = q * H[:, 1]
    dty = q * H[:, 2]
    dtz = q * H[:, 3]
    # w cotangent: per-signed-cell |S|² reconstructed from the T blocks
    # (box/virial derivatives flow through w)
    M1 = M + 1
    Tr1, Ti1 = T[:M1, :M1, :M1], T[M1:, :M1, :M1]
    Tr2, Ti2 = T[:M1, :M1, M1:], T[M1:, :M1, M1:]
    Tr3, Ti3 = T[:M1, M1:, :M1], T[M1:, M1:, :M1]
    Tr4, Ti4 = T[:M1, M1:, M1:], T[M1:, M1:, M1:]

    def s2q(sy, sz):
        sre = Tr1 - (sy * sz) * Tr4 - sz * Ti2 - sy * Ti3
        sim = Ti1 - (sy * sz) * Ti4 + sz * Tr2 + sy * Tr3
        return sre * sre + sim * sim

    def z_row(sy):
        neg = s2q(sy, -1)[:, :, :0:-1]       # mz = M..1 mirrored
        return jnp.concatenate([neg, s2q(sy, 1)], axis=2)

    s2 = jnp.concatenate([z_row(-1)[:, :0:-1, :], z_row(1)], axis=1)
    dw = g * s2
    return dq, dtx, dty, dtz, dw


_sf_weighted_sum_real.defvjp(_sfr_fwd, _sfr_bwd)

# Structure-factor implementation for the factorized path: 'real'
# (parity-folded cos/sin basis, above) or 'complex' (Hermitian-half
# complex tables).  Both are exact (CPU f64/f32 parity to 1e-15/6e-7;
# suite green under either).  Hardware A/B at DHFR shape (v5e,
# 2026-08-20, f64-oracle-pinned): E+grad 0.691 ms (complex shared) ->
# 0.468 ms (real) at max grad err 1.66e-5 of force scale (complex:
# 2.47e-5) — the real basis is both faster AND slightly more accurate
# (half the bf16 passes touch half the columns), so it ships.
SF_IMPL = "real"


def _half_space_kvectors(n_max: Tuple[int, int, int]) -> np.ndarray:
    """Integer k-vectors covering half of reciprocal space (k and -k give
    identical |S|^2; the weight 2 is applied in the energy)."""
    nx, ny, nz = n_max
    ks = []
    for kx in range(0, nx + 1):
        ky_lo = -ny if kx > 0 else 0
        for ky in range(ky_lo, ny + 1):
            kz_lo = -nz if (kx > 0 or ky > 0) else 1
            for kz in range(kz_lo, nz + 1):
                ks.append((kx, ky, kz))
    return np.asarray(ks, dtype=np.float64)


@pytree_dataclass
class EwaldReciprocalTerm:
    """Reciprocal-space + self + exclusion-correction energy term.

    Built by system factories alongside a NonbondedTerm with method
    'pme'/'ewald' (which supplies the erfc direct space). ``charge_scale_
    param`` mirrors the NonbondedTerm hook so 'exact-PME'-style alchemical
    charge scaling (alchemy.py:1664-1683) affects reciprocal space too.
    """

    charge: jax.Array               # (N,)
    kvecs: jax.Array                # (n_k, 3) integer reciprocal indices
    exclusion_index: jax.Array      # (E, 2) pairs excluded from direct space
    alch_mask: Optional[jax.Array] = None   # (N,) 1 = alchemical particle
    alpha: float = static_field(default=3.0)
    force_group: int = static_field(default=0)
    charge_scale_param: Optional[str] = static_field(default=None)
    lambda_name: Optional[str] = static_field(default=None)
    # k-space extent per axis; when set, energy() uses the factorized
    # structure-factor path (phase recurrence + staged matmuls) instead of
    # the explicit (n_k, N) cos/sin matrix — O(N) transcendentals instead
    # of O(n_k * N), which is the difference between 46 ms and <1 ms per
    # evaluation at DHFR scale (23.5k atoms, kmax=16)
    kmax: Optional[int] = static_field(default=None)

    @property
    def global_defaults(self):
        out = {}
        if self.lambda_name is not None:
            out[self.lambda_name] = 1.0
        return out

    def _reciprocal_factorized(self, q, x, lengths, volume):
        """E_rec via factorized structure factors.

        S(k) = Σ_n q_n Px[n,kx] Py[n,ky] Pz[n,kz] with per-axis phase
        tables Pc[n,m] = exp(i 2π m x_c,n / L_c) built by a multiplicative
        recurrence (2 transcendentals per particle per axis instead of one
        per (k, particle)).  The triple contraction is one elementwise
        outer product C[n, ky·kz] = Py·Pz plus one MXU matmul
        S = (q·Px)ᵀ C — O(N·K³) MACs on the MXU instead of O(n_k·N)
        cos/sin on the VPU.  Sum over the Hermitian HALF k-box: real
        charges give S(-k) = conj(S(k)), so kx runs 0..M with a factor-2
        weight on kx > 0 — halving every heavy contraction (measured
        exact vs the full cube); k = 0 masked by its weight.
        """
        M = int(self.kmax)
        two_pi = 2.0 * jnp.pi
        dtype = x.dtype
        mj = jnp.arange(-M, M + 1, dtype=dtype)   # iota, not a constant
        mjx = jnp.arange(0, M + 1, dtype=dtype)

        # einsum-based structure factors (inside _sf_weighted_sum, which
        # carries a hand-written VJP — the autodiff backward picks a
        # pathological contraction path on TPU).  Deliberately NOT
        # hand-staged via reshape+matmul: the axon TPU backend
        # miscompiles the reshape-of-padded-3D + dot composition
        # (verified: hand-staged s2 grids off by O(1) relative, einsum
        # matches an f64 reference to 5e-6 median).
        kx_ax = two_pi * mjx / lengths[0]
        k_ax = [two_pi * mj / lengths[c] for c in (1, 2)]
        k2 = (kx_ax[:, None, None] ** 2 + k_ax[0][None, :, None] ** 2
              + k_ax[1][None, None, :] ** 2)
        inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.maximum(k2, 1e-12), 0.0)
        hermitian = jnp.where(mjx > 0, 2.0, 1.0)[:, None, None]
        weight = (hermitian * jnp.exp(-k2 / (4.0 * self.alpha * self.alpha))
                  * inv_k2)
        sf = (_sf_weighted_sum_real if SF_IMPL == "real"
              else _sf_weighted_sum)
        W = sf(q, (two_pi / lengths[0]) * x[:, 0],
               (two_pi / lengths[1]) * x[:, 1],
               (two_pi / lengths[2]) * x[:, 2], weight, M)
        return ONE_4PI_EPS0 * (two_pi / volume) * W

    def effective_charge(self, params=None):
        """Charges after global-parameter scaling ('exact-PME' alchemical
        treatment, alchemy.py:1664-1683: alchemical charges scale linearly
        with lambda in BOTH direct and reciprocal space)."""
        q = self.charge
        if (self.charge_scale_param is not None and params is not None
                and self.charge_scale_param in params):
            q = q * params[self.charge_scale_param]
        if (self.lambda_name is not None and self.alch_mask is not None
                and params is not None and self.lambda_name in params):
            lam = params[self.lambda_name]
            q = q * (1.0 + (lam - 1.0) * self.alch_mask)
        return q

    def self_energy(self, q):
        """O(N) Ewald self-energy (configuration-independent)."""
        return (-ONE_4PI_EPS0 * self.alpha / jnp.sqrt(jnp.pi)
                * jnp.sum(q * q))

    def exclusion_correction_of_r(self, q, r):
        """Exclusion correction given precomputed pair distances ``r``
        aligned with ``exclusion_index`` rows — the hook the sweep path
        uses to FUSE this correction into the exception add-back's pair
        loop (one shared gather/scatter pass instead of two; round-5
        DHFR budget: the separate loops cost 0.69 + ~0.5 ms/step)."""
        i = self.exclusion_index[:, 0]
        j = self.exclusion_index[:, 1]
        return -ONE_4PI_EPS0 * jnp.sum(
            q[i] * q[j] * jax.scipy.special.erf(self.alpha * r) / r)

    def exclusion_energy(self, q, x, box):
        """O(E) exclusion corrections with their own (barriered) gathers."""
        if self.exclusion_index.shape[0] == 0:
            return jnp.zeros((), dtype=x.dtype)
        lengths = jnp.diagonal(box)
        i = self.exclusion_index[:, 0]
        j = self.exclusion_index[:, 1]
        # barriered gathers (both autodiff directions)
        from openmmtools_tpu.ops.geometry import gather_rows

        d = gather_rows(x, i) - gather_rows(x, j)
        d = d - lengths * jnp.round(d / lengths)
        r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=1), 1e-12))
        return self.exclusion_correction_of_r(q, r)

    def self_exclusion_energy(self, q, x, box):
        """Self energy + exclusion corrections (the O(N)+O(E) remainder of
        the reciprocal term; shared with the atom-sharded evaluator)."""
        return self.self_energy(q) + self.exclusion_energy(q, x, box)

    def weight_grid(self, box):
        """Hermitian half-cube k-space weight grid (M+1, 2M+1, 2M+1) for
        the factorized path (kmax set)."""
        M = int(self.kmax)
        lengths = jnp.diagonal(box)
        dtype = lengths.dtype
        two_pi = 2.0 * jnp.pi
        mj = jnp.arange(-M, M + 1, dtype=dtype)
        mjx = jnp.arange(0, M + 1, dtype=dtype)
        kx_ax = two_pi * mjx / lengths[0]
        k_ax = [two_pi * mj / lengths[c] for c in (1, 2)]
        k2 = (kx_ax[:, None, None] ** 2 + k_ax[0][None, :, None] ** 2
              + k_ax[1][None, None, :] ** 2)
        inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.maximum(k2, 1e-12), 0.0)
        hermitian = jnp.where(mjx > 0, 2.0, 1.0)[:, None, None]
        return (hermitian * jnp.exp(-k2 / (4.0 * self.alpha * self.alpha))
                * inv_k2)

    def energy_without_exclusions(self, x, box, params=None):
        """k-space + self energy only; the caller supplies the exclusion
        correction (via ``exclusion_correction_of_r``) from a pair loop it
        already runs — the sweep path's fused-exception optimization."""
        q = self.effective_charge(params)
        lengths = jnp.diagonal(box)
        volume = jnp.prod(lengths)
        if self.kmax is not None:
            e_rec = self._reciprocal_factorized(q, x, lengths, volume)
        else:
            raise NotImplementedError(
                "fused exclusion path requires the factorized (kmax) form")
        return e_rec + self.self_energy(q)

    def energy(self, x, box, params=None):
        q = self.effective_charge(params)
        lengths = jnp.diagonal(box)
        volume = jnp.prod(lengths)
        two_pi = 2.0 * jnp.pi
        if self.kmax is not None:
            e_rec = self._reciprocal_factorized(q, x, lengths, volume)
        else:
            # k vectors in physical units (orthorhombic)
            k_phys = two_pi * self.kvecs / lengths[None, :]
            k2 = jnp.sum(k_phys * k_phys, axis=1)
            # phases: (n_k, N) = k . r  — MXU matmul
            phase = jnp.dot(k_phys, x.T, preferred_element_type=jnp.float32)
            c = jnp.dot(jnp.cos(phase), q,
                        preferred_element_type=jnp.float32)
            s = jnp.dot(jnp.sin(phase), q,
                        preferred_element_type=jnp.float32)
            s2 = c * c + s * s
            weight = jnp.exp(-k2 / (4.0 * self.alpha * self.alpha)) / k2
            e_rec = (ONE_4PI_EPS0 * (two_pi / volume)
                     * 2.0 * jnp.sum(weight * s2))
        return e_rec + self.self_exclusion_energy(q, x, box)


def make_ewald_reciprocal_term(charges, box_edge, cutoff,
                               exclusion_index,
                               tol: float = DEFAULT_EWALD_ERROR_TOLERANCE,
                               charge_scale_param=None) -> EwaldReciprocalTerm:
    alpha = ewald_alpha(cutoff, tol)
    n_max = ewald_kmax(alpha, box_edge, tol)
    kvecs = _half_space_kvectors((n_max, n_max, n_max))
    # numpy leaves: term construction is pure-host (no device buffers
    # before compute — VERDICT r3 weak #1); they bake into jitted programs
    # as compile-time constants.
    return EwaldReciprocalTerm(
        charge=np.asarray(charges, dtype=np.float32),
        kvecs=np.asarray(kvecs, dtype=np.float32),
        exclusion_index=np.asarray(exclusion_index, dtype=np.int32),
        alpha=float(alpha), charge_scale_param=charge_scale_param,
        kmax=n_max)
