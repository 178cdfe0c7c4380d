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

DEFAULT_EWALD_ERROR_TOLERANCE = 5e-4  # reference testsystems.py default


def ewald_alpha(cutoff: float, tol: float = DEFAULT_EWALD_ERROR_TOLERANCE
                ) -> float:
    """OpenMM's alpha heuristic: sqrt(-ln(2 tol)) / cutoff."""
    return math.sqrt(-math.log(2.0 * tol)) / cutoff


def ewald_kmax(alpha: float, box_edge: float,
               tol: float = DEFAULT_EWALD_ERROR_TOLERANCE) -> int:
    """Number of reciprocal lattice shells per axis."""
    return max(1, int(math.ceil(alpha * box_edge
                                * math.sqrt(-math.log(2.0 * tol)) / math.pi)))


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
        cos/sin on the VPU.  Sum over the FULL k-box (±k both included, so
        no half-space factor 2); k = 0 masked by its weight.
        """
        M = int(self.kmax)
        two_pi = 2.0 * jnp.pi
        dtype = x.dtype
        mj = jnp.arange(-M, M + 1, dtype=dtype)   # iota, not a constant

        def P(coord, L):
            th = (two_pi / L) * coord[:, None] * mj[None, :]   # (N, K)
            return jax.lax.complex(jnp.cos(th), jnp.sin(th))

        # one einsum: XLA picks the pairwise contraction path (staged
        # through an (N, K, K) intermediate onto the MXU).  Deliberately
        # NOT hand-staged via reshape+matmul: the axon TPU backend
        # miscompiles the reshape-of-padded-3D + dot composition
        # (verified: hand-staged s2 grids off by O(1) relative, einsum
        # matches an f64 reference to 5e-6 median).
        S = jnp.einsum(
            'n,nx,ny,nz->xyz',
            jax.lax.complex(q, jnp.zeros_like(q)),
            P(x[:, 0], lengths[0]), P(x[:, 1], lengths[1]),
            P(x[:, 2], lengths[2]),
            precision=jax.lax.Precision.HIGHEST)
        s2 = jnp.real(S) ** 2 + jnp.imag(S) ** 2

        m = mj
        k_ax = [two_pi * m / lengths[c] for c in range(3)]
        k2 = (k_ax[0][:, None, None] ** 2 + k_ax[1][None, :, None] ** 2
              + k_ax[2][None, None, :] ** 2)
        inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.maximum(k2, 1e-12), 0.0)
        weight = jnp.exp(-k2 / (4.0 * self.alpha * self.alpha)) * inv_k2
        return (ONE_4PI_EPS0 * (two_pi / volume)
                * jnp.sum(weight * s2))

    def energy(self, x, box, params=None):
        q = self.charge
        if (self.charge_scale_param is not None and params is not None
                and self.charge_scale_param in params):
            q = q * params[self.charge_scale_param]
        if (self.lambda_name is not None and self.alch_mask is not None
                and params is not None and self.lambda_name in params):
            # 'exact-PME' alchemical treatment (alchemy.py:1664-1683): the
            # alchemical particles' charges scale linearly with lambda in
            # BOTH direct and reciprocal space
            lam = params[self.lambda_name]
            q = q * (1.0 + (lam - 1.0) * self.alch_mask)
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
        # self energy
        e_self = -ONE_4PI_EPS0 * self.alpha / jnp.sqrt(jnp.pi) * jnp.sum(q * q)
        # exclusion corrections: remove erf(alpha r)/r for excluded pairs
        e_excl = jnp.zeros((), dtype=x.dtype)
        if self.exclusion_index.shape[0] > 0:
            i = self.exclusion_index[:, 0]
            j = self.exclusion_index[:, 1]
            # barrier: keep the row gathers un-fused from the erf chain —
            # XLA's fused gather+compute loop serializes on TPU (measured
            # 33 ms vs 0.04 ms for 35k pairs)
            xi, xj = jax.lax.optimization_barrier((x[i], x[j]))
            d = xi - xj
            d = d - lengths * jnp.round(d / lengths)
            r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=1), 1e-12))
            e_excl = -ONE_4PI_EPS0 * jnp.sum(
                q[i] * q[j] * jax.scipy.special.erf(self.alpha * r) / r)
        return e_rec + e_self + e_excl


def make_ewald_reciprocal_term(charges, box_edge, cutoff,
                               exclusion_index,
                               tol: float = DEFAULT_EWALD_ERROR_TOLERANCE,
                               charge_scale_param=None) -> EwaldReciprocalTerm:
    alpha = ewald_alpha(cutoff, tol)
    n_max = ewald_kmax(alpha, box_edge, tol)
    kvecs = _half_space_kvectors((n_max, n_max, n_max))
    return EwaldReciprocalTerm(
        charge=jnp.asarray(charges, dtype=jnp.float32),
        kvecs=jnp.asarray(kvecs, dtype=jnp.float32),
        exclusion_index=jnp.asarray(exclusion_index, dtype=jnp.int32),
        alpha=float(alpha), charge_scale_param=charge_scale_param,
        kmax=n_max)
