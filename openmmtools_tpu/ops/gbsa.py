"""GBSA-OBC implicit solvent (OBC II) as a dense pairwise term.

TPU-native replacement for OpenMM's GBSAOBCForce kernels (used by the
reference's implicit-solvent test systems, testsystems.py:3352-4145, and
alchemically modified at alchemy.py:2144). Standard formulation
(Hawkins–Cramer–Truhlar descreening + Onufriev–Bashford–Case II rescaling):

  or_i  = radius_i - offset              (offset = 0.009 nm)
  I_i   = sum_j 0.5 [ 1/L - 1/U + (r - s_j^2/r)(1/U^2 - 1/L^2)/4
                      + ln(L/U)/(2r) ]   (U = r + s_j, L = max(or_i, |r - s_j|),
                                          s_j = screen_j * or_j; zero when
                                          or_i >= U)
  psi   = I_i * or_i
  1/B_i = 1/or_i - tanh(alpha psi - beta psi^2 + gamma psi^3) / radius_i
          (alpha, beta, gamma = 1, 0.8, 4.85)
  E_pol = -0.5 k_e (1/eps_solute - 1/eps_solvent)
          sum_ij q_i q_j / sqrt(r^2 + B_i B_j exp(-r^2/(4 B_i B_j)))
          (i = j term included: the Born self energy)
  E_np  = sum_i 28.3919551 (radius_i + 0.14)^2 (radius_i / B_i)^6   [kJ/mol]

The whole evaluation is dense (N, N) elementwise — VPU-friendly, O(N^2),
appropriate for implicit-solvent system sizes (10^2-10^4 atoms).
``lambda_name`` optionally scales the polar + nonpolar energy for alchemical
GB softening (alchemy.py:2144 semantics).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from openmmtools_tpu.constants import ONE_4PI_EPS0
from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field

OFFSET = 0.009          # nm dielectric offset
OBC1 = (0.8, 0.0, 2.909125)   # igb=2 constants
OBC2 = (1.0, 0.8, 4.85)       # igb=5 constants
ALPHA, BETA, GAMMA = 1.0, 0.8, 4.85
SURFACE_TENSION = 28.3919551  # kJ/mol/nm^2
PROBE = 0.14            # nm solvent probe radius


@pytree_dataclass
class GBSAOBCTerm:
    """OBC II generalized Born + ACE nonpolar term."""

    charge: jax.Array       # (N,)
    radius: jax.Array       # (N,) intrinsic Born radii, nm
    scale: jax.Array        # (N,) HCT screening factors
    solute_dielectric: float = static_field(default=1.0)
    solvent_dielectric: float = static_field(default=78.5)
    surface_area_energy: bool = static_field(default=True)
    # OBC rescaling constants: OBC II (igb=5) by default; OBC I (igb=2)
    # uses (0.8, 0.0, 2.909125)
    obc_alpha: float = static_field(default=ALPHA)
    obc_beta: float = static_field(default=BETA)
    obc_gamma: float = static_field(default=GAMMA)
    # HCT (igb=1): Born radii directly from the descreening integral with
    # no tanh rescaling (OpenMM GBSAHCTForce / reference TolueneImplicitHCT)
    hct: bool = static_field(default=False)
    # Alchemical softening (reference _alchemically_modify_GBSAOBCForce,
    # alchemy.py:2144): with per-particle flag a_i (``alchemical``) and
    # g_i = lambda a_i + (1 - a_i),
    #   * descreening contributions of atom j scale by g_j,
    #   * pair polar energy uses g_i q_i * g_j q_j,
    #   * the Born SELF energy scales LINEARLY: g_i q_i^2 / B_i,
    #   * the ACE surface term scales by g_i.
    # ``alchemical`` is None for non-alchemical terms; when the factory
    # marks the whole system it is an all-ones mask.
    lambda_name: Optional[str] = static_field(default=None)
    alchemical: Optional[jax.Array] = None   # (N,) 1.0 = alchemical atom
    force_group: int = static_field(default=0)

    @property
    def global_defaults(self) -> Dict[str, float]:
        return {} if self.lambda_name is None else {self.lambda_name: 1.0}

    def _g(self, params):
        """Per-particle alchemical scale g_i (None when not alchemical)."""
        if self.lambda_name is None or params is None \
                or self.lambda_name not in params:
            return None
        lam = params[self.lambda_name]
        if self.alchemical is None:
            a = jnp.ones_like(self.charge)
        else:
            a = self.alchemical
        return lam * a + (1.0 - a)

    def born_radii(self, x, g=None):
        n = x.shape[0]
        or_i = self.radius - OFFSET
        s_j = self.scale * or_i  # screened radii (per j)
        d = x[:, None, :] - x[None, :, :]
        r2 = jnp.sum(d * d, axis=-1)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        off_diag = row != col
        r = jnp.sqrt(jnp.where(off_diag, jnp.maximum(r2, 1e-12), 1.0))

        sj = s_j[None, :]
        oi = or_i[:, None]
        u = r + sj
        l = jnp.maximum(oi, jnp.abs(r - sj))
        # pairwise descreening integral; active only when the descreening
        # sphere pokes out of atom i's offset radius (oi < u)
        active = off_diag & (oi < u)
        l_safe = jnp.where(active, l, 1.0)
        u_safe = jnp.where(active, u, 1.0)
        r_safe = jnp.where(active, r, 1.0)
        inv_l = 1.0 / l_safe
        inv_u = 1.0 / u_safe
        term = (inv_l - inv_u
                + 0.25 * (r_safe - sj * sj / r_safe)
                * (inv_u * inv_u - inv_l * inv_l)
                + 0.5 * jnp.log(l_safe / u_safe) / r_safe)
        # close-contact correction when the descreening sphere engulfs
        # atom i entirely (OpenMM/reference: C = 2(1/or1 - 1/L)
        # * step(sr2 - r - or1); alchemy.py:2196)
        term = term + jnp.where(sj - r_safe - oi > 0.0,
                                2.0 * (1.0 / oi - inv_l), 0.0)
        pair = jnp.where(active, term, 0.0)
        if g is not None:
            pair = pair * g[None, :]
        i_sum = 0.5 * jnp.sum(pair, axis=1)

        if self.hct:
            inv_b = 1.0 / or_i - i_sum
            return 1.0 / jnp.maximum(inv_b, 1e-6)
        psi = i_sum * or_i
        tanh_arg = (self.obc_alpha * psi - self.obc_beta * psi**2
                    + self.obc_gamma * psi**3)
        inv_b = 1.0 / or_i - jnp.tanh(tanh_arg) / self.radius
        return 1.0 / jnp.maximum(inv_b, 1e-6)

    def energy(self, x, box, params=None):
        n = x.shape[0]
        g = self._g(params)
        b = self.born_radii(x, g=g)
        q = self.charge
        d = x[:, None, :] - x[None, :, :]
        r2 = jnp.sum(d * d, axis=-1)
        bb = b[:, None] * b[None, :]
        f_gb = jnp.sqrt(r2 + bb * jnp.exp(-r2 / (4.0 * bb)))
        prefactor = -0.5 * ONE_4PI_EPS0 * (
            1.0 / self.solute_dielectric - 1.0 / self.solvent_dielectric)
        qg = q if g is None else q * g
        qq = qg[:, None] * qg[None, :]
        if g is not None:
            # the self (diagonal) polar term scales linearly in g, not
            # quadratically (reference alchemy.py:2204)
            row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            qq = jnp.where(row == col, (g * q * q)[:, None]
                           * jnp.ones((1, n), q.dtype), qq)
        e_pol = prefactor * jnp.sum(qq / f_gb)
        e = e_pol
        if self.surface_area_energy:
            e_np = SURFACE_TENSION * (self.radius + PROBE) ** 2 \
                * (self.radius / b) ** 6
            if g is not None:
                e_np = e_np * g
            e = e + jnp.sum(e_np)
        return e
