"""Heterogeneous bounded-sweep nonbonded force kernel (Pallas, TPU).

The production direct-space path for LARGE periodic systems (DHFR scale:
23.5k atoms) — the role OpenMM's neighbor-list + direct-space kernels play
(SURVEY.md §2.2 row 1; reference testsystems.py:3863 DHFRExplicit).

Same architecture as the sorted bounded sweep of ops/pallas_baoab.py
(x-sorted particles, half-shell roll sweep with a measured interaction-
range bound, adaptive Verlet rebuild), generalized to real force fields:

* per-particle LJ parameters with Lorentz–Berthelot combination
  (sigma_ij = (s_i+s_j)/2, eps_ij = sqrt(e_i e_j) via pre-square-rooted
  per-particle values) — parameter staircases ride the same static rolls
  as the coordinates;
* Coulomb: PME/Ewald direct space qq·erfc(a r)/r (Abramowitz–Stegun
  7.1.26 rational erfc, |err| < 1.5e-7 — full-rate VPU ops instead of a
  transcendental per pair) or reaction field qq(1/r + k_rf r^2 - c_rf)
  (ops/nonbonded.py:61 semantics);
* exception-pair masking via a per-shell bitfield: pair (i, i+s) in
  sorted order is masked when bit (s-1) of the (mask_shells/32, N) int32
  plane is set.  Exceptions REPLACE the standard interaction (OpenMM
  semantics, system.py:146) and are added back by the caller from the
  explicit exception list — masking instead of subtracting avoids the
  catastrophic f32 cancellation of (sigma/r)^12 at bonded distances that
  the dense path suffers;
* padded ring lanes are poisoned to huge coordinates with zero
  charge/epsilon instead of masked — no validity plane, no extra ops.

The kernel is a FORCE EVALUATOR (one sweep per call), not an integrator:
constraints, bonded terms, reciprocal space and the splitting DSL all run
in XLA around it (integrators/langevin.py sweep mode), so any splitting /
constraint combination works at production sizes.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmmtools_tpu.constants import ONE_4PI_EPS0
from openmmtools_tpu.ops.pallas_baoab import _fast_rsqrt, _round_up

__all__ = ["SweepNonbonded", "build_exclusion_bitfield", "sort_for_sweep"]


def _fast_recip_pos(w):
    """1/w for w > 0 via rsqrt(w^2) (full-rate VPU ops)."""
    return _fast_rsqrt(w * w)


class SweepNonbonded:
    """Compiled bounded-sweep force program for one NonbondedTerm config.

    Static per instance: method, cutoff, switch, dielectric, alpha,
    particle count.  Runtime inputs: sorted coordinates/parameters, box,
    exclusion bitfield, rebuild flag and current block bound.
    """

    def __init__(self, n_particles, method, cutoff, switch_width=None,
                 dielectric=78.3, ewald_alpha=None, shift_rf=True,
                 switch_coulomb=False, shell_block=8, skin=0.1,
                 mask_shells=2048, alchemical=False, n_regions=None,
                 coulomb_pme_treatment=False, interpret=False):
        if method not in ("pme", "ewald", "cutoff_periodic"):
            raise ValueError(f"sweep kernel: unsupported method {method!r}")
        self.n = int(n_particles)
        self.n_pad = _round_up(self.n, 128)
        self.method = method
        self.rc = float(cutoff)
        self.switch_width = (None if switch_width is None
                             else float(switch_width))
        self.dielectric = float(dielectric)
        self.alpha = None if ewald_alpha is None else float(ewald_alpha)
        self.shift_rf = bool(shift_rf)
        self.switch_coulomb = bool(switch_coulomb)
        self.bs = int(shell_block)
        self.skin = float(skin)
        self.mask_shells = int(mask_shells)
        if self.mask_shells % 32:
            raise ValueError("mask_shells must be a multiple of 32")
        self.mask_rows = self.mask_shells // 32
        # alchemical variant (single region, softcore_beta = 0, c = 6 —
        # the reference defaults, alchemy.py softcore constants): the
        # param plane carries a 4th row (0/1 alchemical flag) and the
        # kernel receives 6 per-class scalars precomputed host-side:
        # [lam_s_na, lam_s_aa, asc_na, asc_aa, lam_e_na, lam_e_aa] where
        # asc = softcore_alpha*(1-lam_s)^b and the _aa entries encode the
        # annihilate flags (non-annihilated intra-region pairs scale by 1)
        self.alchemical = bool(alchemical) or bool(n_regions)
        # multi-region (round-5, VERDICT r4 item 6): the param plane's 4th
        # row carries a region CODE g = region_id + 1 (0 = environment).
        # Each unordered region-pair class {a, b} (0 <= a <= b <= R,
        # excluding env-env which is the identity) gets its own
        # (lam_s, asc, lam_e) scalar triple, computed host-side from the
        # factory's effective pair lambda (na: lam_r; same-region:
        # lam_r if annihilating else 1; cross: lam_a*lam_b, or 0 when the
        # region pair is not in region_interactions). The kernel
        # identifies a pair's class from the symmetric invariants
        # (g_i + g_j, g_i * g_j), which determine {a, b} uniquely — no
        # gathers, just compares. R = 1 keeps the cheaper 0/1-flag
        # dispatch (2 compares, no product).
        self.n_regions = (int(n_regions) if n_regions is not None
                          else (1 if self.alchemical else 0))
        if self.n_regions > 0:
            self.alchemical = True
        R = self.n_regions
        self._alch_classes = tuple(
            (a, b) for a in range(R + 1) for b in range(a, R + 1))[1:]
        self.n_lam = 3 * len(self._alch_classes) if self.alchemical else 6
        self.coulomb_pme_treatment = bool(coulomb_pme_treatment)
        self.n_par = 4 if self.alchemical else 3
        self.interpret = bool(interpret)
        self.n_blocks = -(-(self.n_pad // 2) // self.bs)
        self._call = None

    # -- in-kernel bound measurement -----------------------------------------

    def _measure_bound(self, x, L, refs):
        """Distance-only bound sweep over ALL shell-blocks: writes
        1 + (last block with any pair at r^2 <= (rc+skin)^2 on a valid
        shell) into refs['nblk_sm'].

        Same role as FusedSortedLangevin._measure_bound: a full *force*
        sweep at rebuild costs ~n_blocks/bound times a bounded one
        (~8x at DHFR), while this pass needs only the r^2 chain (~1/4
        the per-block ops) — the force sweep that follows then runs at
        the fresh bound. Conservative exactly like the old in-force
        tracking: exception pairs inside rc+skin still extend the bound.
        """
        n = self.n_pad
        bs = self.bs
        half = n // 2
        n_blocks = self.n_blocks
        dtype = x.dtype
        w2 = (self.rc + self.skin) ** 2
        xj_ref = refs["xj"]

        Lc = [L[c, 0] for c in range(3)]
        halfL = [0.5 * Lc[c] for c in range(3)]

        s0_top = 1 + (n_blocks - 1) * bs
        back_top = jnp.mod(n - s0_top, n)
        for c in range(3):
            row = x[c:c + 1, :]
            stair_c = jnp.concatenate(
                [pltpu.roll(row, (n - k) % n, axis=1) for k in range(bs)],
                axis=0)
            xj_ref[c * bs:(c + 1) * bs, :] = pltpu.roll(stair_c, back_top,
                                                        axis=1)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)

        def body(i, last_active):
            it = n_blocks - 1 - i
            s0 = 1 + it * bs
            valid_row = (s0 + row_iota) <= half
            r2 = None
            for c in range(3):
                sl = slice(c * bs, (c + 1) * bs)
                dc = x[c:c + 1, :] - xj_ref[sl, :]
                dc = dc + jnp.where(dc < -halfL[c], Lc[c],
                                    jnp.zeros((), dtype))
                dc = dc - jnp.where(dc > halfL[c], Lc[c],
                                    jnp.zeros((), dtype))
                r2 = dc * dc if r2 is None else r2 + dc * dc
                xj_ref[sl, :] = pltpu.roll(xj_ref[sl, :], bs, axis=1)
            active = jnp.any((r2 <= w2) & (r2 > 1e-12) & valid_row)
            return jnp.maximum(last_active, jnp.where(active, it, -1))

        last_active = jax.lax.fori_loop(0, n_blocks, body, jnp.int32(-1))
        refs["nblk_sm"][0] = last_active + 1

    # -- in-kernel pair sweep ----------------------------------------------

    def _sweep(self, x, par, L, excl_ref, lam, n_blk, refs):
        n = self.n_pad
        bs = self.bs
        half = n // 2
        rc2 = self.rc * self.rc
        dtype = x.dtype
        ke = ONE_4PI_EPS0
        n_par = self.n_par

        Lc = [L[c, 0] for c in range(3)]
        halfL = [0.5 * Lc[c] for c in range(3)]
        xj_ref = refs["xj"]      # (3*bs, n) coordinate staircase
        pj_ref = refs["pj"]      # (n_par*bs, n) param staircase
        accP = refs["accP"]
        accA = refs["accA"]
        accE = refs["accE"]

        sig_row = par[0:1, :]
        se_row = par[1:2, :]
        q_row = par[2:3, :]
        keq_row = ke * q_row     # hoisted: one multiply for all blocks
        if self.alchemical:
            a_row = par[3:4, :]   # region code g = region_id + 1 (0 = env)
            n_cls = len(self._alch_classes)
            if self.n_regions == 1:
                lam_s_na, lam_s_aa = lam[0], lam[1]
                asc_na, asc_aa = lam[2], lam[3]
                lam_e_na, lam_e_aa = lam[4], lam[5]

        # seed staircases at the TOP block (the sweep's only dynamic rolls)
        s0_top = 1 + (n_blk - 1) * bs
        back_top = jnp.mod(n - s0_top, n)
        for c in range(3):
            row = x[c:c + 1, :]
            stair_c = jnp.concatenate(
                [pltpu.roll(row, (n - k) % n, axis=1) for k in range(bs)],
                axis=0)
            xj_ref[c * bs:(c + 1) * bs, :] = pltpu.roll(stair_c, back_top,
                                                        axis=1)
        for c in range(n_par):
            row = par[c:c + 1, :]
            stair_c = jnp.concatenate(
                [pltpu.roll(row, (n - k) % n, axis=1) for k in range(bs)],
                axis=0)
            pj_ref[c * bs:(c + 1) * bs, :] = pltpu.roll(stair_c, back_top,
                                                        axis=1)

        accP[:, :] = jnp.zeros((3 * bs, n), dtype)
        accA[:, :] = jnp.zeros((3 * bs, n), dtype)
        accE[:, :] = jnp.zeros((bs, n), dtype)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
        blocks_per_word = 32 // bs
        # dynamic exclusion coverage: the highest bitfield word with any
        # bit set bounds the exception-pair sorted separation — blocks
        # beyond it skip the bit-extraction math entirely (split loop
        # below). One (R, n) reduction per sweep; at DHFR the static cap
        # (mask_shells/bs = 256 blocks) covers ~half the sweep while the
        # measured separation covers a few percent.
        word_nz = jnp.sum(
            (excl_ref[:, :] != 0).astype(jnp.float32), axis=1, keepdims=True)
        word_iota = jax.lax.broadcasted_iota(
            jnp.int32, (self.mask_rows, 1), 0).astype(jnp.float32)
        rows_used = jnp.max(
            jnp.where(word_nz > 0, word_iota + 1.0, 0.0)).astype(jnp.int32)
        mask_block_cap = rows_used * blocks_per_word  # dynamic, traced

        if self.method in ("pme", "ewald"):
            alpha = self.alpha
        else:
            k_rf = ((1.0 / self.rc ** 3) * (self.dielectric - 1.0)
                    / (2.0 * self.dielectric + 1.0))
            c_rf = ((1.0 / self.rc) * (3.0 * self.dielectric)
                    / (2.0 * self.dielectric + 1.0)) if self.shift_rf else 0.0

        def make_body(with_excl):
          def body(i, _):
            it = n_blk - 1 - i
            s0 = 1 + it * bs
            srow = s0 + row_iota
            wrow = jnp.where(
                srow < half, jnp.ones((), dtype),
                jnp.where(srow == half, jnp.full((), 0.5, dtype),
                          jnp.zeros((), dtype)))

            d = []
            r2 = None
            for c in range(3):
                dc = x[c:c + 1, :] - xj_ref[c * bs:(c + 1) * bs, :]
                dc = dc + jnp.where(dc < -halfL[c], Lc[c],
                                    jnp.zeros((), dtype))
                dc = dc - jnp.where(dc > halfL[c], Lc[c],
                                    jnp.zeros((), dtype))
                d.append(dc)
                r2 = dc * dc if r2 is None else r2 + dc * dc

            pair_ok = r2 > 1e-12
            mask = (r2 < rc2) & pair_ok

            if with_excl:
                # exception-pair bits for this block's shells (s0..s0+bs-1):
                # word row (s0-1)//32, bit offset (s0-1)%32 + k
                word_idx = jnp.minimum((s0 - 1) // 32, self.mask_rows - 1)
                word = excl_ref[pl.ds(word_idx, 1), :]      # (1, n) int32
                bit_off = (s0 - 1) % 32 + row_iota          # (bs, 1)
                bits = jax.lax.shift_right_logical(
                    jnp.broadcast_to(word, (bs, n)),
                    jnp.broadcast_to(bit_off, (bs, n))) & 1
                excluded = (bits == 1) & (it < mask_block_cap)
                mask = mask & jnp.logical_not(excluded)

            inv_r = jnp.where(mask, _fast_rsqrt(r2), jnp.zeros((), dtype))
            inv_r2 = inv_r * inv_r
            r = r2 * inv_r

            if self.alchemical:
                gj = pj_ref[3 * bs:4 * bs, :]
                nn_a = a_row + gj
                one = jnp.ones((), dtype)
                zero = jnp.zeros((), dtype)
                if self.n_regions == 1:
                    # per-pair lambda class from the 0/1 codes: 0 alch
                    # particles -> environment (scale 1), 1 -> na scalars,
                    # 2 -> aa scalars (annihilate baked into _aa values)
                    is1 = nn_a == 1.0
                    is2 = nn_a > 1.5
                    lam_s_p = jnp.where(is1, lam_s_na,
                                        jnp.where(is2, lam_s_aa, one))
                    asc_p = jnp.where(is1, asc_na,
                                      jnp.where(is2, asc_aa, zero))
                    lam_e_p = jnp.where(is1, lam_e_na,
                                        jnp.where(is2, lam_e_aa, one))
                else:
                    # generic multi-region: {g_i, g_j} is determined by
                    # the symmetric invariants (sum, product); env-env
                    # pairs keep the identity defaults
                    pp_a = a_row * gj
                    lam_s_p = jnp.broadcast_to(one, nn_a.shape)
                    asc_p = jnp.broadcast_to(zero, nn_a.shape)
                    lam_e_p = jnp.broadcast_to(one, nn_a.shape)
                    for ci, (ga, gb) in enumerate(self._alch_classes):
                        sel = ((nn_a == float(ga + gb))
                               & (pp_a == float(ga * gb)))
                        lam_s_p = jnp.where(sel, lam[ci], lam_s_p)
                        asc_p = jnp.where(sel, lam[n_cls + ci], asc_p)
                        lam_e_p = jnp.where(sel, lam[2 * n_cls + ci],
                                            lam_e_p)

            # LJ with Lorentz-Berthelot combination
            sig = 0.5 * (sig_row + pj_ref[0 * bs:1 * bs, :])
            eps = se_row * pj_ref[1 * bs:2 * bs, :]
            s2 = (sig * sig) * inv_r2
            s6 = s2 * s2 * s2
            if self.alchemical:
                # softcore (beta = 0, c = 6): x = 1/(a(1-l)^b + (r/sig)^6)
                #                               = s6/(asc*s6 + 1)
                # e = 4 eps l (x^2 - x);  w = 24 eps l (2x-1) x/(den r^2)
                # reduces exactly to the standard LJ at lambda = 1.
                # clamp s6: at deep overlap (possible at small lambda)
                # den^2 would overflow inside the rsqrt-based reciprocal;
                # at s6 = 1e18 the softcore limit x -> 1/asc is already
                # exact to f32, so the clamp changes nothing physical
                s6 = jnp.minimum(s6, 1e18)
                den = asc_p * s6 + 1.0
                inv_den = _fast_recip_pos(den)
                xsc = s6 * inv_den
                el4 = (4.0 * eps) * lam_s_p
                e_lj = el4 * (xsc * xsc - xsc)
                w_lj = (6.0 * el4) * (2.0 * xsc - 1.0) * xsc \
                    * inv_den * inv_r2
            else:
                s12 = s6 * s6
                e_lj = 4.0 * eps * (s12 - s6)
                w_lj = eps * (48.0 * s12 - 24.0 * s6) * inv_r2

            # Coulomb
            qq = keq_row * pj_ref[2 * bs:3 * bs, :]
            if self.method in ("pme", "ewald"):
                z = alpha * r
                ez = jnp.exp(-z * z)
                t = _fast_recip_pos(1.0 + 0.3275911 * z)
                poly = t * (0.254829592 + t * (-0.284496736 + t * (
                    1.421413741 + t * (-1.453152027 + t * 1.061405429))))
                erfc = poly * ez
                e_c = qq * erfc * inv_r
                w_c = qq * inv_r2 * (erfc * inv_r
                                     + (2.0 * alpha / math.sqrt(math.pi)) * ez)
                if self.alchemical and self.coulomb_pme_treatment:
                    # 'coulomb' PME treatment: alchemically-involved
                    # pairs use the plain Coulomb kernel in direct space
                    inv_involved = nn_a > 0.5
                    e_c = jnp.where(inv_involved, qq * inv_r, e_c)
                    w_c = jnp.where(inv_involved, qq * inv_r2 * inv_r, w_c)
            else:
                e_c = qq * (inv_r + k_rf * r2 - c_rf)
                w_c = qq * (inv_r2 * inv_r - 2.0 * k_rf)
            if self.alchemical:
                e_c = e_c * lam_e_p
                w_c = w_c * lam_e_p

            if self.switch_width is not None:
                rs = self.rc - self.switch_width
                inv_span = 1.0 / self.switch_width
                tt = jnp.clip((r - rs) * inv_span, 0.0, 1.0)
                S = 1.0 + tt * tt * tt * (-10.0 + tt * (15.0 - 6.0 * tt))
                omt = 1.0 - tt
                dS = (-30.0 * inv_span) * (tt * tt) * (omt * omt)
                if self.switch_coulomb:
                    e_sw = e_lj + e_c
                    w_sw = w_lj + w_c
                    w = w_sw * S - e_sw * dS * inv_r
                    e = e_sw * S
                else:
                    w = w_lj * S - e_lj * dS * inv_r + w_c
                    e = e_lj * S + e_c
            else:
                e = e_lj + e_c
                w = w_lj + w_c
            # inv_r == 0 on masked slots kills LJ/1/r terms but NOT the
            # r2-polynomial RF part — apply the mask to e/w explicitly
            zero = jnp.zeros((), dtype)
            e = jnp.where(mask, e, zero) * wrow
            w = jnp.where(mask, w, zero) * wrow

            accE[:, :] = accE[:, :] + e
            for c in range(3):
                sl = slice(c * bs, (c + 1) * bs)
                g = w * d[c]
                accP[sl, :] = accP[sl, :] + g
            accA[:, :] = pltpu.roll(accA[:, :], bs, axis=1) + jnp.concatenate(
                [w * d[c] for c in range(3)], axis=0)
            xj_ref[:, :] = pltpu.roll(xj_ref[:, :], bs, axis=1)
            pj_ref[:, :] = pltpu.roll(pj_ref[:, :], bs, axis=1)
            return 0

          return body

        # split loop: blocks are swept high-shell -> low-shell (it = n_blk-1-i)
        # and only the LAST `mask_block_cap` blocks (lowest shells) can hold
        # exception bits — the rest run an exclusion-free body. Staircase
        # rolls carry across both loops (i is continuous).
        split = n_blk - jnp.minimum(mask_block_cap, n_blk)
        jax.lax.fori_loop(0, split, make_body(False), 0)
        jax.lax.fori_loop(split, n_blk, make_body(True), 0)

        refs["u_sm"][0] = jnp.sum(accE[:, :])
        F_rows = []
        for c in range(3):
            sl = slice(c * bs, (c + 1) * bs)
            fplus = jnp.sum(accP[sl, :], axis=0, keepdims=True)
            fminus = jnp.zeros((1, n), dtype)
            for k in range(bs):
                fminus = fminus + pltpu.roll(
                    accA[c * bs + k:c * bs + k + 1, :], k + 1, axis=1)
            F_rows.append(fplus - fminus)
        refs["F"][:, :] = jnp.concatenate(F_rows, axis=0)

    # -- kernel body --------------------------------------------------------

    def _kernel(self, meta_ref, lam_ref, L_ref, x_in, par_in, excl_in,
                f_out, u_out, nblk_out,
                xj, pj, accP, accA, accE, u_sm, nblk_sm):
        n = self.n_pad
        refs = {"xj": xj, "pj": pj, "accP": accP, "accA": accA,
                "accE": accE, "F": f_out, "u_sm": u_sm, "nblk_sm": nblk_sm}
        L = L_ref[:]
        x = x_in[:]
        par = par_in[:]
        lam = tuple(lam_ref[i] for i in range(self.n_lam))  # SMEM scalars
        rebuild = meta_ref[0] != 0
        bound_in = meta_ref[1]
        nblk_sm[0] = bound_in

        # rebuild: cheap distance-only pass over ALL blocks re-measures the
        # bound; the force sweep below then always runs bounded (a full
        # force sweep at rebuild cost ~n_blocks/bound ~ 8x a bounded one
        # at DHFR; the measure pass is ~1/4 per block on top of 1x bounded)
        @pl.when(rebuild)
        def _():
            self._measure_bound(x, L, refs)

        self._sweep(x, par, L, excl_in, lam, nblk_sm[0], refs)

        u_out[:, :] = u_sm[0][None, None]
        nblk_out[:, :] = nblk_sm[0].astype(jnp.float32)[None, None]

    def _build(self):
        if self._call is not None:
            return self._call
        n = self.n_pad
        bs = self.bs
        call = pl.pallas_call(
            self._kernel,
            out_shape=(
                jax.ShapeDtypeStruct((3, n), jnp.float32),   # F
                jax.ShapeDtypeStruct((1, 1), jnp.float32),   # U direct
                jax.ShapeDtypeStruct((1, 1), jnp.float32),   # nblk out
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # meta (flag, bound)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # lam (6,) f32
                pl.BlockSpec(memory_space=pltpu.VMEM),   # L (3,1)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x (3,n)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # par (n_par,n)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # excl (R,n) int32
            ],
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(3)),
            scratch_shapes=[
                pltpu.VMEM((3 * bs, n), jnp.float32),    # xj
                pltpu.VMEM((self.n_par * bs, n), jnp.float32),   # pj
                pltpu.VMEM((3 * bs, n), jnp.float32),    # accP
                pltpu.VMEM((3 * bs, n), jnp.float32),    # accA
                pltpu.VMEM((bs, n), jnp.float32),        # accE
                pltpu.SMEM((1,), jnp.float32),           # u_sm
                pltpu.SMEM((1,), jnp.int32),             # nblk_sm
            ],
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        self._call = call
        return call

    # -- traceable host-facing op ------------------------------------------

    def forces(self, x_sorted, par_sorted, box, excl, rebuild, bound,
               lam=None):
        """One force evaluation (traceable; call inside jit).

        x_sorted: (n_pad, 3) sorted+wrapped positions with poisoned pad
        par_sorted: (n_pad, n_par) [sigma, sqrt_eps, charge(, alch_flag)]
            sorted, 0 pad
        excl: (mask_rows, n_pad) int32 exception bitfield
        rebuild: () bool — sweep all shells and re-measure the bound
        bound: () int32 — current block bound (used when not rebuilding)
        lam: (n_lam,) f32 per-class alchemical scalars, grouped
            [lam_s x C, asc x C, lam_e x C] over the region-pair classes
            in self._alch_classes order (R = 1: [lam_s_na, lam_s_aa,
            asc_na, asc_aa, lam_e_na, lam_e_aa]); required when
            self.alchemical

        Returns (F (n_pad, 3), U (), new_bound ()).
        """
        call = self._build()
        meta = jnp.stack([rebuild.astype(jnp.int32),
                          bound.astype(jnp.int32)])
        if lam is None:
            lam = jnp.zeros((self.n_lam,), jnp.float32)
        L = jnp.diagonal(box).astype(jnp.float32).reshape(3, 1)
        f, u, nb = call(meta, lam.astype(jnp.float32), L,
                        x_sorted.T.astype(jnp.float32),
                        par_sorted.T.astype(jnp.float32), excl)
        new_bound = jnp.where(rebuild, nb[0, 0].astype(jnp.int32), bound)
        return f.T, u[0, 0], new_bound


# ---------------------------------------------------------------------------
# host/XLA-side helpers (traceable)
# ---------------------------------------------------------------------------


def sort_for_sweep(x, box, n_pad):
    """Wrap + x-sort positions; returns (perm, inv_perm).

    perm maps sorted slot -> original index; inv_perm the reverse.
    """
    n = x.shape[0]
    L = jnp.diagonal(box)
    xw = x - L * jnp.floor(x / L)
    perm = jnp.argsort(xw[:, 0]).astype(jnp.int32)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv


def build_exclusion_bitfield(pairs, inv_perm, n_pad, mask_rows):
    """Scatter exception pairs into the per-shell bitfield for the current
    sorted order.  Returns (bitfield (mask_rows, n_pad) int32, max_sep ())
    — the caller must check max_sep <= 32*mask_rows (it cannot exceed it
    for physically bonded pairs at sane densities; checked per resort,
    surfaced via the sticky ``sweep_overflow`` flag).

    Pairs whose sorted separation exceeds the bitfield coverage are
    DROPPED (out-of-range scatter index, mode='drop') rather than clamped:
    a clamped bit would both leave the real exception unmasked and corrupt
    an unrelated shell of another particle (ADVICE round-2 item 2).  The
    returned max_sep still reports the overflow so callers can raise.
    """
    if pairs.shape[0] == 0:
        return (jnp.zeros((mask_rows, n_pad), jnp.int32),
                jnp.zeros((), jnp.int32))
    # dedupe canonicalized (min,max) pairs: the scatter below uses .add, so
    # a duplicate exception — or the same pair listed both ways — would
    # CARRY into a higher bit, masking the wrong shell while leaving the
    # real exception unmasked (ADVICE round-3). Pairs come from the static
    # system pytree (numpy), so this is a one-time host-side pass per trace;
    # under a traced-pairs call (not used anywhere) dedupe is skipped.
    try:
        p = np.sort(np.asarray(pairs), axis=1)
        pairs = np.unique(p, axis=0)
    except jax.errors.TracerArrayConversionError:
        pass
    si = inv_perm[pairs[:, 0]]
    sj = inv_perm[pairs[:, 1]]
    sep = jnp.mod(sj - si, n_pad)
    flip = sep > n_pad // 2
    lane = jnp.where(flip, sj, si)
    sep = jnp.where(flip, n_pad - sep, sep)
    word = (sep - 1) // 32   # >= mask_rows (out of bounds) when overflowing
    bit = (sep - 1) % 32
    field = jnp.zeros((mask_rows, n_pad), jnp.int32)
    field = field.at[word, lane].add(
        jax.lax.shift_left(jnp.int32(1), bit), mode="drop")
    return field, jnp.max(sep).astype(jnp.int32)
