"""Cell-pair tiled nonbonded evaluator — the MXU experiment (VERDICT r3 #3).

The sorted-ring sweep kernel (ops/pallas_baoab.py, ops/sweep_nb.py) is a
pure-VPU design: its per-particle sweep bound grows as N^(2/3) at fixed
density (bound ~ N*rc/L) and its roofline is the v5e VPU's ~3.8 Tf/s.
This module tests the alternative the round-3 judge asked to be measured:
a CELL-PAIR tiling in which the periodic minimum-image shift is CONSTANT
per cell pair, so the r^2 tile can be formed as batched matmuls on the
MXU with no per-pair image fixup, and — the part that matters just as
much — the force reduction itself becomes a matmul with contraction
dimension C (MXU-friendly):

    F_i = x_i * rowsum(W) - W @ X_j,     W_ij = -2 dU/d(r^2)|_ij

Design (all-XLA, no Pallas):

* The box is split into a static (ncx, ncy, ncz) grid of cells with edge
  >= cutoff + skin; each cell holds up to ``capacity`` particle slots.
  State lives in cell layout (ncx, ncy, ncz, C, 3) between rebuilds —
  the per-step hot loop contains NO gathers or scatters; every partner
  cell is addressed by a STATIC ``jnp.roll`` over the grid axes, and the
  periodic wrap enters as a per-cell constant shift vector (the judge's
  observation: constant per cell pair, unlike the sorted ring where the
  y/z image correction is per-pair).
* Positions are stored CELL-LOCAL (relative to each cell's center): the
  matmul form |xi|^2 + |xj|^2 - 2 xi.xj then subtracts numbers of size
  ~cell_edge^2 instead of ~L^2, keeping f32 (and 3-pass-bf16 matmul)
  r^2 error ~1e-6 relative — measured; global coordinates would lose
  ~4 digits to cancellation.
* Half-neighborhood: the 13 lexicographically-positive offsets plus the
  self cell (i<j mask); both members of each unordered pair receive
  their force via the inverse (static) roll.
* ``r2_mode``: 'vpu' forms the three (.., C, C) displacement planes
  elementwise (VPU; exact f32); 'mxu' uses the norm+cross-matmul form at
  ``precision=HIGHEST`` (3-pass bf16 ~ f32). Both share the same W(r^2)
  and force-matmul structure.

Scope: monodisperse uncharged LJ with the OpenMM quintic switch — the
flagship bench configuration (BASELINE configs 1-2); functional forms
identical to ops/pair_forces.py. Exclusions/charges are out of scope for
the experiment (see ROADMAP round-4 findings for the measured verdict).

Reference capability: OpenMM's fused GPU nonbonded tile kernels
(SURVEY.md §2.2 row 1 — external C++/CUDA).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CellPairLJ", "CellState"]


class CellState(NamedTuple):
    """MD state in cell layout. Arrays are (ncx, ncy, ncz, C, ...)."""

    xloc: jax.Array      # (nx, ny, nz, C, 3) f32 — positions, cell-local
    v: jax.Array         # (nx, ny, nz, C, 3) f32 — velocities
    valid: jax.Array     # (nx, ny, nz, C) bool — slot occupied
    gid: jax.Array       # (nx, ny, nz, C) i32 — original particle index
    overflow: jax.Array  # () bool — some cell exceeded capacity (dropped)


# the 13 lexicographically-positive neighbor offsets (half neighborhood)
_HALF_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
    if (dz > 0) or (dz == 0 and dy > 0) or (dz == 0 and dy == 0 and dx > 0)
]
assert len(_HALF_OFFSETS) == 13


class CellPairLJ:
    def __init__(self, n_particles, box_diag, cutoff, switch_width,
                 sigma, epsilon, *, skin=0.12, capacity=None,
                 r2_mode="mxu"):
        self.n = int(n_particles)
        L = np.asarray(box_diag, np.float64).reshape(3)
        self.L = L.astype(np.float32)
        edge_min = float(cutoff) + float(skin)
        nc = np.maximum(3, np.floor(L / edge_min).astype(int))
        if np.any(L / nc < cutoff):
            raise ValueError("box too small for a 3^3 cell grid at this "
                             "cutoff; use the dense/sweep paths")
        self.nc = tuple(int(c) for c in nc)
        self.edge = (L / nc).astype(np.float32)          # (3,)
        self.cutoff = float(cutoff)
        self.switch_width = None if switch_width is None else float(switch_width)
        self.sigma = float(sigma)
        self.epsilon = float(epsilon)
        self.r2_mode = r2_mode
        n_cells = int(np.prod(nc))
        if capacity is None:
            # mean occupancy x4 headroom, sublane-aligned; condensed-phase
            # systems should pass an explicit liquid-density capacity
            capacity = int(np.ceil(self.n / n_cells * 4 / 8)) * 8
        self.capacity = max(8, int(capacity))
        # per-cell centers, shape (nx, ny, nz, 3) — numpy, bakes as consts
        cx = (np.arange(self.nc[0]) + 0.5) * self.edge[0]
        cy = (np.arange(self.nc[1]) + 0.5) * self.edge[1]
        cz = (np.arange(self.nc[2]) + 0.5) * self.edge[2]
        self.centers = np.stack(
            np.meshgrid(cx, cy, cz, indexing="ij"), axis=-1
        ).astype(np.float32)

    # -- rebuild: (N, 3) global coords -> cell layout ----------------------
    def build(self, x, v=None):
        nx, ny, nz = self.nc
        C = self.capacity
        L = jnp.asarray(self.L)
        xw = x - L * jnp.floor(x / L)                       # wrap into box
        ci = jnp.clip((xw / jnp.asarray(self.edge)).astype(jnp.int32),
                      0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
        cid = (ci[:, 0] * ny + ci[:, 1]) * nz + ci[:, 2]    # (N,)
        order = jnp.argsort(cid)
        cid_s = cid[order]
        # rank within cell: position since the last cell-id change
        idx = jnp.arange(self.n, dtype=jnp.int32)
        change = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                  cid_s[1:] != cid_s[:-1]])
        start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(change, idx, 0))
        rank = idx - start
        counts_ok = rank < C
        overflow = jnp.any(~counts_ok)
        slot = jnp.where(counts_ok, cid_s * C + rank, nx * ny * nz * C)
        xs, vs = jax.lax.optimization_barrier(
            (xw[order], (x if v is None else v)[order]))
        flat_x = jnp.zeros((nx * ny * nz * C + 1, 3), x.dtype)
        flat_v = jnp.zeros_like(flat_x)
        flat_g = jnp.full((nx * ny * nz * C + 1,), -1, jnp.int32)
        flat_x = flat_x.at[slot].set(xs)
        flat_g = flat_g.at[slot].set(order.astype(jnp.int32))
        if v is not None:
            flat_v = flat_v.at[slot].set(vs)
        xc = flat_x[:-1].reshape(nx, ny, nz, C, 3)
        gid = flat_g[:-1].reshape(nx, ny, nz, C)
        vc = flat_v[:-1].reshape(nx, ny, nz, C, 3)
        valid = gid >= 0
        xloc = jnp.where(valid[..., None],
                         xc - jnp.asarray(self.centers)[..., None, :], 0.0)
        return CellState(xloc=xloc, v=vc, valid=valid, gid=gid,
                         overflow=overflow)

    def scatter_back(self, cs: CellState, arr_cells):
        """(nx,ny,nz,C,3) cell-layout array -> (N,3) original order."""
        flat = arr_cells.reshape(-1, 3)
        gid = cs.gid.reshape(-1)
        out = jnp.zeros((self.n, 3), arr_cells.dtype)
        return out.at[jnp.where(gid >= 0, gid, self.n)].set(
            flat, mode="drop")

    def positions(self, cs: CellState):
        xg = cs.xloc + jnp.asarray(self.centers)[..., None, :]
        return self.scatter_back(cs, xg)

    # -- the per-pair kernel W(r^2), shared by both modes ------------------
    def _pair_ew(self, r2, pair_mask):
        """Per-pair energy and force coefficient w = -2 dU/d(r2)."""
        rc2 = self.cutoff * self.cutoff
        mask = pair_mask & (r2 < rc2)
        inv_r2 = jnp.where(mask, 1.0 / jnp.maximum(r2, 1e-12), 0.0)
        s2 = (self.sigma * self.sigma) * inv_r2
        s6 = s2 * s2 * s2
        s12 = s6 * s6
        e_lj = (4.0 * self.epsilon) * (s12 - s6)
        w = (24.0 * self.epsilon) * (2.0 * s12 - s6) * inv_r2
        if self.switch_width is not None:
            r_switch = self.cutoff - self.switch_width
            inv_span = 1.0 / self.switch_width
            inv_r = jnp.sqrt(inv_r2)
            r = r2 * inv_r
            t = jnp.clip((r - r_switch) * inv_span, 0.0, 1.0)
            S = 1.0 + t * t * t * (-10.0 + t * (15.0 - 6.0 * t))
            dS_dr = -30.0 * (t * t) * ((1.0 - t) * (1.0 - t)) * inv_span
            w = w * S - e_lj * dS_dr * inv_r
            e_lj = e_lj * S
        e_lj = jnp.where(mask, e_lj, 0.0)
        w = jnp.where(mask, w, 0.0)
        return e_lj, w

    # -- tile math ---------------------------------------------------------
    def _tile(self, xi, xj, off_vec, maski, maskj, self_tile):
        """Energy + per-side force contributions for one offset.

        xi, xj: (nx, ny, nz, C, 3) cell-local; xj is pre-rolled. off_vec is
        the constant center-to-center displacement (broadcastable to
        (nx, ny, nz, 1, 3)): xj_global - xi_global = xj + off_vec - xi.
        Returns (U, Fi, Fj) with Fj in the ROLLED frame.
        """
        C = self.capacity
        xj_rel = xj + off_vec                      # partner coords in i-frame
        pair_mask = maski[..., :, None] & maskj[..., None, :]
        if self_tile:
            iu = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
            ju = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
            pair_mask = pair_mask & (iu < ju)
        if self.r2_mode == "vpu":
            r2 = None
            ds = []
            for c in range(3):
                d = xi[..., :, None, c] - xj_rel[..., None, :, c]
                ds.append(d)
                r2 = d * d if r2 is None else r2 + d * d
            e, w = self._pair_ew(r2, pair_mask)
            U = jnp.sum(e)
            Fi = jnp.stack([jnp.sum(w * d, axis=-1) for d in ds], axis=-1)
            Fj = jnp.stack([-jnp.sum(w * d, axis=-2) for d in ds], axis=-1)
            return U, Fi, Fj
        # MXU form: r2 = |xi|^2 + |xj|^2 - 2 xi.xj; forces as matmuls with
        # contraction dim C. HIGHEST precision: default bf16 passes lose
        # ~4 digits on the cross term (CLAUDE.md rule 5).
        prec = jax.lax.Precision.HIGHEST
        ni = jnp.sum(xi * xi, axis=-1)             # (.., C)
        nj = jnp.sum(xj_rel * xj_rel, axis=-1)
        cross = jnp.einsum("...ic,...jc->...ij", xi, xj_rel,
                           precision=prec)
        r2 = ni[..., :, None] + nj[..., None, :] - 2.0 * cross
        e, w = self._pair_ew(r2, pair_mask)
        U = jnp.sum(e)
        wr = jnp.sum(w, axis=-1)                   # (.., C) row sums
        wc = jnp.sum(w, axis=-2)                   # (.., C) col sums
        Fi = xi * wr[..., None] - jnp.einsum(
            "...ij,...jc->...ic", w, xj_rel, precision=prec)
        Fj = xj_rel * wc[..., None] - jnp.einsum(
            "...ij,...ic->...jc", w, xi, precision=prec)
        return U, Fi, Fj

    def energy_forces(self, cs: CellState):
        """Total LJ energy + forces in cell layout (no gathers/scatters)."""
        nx, ny, nz = self.nc
        L = self.L
        edge = self.edge
        xi = cs.xloc
        maski = cs.valid
        F = jnp.zeros_like(xi)
        # self tile
        U, Fi, Fj0 = self._tile(xi, xi, jnp.zeros((3,), xi.dtype),
                                maski, maski, self_tile=True)
        F = F + Fi + Fj0
        for dx, dy, dz in _HALF_OFFSETS:
            xj = xi
            maskj = maski
            for ax, d in zip((0, 1, 2), (dx, dy, dz)):
                if d:
                    xj = jnp.roll(xj, -d, axis=ax)
                    maskj = jnp.roll(maskj, -d, axis=ax)
            # Cell-local storage absorbs the periodic wrap entirely: the
            # minimum-image partner-cell center ALWAYS sits at d*edge from
            # the home center (valid for nc >= 3, where any same-pair
            # alternative image is >= one cell edge >= cutoff away and the
            # r2 < rc^2 mask rejects it). One constant 3-vector per offset
            # — no per-pair and not even per-cell image work.
            off_vec = jnp.asarray(
                [dx * edge[0], dy * edge[1], dz * edge[2]], xi.dtype)
            u, Fi, Fj = self._tile(xi, xj, off_vec, maski, maskj,
                                   self_tile=False)
            U = U + u
            F = F + Fi
            # roll the partner contribution back to its home cells
            for ax, d in zip((0, 1, 2), (dx, dy, dz)):
                if d:
                    Fj = jnp.roll(Fj, d, axis=ax)
            F = F + Fj
        return U, F


# ---------------------------------------------------------------------------
# BAOAB MD loop in cell layout (experiment driver; mirrors the fused
# kernel's chunk structure: rebuild every `interval` steps, scan between)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnums=(0, 3, 5, 6))
def baoab_chunk(cp: "CellPairLJ", cs: CellState, kT, dt_gamma_mass, key,
                n_steps: int, interval: int):
    """Advance a CellState by n_steps of BAOAB "V R O R V" (monodisperse).

    One force evaluation per step (the trailing V's force carries into the
    next step's leading V); rebuild every `interval` steps via a scanned
    window, mirroring FusedSortedLangevin._build's chunk structure.
    """
    dt, gamma, mass = dt_gamma_mass
    a = math.exp(-gamma * dt)
    b = math.sqrt(1.0 - a * a)
    inv_m = 1.0 / mass

    def step(carry, k):
        xloc, v, F, valid, gid, ovf = carry
        v = v + (0.5 * dt * inv_m) * F           # V (cached force)
        xloc = xloc + (0.5 * dt) * v             # R
        noise = jax.random.normal(k, v.shape, v.dtype)
        v = a * v + b * jnp.sqrt(kT * inv_m) * noise   # O
        xloc = xloc + (0.5 * dt) * v             # R
        U, F = cp.energy_forces(
            CellState(xloc, v, valid, gid, ovf))
        v = v + (0.5 * dt * inv_m) * F           # V
        return (xloc, v, F, valid, gid, ovf), U

    def window(carry, keys):
        cs_tuple, key_unused = carry
        cs_ = CellState(*cs_tuple)
        # rebuild: flatten to global coords and re-bin
        xg = cp.positions(cs_)
        vg = cp.scatter_back(cs_, cs_.v)
        nb = cp.build(xg, vg)
        nb = nb._replace(overflow=nb.overflow | cs_.overflow)
        _, F0 = cp.energy_forces(nb)
        st = (nb.xloc, nb.v, F0, nb.valid, nb.gid, nb.overflow)
        st, Us = jax.lax.scan(step, st, keys)
        out = CellState(st[0], st[1], st[3], st[4], st[5])
        return (tuple(out), key_unused), Us[-1]

    n_windows, rem = divmod(n_steps, interval)
    U_last = jnp.zeros((), cs.xloc.dtype)
    carry = (tuple(cs), key)
    if n_windows:
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, (n_windows, interval))
        carry, U_all = jax.lax.scan(window, (tuple(cs), key), keys)
        U_last = U_all[-1]
    if rem:
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, (1, rem))
        carry, U_all = jax.lax.scan(window, carry, keys)
        U_last = U_all[-1]
    return CellState(*carry[0]), U_last, key
