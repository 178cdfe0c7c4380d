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

import math

import jax
import jax.numpy as jnp

# Row gathers feeding arithmetic pass through optimization_barrier: the
# TPU backend serializes fused gather+compute loops (33 ms vs 0.04 ms at
# 35k rows, measured) while standalone gathers take the fast path.
from jax.lax import optimization_barrier as _barrier

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
    xri, xrj = _barrier((x_ref[i], x_ref[j]))
    s = xri - xrj  # reference directions

    def violation(xc):
        xci, xcj = _barrier((xc[i], xc[j]))
        r = xci - xcj
        r2 = jnp.sum(r * r, axis=-1)
        return jnp.max(jnp.abs(r2 - d0sq) / d0sq)

    def cond(carry):
        xc, it = carry
        return (violation(xc) > 2.0 * tol) & (it < max_iter)

    def body(carry):
        xc, it = carry
        xci, xcj = _barrier((xc[i], xc[j]))   # fenced in-loop gathers
        r = xci - xcj
        r2 = jnp.sum(r * r, axis=-1)
        rs = jnp.sum(r * s, axis=-1)
        # guard: if r ⟂ s (pathological), fall back to r·r
        denom = 2.0 * (inv_m[i] + inv_m[j]) * jnp.where(
            jnp.abs(rs) > 1e-12, rs, r2)
        g = omega * (r2 - d0sq) / denom
        dxi, dxj = _barrier((-(g[:, None] * imi) * s,
                             (g[:, None] * imj) * s))
        xc = xc.at[i].add(dxi)
        xc = xc.at[j].add(dxj)
        return _barrier(xc), it + 1

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
    xi, xj = _barrier((x[i], x[j]))
    r = xi - xj
    r2 = jnp.sum(r * r, axis=-1)

    # velocity scale for the relative tolerance (avoids 0/0 for v = 0)
    vscale = jnp.maximum(jnp.max(jnp.abs(v)), 1e-8)

    def violation(vc):
        vci, vcj = _barrier((vc[i], vc[j]))
        dv = vci - vcj
        return jnp.max(jnp.abs(jnp.sum(dv * r, axis=-1))
                       / (jnp.sqrt(d0sq) * vscale))

    def cond(carry):
        vc, it = carry
        return (violation(vc) > tol) & (it < max_iter)

    def body(carry):
        vc, it = carry
        vci, vcj = _barrier((vc[i], vc[j]))   # fenced in-loop gathers
        dv = vci - vcj
        g = omega * jnp.sum(dv * r, axis=-1) / (r2 * (inv_m[i] + inv_m[j]))
        dvi, dvj = _barrier((-(g[:, None] * imi) * r,
                             (g[:, None] * imj) * r))
        vc = vc.at[i].add(dvi)
        vc = vc.at[j].add(dvj)
        return _barrier(vc), it + 1

    v_out, _ = jax.lax.while_loop(cond, body, (v, jnp.zeros((), jnp.int32)))
    return v_out


# ---------------------------------------------------------------------------
# Cluster M-SHAKE: direct per-cluster matrix solves.
#
# The Jacobi while_loop above is latency-bound on TPU: every iteration is a
# handful of tiny gather/scatter ops with multi-microsecond op latency, and
# the data-dependent trip count defeats pipelining (measured: 962 us per
# projection for 12 constraints at 128 vmapped replicas on v5e — 2x per MD
# step, dominating 22-atom replica-exchange propagation). But h-bond
# constraint graphs decompose into tiny independent clusters (CH3 -> 3
# constraints sharing the carbon, NH2 -> 2, X-H -> 1): the same structural
# fact OpenMM's CCMA exploits. Solving each cluster's coupled Lagrange
# system DIRECTLY (batched (n_clusters, B, B) solve, B = max cluster size)
# gives a fixed-cost, fully-vectorized projection: a few Newton iterations
# with a constant per-step matrix, no while_loop at all (measured: ~60 us).
# ---------------------------------------------------------------------------


class ClusterSpec:
    """Static topology for cluster-direct M-SHAKE.

    cons (n_comp, B): constraint index per cluster slot (0-padded);
    valid (n_comp, B): slot mask; w (n_comp, B, B): mass-coupling matrix
    w_cd = sum_{shared atom a} (+-1/m_a) with +1 when the shared atom has
    the same role (i-i or j-j) in both constraints, -1 otherwise.
    """

    def __init__(self, cons, valid, w, block):
        self.cons = cons
        self.valid = valid
        self.w = w
        self.block = block


def analyze_clusters(constraints: Constraints, masses, max_block=8):
    """Partition the constraint graph into connected components; return a
    ClusterSpec when every component has <= max_block constraints (the
    h-bond case), else None (callers fall back to Jacobi SHAKE)."""
    import numpy as np

    n_c = constraints.n_constraints
    if n_c == 0:
        return None
    idx = np.asarray(constraints.index)
    m = np.asarray(masses)

    parent = {}

    def find(a):
        parent.setdefault(a, a)
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for k in range(n_c):
        union(int(idx[k, 0]), int(idx[k, 1]))
    comp_of = {}
    for k in range(n_c):
        comp_of.setdefault(find(int(idx[k, 0])), []).append(k)
    comps = list(comp_of.values())
    block = max(len(c) for c in comps)
    if block > max_block:
        return None

    n_comp = len(comps)
    cons = np.zeros((n_comp, block), np.int32)
    valid = np.zeros((n_comp, block), np.float32)
    w = np.zeros((n_comp, block, block), np.float32)
    inv_m = np.where(m > 0, 1.0 / np.maximum(m, 1e-30), 0.0)
    for g, comp in enumerate(comps):
        for a, ka in enumerate(comp):
            cons[g, a] = ka
            valid[g, a] = 1.0
            ia, ja = int(idx[ka, 0]), int(idx[ka, 1])
            for b, kb in enumerate(comp):
                ib, jb = int(idx[kb, 0]), int(idx[kb, 1])
                val = 0.0
                if ia == ib:
                    val += inv_m[ia]
                if ja == jb:
                    val += inv_m[ja]
                if ia == jb:
                    val -= inv_m[ia]
                if ja == ib:
                    val -= inv_m[ja]
                w[g, a, b] = val
        # padded slots: identity rows keep the solve nonsingular
        for a in range(len(comp), block):
            w[g, a, a] = 1.0
    return ClusterSpec(jnp.asarray(cons), jnp.asarray(valid),
                       jnp.asarray(w), block)


def _inv_small(A, n):
    """Batched inverse of small (.., n, n) matrices via unrolled
    Gauss-Jordan (no pivoting — the constraint coupling matrices are
    diagonally dominant). Pure elementwise ops: no batched-LU lowering,
    vmap- and TPU-friendly, deterministic compile."""
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    aug = jnp.concatenate([A, eye], axis=-1)           # (.., n, 2n)
    row_is_k = jnp.arange(n)[:, None]
    for k in range(n):
        pivot_row = aug[..., k:k + 1, :] / aug[..., k:k + 1, k:k + 1]
        factors = aug[..., :, k:k + 1]
        eliminated = aug - factors * pivot_row
        aug = jnp.where(row_is_k == k, pivot_row, eliminated)
    return aug[..., :, n:]


def mshake_positions(x, x_ref, constraints: Constraints, spec: ClusterSpec,
                     masses, n_iter=None, tol=1e-8):
    """SHAKE projection along reference directions via per-cluster direct
    solves. Newton iterations with the (constant per step) coupling matrix
    A_cd = 2 w_cd (s_c . s_d); quadratic residual decay reaches f32
    tolerance in <= 4 iterations for MD-sized displacements.

    ``n_iter`` derives from the requested ``constraint_tolerance`` when not
    given (ADVICE round-2 item 5): the default 6 iterations cover tol down
    to ~1e-8 relative for coupled clusters; tighter tolerances add
    iterations (each extra digit costs ~1 for the linearly-coupled tail)."""
    if n_iter is None:
        digits = -math.log10(max(float(tol), 1e-16))
        n_iter = 6 + max(0, int(math.ceil(digits)) - 8)
    i = constraints.index[:, 0]
    j = constraints.index[:, 1]
    d0sq = constraints.distance ** 2
    inv_m = _inv_mass(masses)
    imi = inv_m[i][:, None]
    imj = inv_m[j][:, None]
    xri, xrj = _barrier((x_ref[i], x_ref[j]))
    s = xri - xrj                               # (C, 3) reference directions

    # The Newton loop runs ENTIRELY in cluster-block space: positions move
    # linearly in lambda, so the per-constraint residual vector obeys the
    # exact recurrence dr_c = sum_d w_cd lam_d s_d — no per-iteration
    # gathers or scatter-adds (which dominate the in-program cost of the
    # old formulation: each iteration re-gathered x[i], x[j] and scattered
    # two (C,3) updates into the full (N,3) array). Block quantities stay
    # as (G, B) / (G, B, 3) ARRAYS and only the contraction index d is
    # unrolled at trace time: a full (G,B,3)x(G,B,3) einsum would lower to
    # a heavily-padded batched matmul on TPU, while a full scalar unroll
    # (the first redesign) costs O(B^2) tiny-array ops per iteration and
    # is latency-bound in-program — the d-unrolled array form keeps the
    # op count at O(B) fused VPU ops over (G, B)-shaped tiles.
    B = spec.block
    xi0, xj0 = _barrier((x[i], x[j]))
    s_blk = s[spec.cons]                        # (G, B, 3)
    r_blk = (xi0 - xj0)[spec.cons]              # (G, B, 3)
    d0_blk = d0sq[spec.cons]                    # (G, B)
    w_blk = spec.w                              # (G, B, B)
    vb = spec.valid                             # (G, B)

    def dot3(a, b):
        # explicit component fma chain: never a reduce the compiler could
        # pattern-match into a (padded) dot
        return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
                + a[..., 2] * b[..., 2])

    # A[:, b, d] = 2 w_bd (s_b . s_d); padded slots stay nonsingular via
    # spec.w's identity rows (their off-diagonal couplings are zero, so
    # the inverse is block-diagonal w.r.t. pads and valid lambdas never
    # mix with pad residuals)
    A = jnp.stack([2.0 * w_blk[:, :, d] * dot3(s_blk, s_blk[:, d:d + 1, :])
                   for d in range(B)], axis=-1)
    A_inv = _inv_small(A, B)
    lam_tot = jnp.zeros(d0_blk.shape, x.dtype)

    for _ in range(n_iter):
        g = dot3(r_blk, r_blk) - d0_blk                     # (G, B)
        lam = -sum(A_inv[:, :, d] * g[:, d:d + 1]
                   for d in range(B)) * vb
        r_blk = r_blk + sum(
            (w_blk[:, :, d] * lam[:, d:d + 1])[:, :, None]
            * s_blk[:, d:d + 1, :] for d in range(B))
        lam_tot = lam_tot + lam

    n_c = constraints.n_constraints
    lam_blk = lam_tot * spec.valid                          # (G, B)
    lam = jnp.zeros((n_c,), x.dtype).at[spec.cons.reshape(-1)].add(
        lam_blk.reshape(-1))
    di, dj = _barrier(((lam[:, None] * imi) * s,
                       -(lam[:, None] * imj) * s))
    x = x.at[i].add(di)
    x = x.at[j].add(dj)
    return _barrier(x)


def mrattle_velocities(x, v, constraints: Constraints, spec: ClusterSpec,
                       masses):
    """Exact RATTLE velocity projection: the tangency conditions are linear,
    so one per-cluster solve of w_cd (r_c . r_d) mu = rhs removes all
    violations at once."""
    i = constraints.index[:, 0]
    j = constraints.index[:, 1]
    inv_m = _inv_mass(masses)
    imi = inv_m[i][:, None]
    imj = inv_m[j][:, None]
    xi, xj = _barrier((x[i], x[j]))
    r = xi - xj                                 # (C, 3) current directions

    B = spec.block
    r_blk = r[spec.cons]

    def dot3(a, b):
        return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
                + a[..., 2] * b[..., 2])

    # d-unrolled array-form A build (see mshake_positions: a full einsum
    # lowers to a padded batched matmul, a full scalar unroll is
    # latency-bound on op count)
    A = jnp.stack([spec.w[:, :, d] * dot3(r_blk, r_blk[:, d:d + 1, :])
                   for d in range(B)], axis=-1)
    # pad diagonal: spec.w identity rows give A = |r_pad|^2 on the diagonal
    # only if r_pad != 0; guard by adding identity on invalid slots
    eye = jnp.eye(B, dtype=x.dtype)
    pad = (1.0 - spec.valid)[:, :, None] * eye[None]
    A = A * (spec.valid[:, :, None] * spec.valid[:, None, :]) + pad

    vi, vj = _barrier((v[i], v[j]))
    dv = vi - vj
    rhs = jnp.sum(dv * r, axis=-1)              # (C,)
    rhs_blk = rhs[spec.cons] * spec.valid
    A_inv = _inv_small(A, B)
    mu_blk = sum(A_inv[:, :, d] * rhs_blk[:, d:d + 1]
                 for d in range(B)) * spec.valid
    n_c = constraints.n_constraints
    mu = jnp.zeros((n_c,), v.dtype).at[spec.cons.reshape(-1)].add(
        mu_blk.reshape(-1))
    dvi, dvj = _barrier((-(mu[:, None] * imi) * r,
                         (mu[:, None] * imj) * r))
    v = v.at[i].add(dvi)
    v = v.at[j].add(dvj)
    return _barrier(v)


# ---------------------------------------------------------------------------
# SETTLE: analytic constraints for rigid isosceles 3-site molecules (water).
# Replaces the iterative SHAKE/RATTLE loops with a closed-form rotation
# (Miyamoto & Kollman, J. Comput. Chem. 13:952, 1992) — one fixed-cost,
# fully vmapped pass per step instead of a while_loop, which XLA much
# prefers (no dynamic trip count on the TPU).
# ---------------------------------------------------------------------------

class SettleSpec:
    """Static per-molecule topology for SETTLE.

    ``a`` is the apex atom (O), ``b``/``c`` the equal-mass satellites (H).
    ``ra``/``rb``/``rc`` are canonical-frame coordinates: apex at (0, ra),
    satellites at (+-rc, -rb); all (W,) arrays so mixed rigid solvents work.
    """

    def __init__(self, a, b, c, ra, rb, rc):
        self.a, self.b, self.c = a, b, c
        self.ra, self.rb, self.rc = ra, rb, rc
        # contiguous-layout fast path: when molecules are laid out as
        # (apex, sat, sat) runs of stride 3 (Amber water blocks), the
        # per-molecule arrays are plain reshapes — no gathers/scatters,
        # which the TPU backend runs at ~0.15 us/row inside scanned MD
        # programs (measured: 3.2 ms/step for 7k waters via gathers)
        import numpy as _cnp

        self.contig = None
        an = _cnp.asarray(a)
        if an.size:
            order = _cnp.argsort(an)
            an_s = an[order]
            bn_s = _cnp.asarray(b)[order]
            cn_s = _cnp.asarray(c)[order]
            if (an_s.size == 1 or (_cnp.diff(an_s) == 3).all()) and                     (bn_s == an_s + 1).all() and (cn_s == an_s + 2).all():
                self.contig = (int(an_s[0]), int(an_s.size))
                self.a = jnp.asarray(an_s, jnp.int32)
                self.b = jnp.asarray(bn_s, jnp.int32)
                self.c = jnp.asarray(cn_s, jnp.int32)
                self.ra = jnp.asarray(_cnp.asarray(ra)[order])
                self.rb = jnp.asarray(_cnp.asarray(rb)[order])
                self.rc = jnp.asarray(_cnp.asarray(rc)[order])


def analyze_settle(constraints: Constraints, masses):
    """Detect a pure rigid-triangle topology. Returns a SettleSpec when
    EVERY constraint belongs to a disjoint isosceles triangle (two equal
    apex bonds, equal satellite masses) — the rigid-water case — else
    None (callers fall back to SHAKE/RATTLE)."""
    import numpy as np

    n_c = constraints.n_constraints
    if n_c == 0 or n_c % 3 != 0:
        return None
    idx = np.asarray(constraints.index)
    dist = np.asarray(constraints.distance)
    m = np.asarray(masses)
    # connected components over the constraint graph
    adj = {}
    for k in range(n_c):
        i, j = int(idx[k, 0]), int(idx[k, 1])
        adj.setdefault(i, []).append((j, k))
        adj.setdefault(j, []).append((i, k))
    seen = set()
    a_l, b_l, c_l, ra_l, rb_l, rc_l = [], [], [], [], [], []
    for start in adj:
        if start in seen:
            continue
        comp, edges, stack = set(), set(), [start]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            for v, k in adj[u]:
                edges.add(k)
                if v not in comp:
                    stack.append(v)
        seen |= comp
        if len(comp) != 3 or len(edges) != 3:
            return None
        atoms = sorted(comp)
        # distances keyed by the excluded atom (d[k] = bond not touching k)
        dmap = {}
        for k in edges:
            i, j = int(idx[k, 0]), int(idx[k, 1])
            other = (comp - {i, j}).pop()
            dmap[other] = dist[k]
        # apex = atom whose two incident bonds are equal
        apex = None
        for cand in atoms:
            rest = [t for t in atoms if t != cand]
            d1, d2 = dmap[rest[1]], dmap[rest[0]]  # bonds cand-rest[i]
            if np.isclose(d1, d2, rtol=1e-5) and np.isclose(
                    m[rest[0]], m[rest[1]], rtol=1e-5):
                apex = cand
                break
        if apex is None:
            return None
        sat = [t for t in atoms if t != apex]
        d_ab = float(dmap[sat[1]])
        d_bc = float(dmap[apex])
        # canonical frame: apex on +y at ra above COM, satellites at
        # (+-rc, -rb); t = apex->midpoint distance
        t = math.sqrt(max(d_ab * d_ab - 0.25 * d_bc * d_bc, 0.0))
        ma, mh = float(m[apex]), float(m[sat[0]])
        if ma <= 0 or mh <= 0:
            return None
        ra = 2.0 * mh * t / (ma + 2.0 * mh)
        a_l.append(apex); b_l.append(sat[0]); c_l.append(sat[1])
        ra_l.append(ra); rb_l.append(t - ra); rc_l.append(0.5 * d_bc)
    return SettleSpec(
        jnp.asarray(a_l, jnp.int32), jnp.asarray(b_l, jnp.int32),
        jnp.asarray(c_l, jnp.int32),
        jnp.asarray(ra_l), jnp.asarray(rb_l), jnp.asarray(rc_l))


def settle_positions(x, x_ref, spec: SettleSpec, masses):
    """Analytic position constraint: rotate each rigid triangle about its
    (momentum-conserving) center of mass so all three distances are exact.

    ``x_ref`` holds the pre-step (constraint-satisfying) positions that fix
    the triangle's prior orientation; ``x`` the unconstrained update."""
    ma = masses[spec.a][:, None]
    mh = masses[spec.b][:, None]
    M = ma + 2.0 * mh
    if spec.contig is not None:
        start, w = spec.contig
        blk0 = jax.lax.dynamic_slice_in_dim(x_ref, start, 3 * w
                                            ).reshape(w, 3, 3)
        blk1 = jax.lax.dynamic_slice_in_dim(x, start, 3 * w).reshape(w, 3, 3)
        a0, b0, c0 = blk0[:, 0], blk0[:, 1], blk0[:, 2]
        a1, b1, c1 = blk1[:, 0], blk1[:, 1], blk1[:, 2]
    else:
        a0, b0, c0, a1, b1, c1 = _barrier(
            (x_ref[spec.a], x_ref[spec.b], x_ref[spec.c],
             x[spec.a], x[spec.b], x[spec.c]))
    com = (ma * a1 + mh * (b1 + c1)) / M
    a1p, b1p, c1p = a1 - com, b1 - com, c1 - com

    # orthonormal frame: z ~ old-plane normal, a1' in the y-z plane
    zax = jnp.cross(b0 - a0, c0 - a0)
    zax = zax / jnp.linalg.norm(zax, axis=-1, keepdims=True)
    xax = jnp.cross(a1p, zax)
    xax = xax / jnp.maximum(jnp.linalg.norm(xax, axis=-1, keepdims=True),
                            1e-12)
    yax = jnp.cross(zax, xax)

    # explicit component form: a (W,3,3)x(W,3) batched einsum lowers to a
    # heavily padded batched matmul on TPU; three dot products stay in the
    # fused VPU elementwise pipeline
    def rot(p):
        return jnp.stack([jnp.sum(xax * p, -1), jnp.sum(yax * p, -1),
                          jnp.sum(zax * p, -1)], axis=-1)
    # old triangle coordinates relative to the OLD APEX (Miyamoto & Kollman
    # eq. A5-A9 use b0 - a0, c0 - a0 — using the old COM instead introduces
    # a first-order deviation from the SHAKE/Lagrange solution)
    b0d, c0d = rot(b0 - a0), rot(c0 - a0)
    a1d, b1d, c1d = rot(a1p), rot(b1p), rot(c1p)

    ra, rb, rc = spec.ra, spec.rb, spec.rc
    sinphi = jnp.clip(a1d[:, 2] / ra, -1.0, 1.0)
    cosphi = jnp.sqrt(1.0 - sinphi * sinphi)
    sinpsi = jnp.clip((b1d[:, 2] - c1d[:, 2]) / (2.0 * rc * cosphi),
                      -1.0, 1.0)
    cospsi = jnp.sqrt(1.0 - sinpsi * sinpsi)

    ya2 = ra * cosphi
    xb2 = -rc * cospsi
    yb2 = -rb * cosphi - rc * sinpsi * sinphi
    yc2 = -rb * cosphi + rc * sinpsi * sinphi

    alpha = xb2 * (b0d[:, 0] - c0d[:, 0]) + b0d[:, 1] * yb2 \
        + c0d[:, 1] * yc2
    beta = xb2 * (c0d[:, 1] - b0d[:, 1]) + b0d[:, 0] * yb2 \
        + c0d[:, 0] * yc2
    gamma = b0d[:, 0] * b1d[:, 1] - b1d[:, 0] * b0d[:, 1] \
        + c0d[:, 0] * c1d[:, 1] - c1d[:, 0] * c0d[:, 1]
    a2b2 = alpha * alpha + beta * beta
    sintheta = (alpha * gamma
                - beta * jnp.sqrt(jnp.maximum(a2b2 - gamma * gamma, 0.0))) \
        / a2b2
    sintheta = jnp.clip(sintheta, -1.0, 1.0)
    costheta = jnp.sqrt(1.0 - sintheta * sintheta)

    za2 = ra * sinphi
    zb2 = -rb * sinphi + rc * sinpsi * cosphi
    zc2 = -rb * sinphi - rc * sinpsi * cosphi
    a3 = jnp.stack([-ya2 * sintheta, ya2 * costheta, za2], axis=-1)
    b3 = jnp.stack([xb2 * costheta - yb2 * sintheta,
                    xb2 * sintheta + yb2 * costheta, zb2], axis=-1)
    c3 = jnp.stack([-xb2 * costheta - yc2 * sintheta,
                    -xb2 * sintheta + yc2 * costheta, zc2], axis=-1)

    def unrot(p):                                      # R^T p
        return (xax * p[:, 0:1] + yax * p[:, 1:2] + zax * p[:, 2:3])
    na, nb2, nc2 = com + unrot(a3), com + unrot(b3), com + unrot(c3)
    if spec.contig is not None:
        start, w = spec.contig
        blk = jnp.stack([na, nb2, nc2], axis=1).reshape(3 * w, 3)
        return jax.lax.dynamic_update_slice_in_dim(x, blk.astype(x.dtype),
                                                   start, axis=0)
    x = x.at[spec.a].set(na)
    x = x.at[spec.b].set(nb2)
    x = x.at[spec.c].set(nc2)
    return x


def settle_velocities(x, v, spec: SettleSpec, masses):
    """Analytic RATTLE for triangles: per-molecule 3x3 solve for the bond
    Lagrange multipliers so every relative velocity is tangent."""
    i_a, i_b, i_c = spec.a, spec.b, spec.c
    inv_ma = 1.0 / masses[i_a]
    inv_mh = 1.0 / masses[i_b]
    # bonds: 0 = (a,b), 1 = (a,c), 2 = (b,c); unit directions
    def unit(p, q):
        r = p - q
        return r / jnp.linalg.norm(r, axis=-1, keepdims=True)

    if spec.contig is not None:
        start, w = spec.contig
        xblk = jax.lax.dynamic_slice_in_dim(x, start, 3 * w).reshape(w, 3, 3)
        vblk = jax.lax.dynamic_slice_in_dim(v, start, 3 * w).reshape(w, 3, 3)
        xa, xb, xc = xblk[:, 0], xblk[:, 1], xblk[:, 2]
        va, vb, vc = vblk[:, 0], vblk[:, 1], vblk[:, 2]
    else:
        xa, xb, xc, va, vb, vc = _barrier(
            (x[i_a], x[i_b], x[i_c], v[i_a], v[i_b], v[i_c]))
    e = jnp.stack([unit(xa, xb), unit(xa, xc), unit(xb, xc)], axis=1)
    dv = jnp.stack([va - vb, va - vc, vb - vc], axis=1)
    rhs = jnp.sum(dv * e, axis=-1)                      # (W, 3)

    dot = lambda p, q: jnp.sum(e[:, p] * e[:, q], axis=-1)
    mab = inv_ma + inv_mh
    mbb = 2.0 * inv_mh
    # 3x3 system solved by Cramer's rule — stays elementwise/fusable on the
    # TPU VPU (batched LU would serialize and lacks f64 support there)
    a11, a12, a13 = mab, inv_ma * dot(0, 1), -inv_mh * dot(0, 2)
    a21, a22, a23 = inv_ma * dot(1, 0), mab, inv_mh * dot(1, 2)
    a31, a32, a33 = -inv_mh * dot(2, 0), inv_mh * dot(2, 1), mbb
    r1, r2, r3 = rhs[:, 0], rhs[:, 1], rhs[:, 2]
    det = (a11 * (a22 * a33 - a23 * a32)
           - a12 * (a21 * a33 - a23 * a31)
           + a13 * (a21 * a32 - a22 * a31))
    g0 = (r1 * (a22 * a33 - a23 * a32)
          - a12 * (r2 * a33 - a23 * r3)
          + a13 * (r2 * a32 - a22 * r3)) / det
    g1 = (a11 * (r2 * a33 - a23 * r3)
          - r1 * (a21 * a33 - a23 * a31)
          + a13 * (a21 * r3 - r2 * a31)) / det
    g2 = (a11 * (a22 * r3 - r2 * a32)
          - a12 * (a21 * r3 - r2 * a31)
          + r1 * (a21 * a32 - a22 * a31)) / det
    g = jnp.stack([g0, g1, g2], axis=-1)                # (W, 3)

    da = -(g[:, 0, None] * e[:, 0] + g[:, 1, None] * e[:, 1]) * inv_ma[:, None]
    db = (g[:, 0, None] * e[:, 0] - g[:, 2, None] * e[:, 2]) * inv_mh[:, None]
    dc = (g[:, 1, None] * e[:, 1] + g[:, 2, None] * e[:, 2]) * inv_mh[:, None]
    if spec.contig is not None:
        start, w = spec.contig
        dblk = jnp.stack([va + da, vb + db, vc + dc],
                         axis=1).reshape(3 * w, 3)
        return jax.lax.dynamic_update_slice_in_dim(v, dblk.astype(v.dtype),
                                                   start, axis=0)
    v = v.at[i_a].add(da)
    v = v.at[i_b].add(db)
    v = v.at[i_c].add(dc)
    return v


def partition_constraints(constraints: "Constraints", masses):
    """Split a mixed constraint topology into SETTLE-able rigid triangles
    and the rest (OpenMM's SETTLE + CCMA architecture: rigid waters take
    the analytic path, protein h-bond clusters the direct M-SHAKE path).

    Returns (settle_spec | None, rest_constraints | None): either may be
    None when its partition is empty.  ``analyze_settle``/-``_clusters``
    remain the pure-topology fast paths.
    """
    import numpy as np

    from openmmtools_tpu.system import Constraints

    n_c = constraints.n_constraints
    if n_c == 0:
        return None, None
    idx = np.asarray(constraints.index)
    dist = np.asarray(constraints.distance)
    m = np.asarray(masses)
    adj = {}
    for k in range(n_c):
        i, j = int(idx[k, 0]), int(idx[k, 1])
        adj.setdefault(i, []).append((j, k))
        adj.setdefault(j, []).append((i, k))
    seen = set()
    a_l, b_l, c_l, ra_l, rb_l, rc_l = [], [], [], [], [], []
    rest_edges = []
    for start in adj:
        if start in seen:
            continue
        comp, edges, stack = set(), set(), [start]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            for v, k in adj[u]:
                edges.add(k)
                if v not in comp:
                    stack.append(v)
        seen |= comp
        settled = False
        if len(comp) == 3 and len(edges) == 3:
            atoms = sorted(comp)
            dmap = {}
            for k in edges:
                i, j = int(idx[k, 0]), int(idx[k, 1])
                other = (comp - {i, j}).pop()
                dmap[other] = dist[k]
            apex = None
            for cand in atoms:
                rest = [t for t in atoms if t != cand]
                d1, d2 = dmap[rest[1]], dmap[rest[0]]
                if np.isclose(d1, d2, rtol=1e-5) and np.isclose(
                        m[rest[0]], m[rest[1]], rtol=1e-5):
                    apex = cand
                    break
            if apex is not None and m[apex] > 0:
                sat = [t for t in atoms if t != apex]
                if m[sat[0]] > 0:
                    d_ab = float(dmap[sat[1]])
                    d_bc = float(dmap[apex])
                    t = math.sqrt(max(d_ab * d_ab - 0.25 * d_bc * d_bc, 0.0))
                    ma, mh = float(m[apex]), float(m[sat[0]])
                    ra = 2.0 * mh * t / (ma + 2.0 * mh)
                    a_l.append(apex); b_l.append(sat[0]); c_l.append(sat[1])
                    ra_l.append(ra); rb_l.append(t - ra)
                    rc_l.append(0.5 * d_bc)
                    settled = True
        if not settled:
            rest_edges.extend(sorted(edges))
    settle = None
    if a_l:
        settle = SettleSpec(
            jnp.asarray(a_l, jnp.int32), jnp.asarray(b_l, jnp.int32),
            jnp.asarray(c_l, jnp.int32),
            jnp.asarray(ra_l), jnp.asarray(rb_l), jnp.asarray(rc_l))
    rest = None
    if rest_edges:
        rest_edges = np.asarray(rest_edges, np.int64)
        rest = Constraints(
            index=jnp.asarray(idx[rest_edges], jnp.int32),
            distance=jnp.asarray(dist[rest_edges]))
    return settle, rest
