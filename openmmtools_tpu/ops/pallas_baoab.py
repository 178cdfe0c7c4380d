"""Fully-fused BAOAB + dense-LJ MD kernel (Pallas, TPU).

The flagship single-chip MD path (BASELINE configs 1-2): the entire
BAOAB step loop — force evaluation, both half-kicks, both drifts, the
Ornstein-Uhlenbeck noise — runs inside ONE Pallas kernel, scanned over
``n_steps`` with ``lax.fori_loop``. One kernel launch integrates a whole
chunk; there is no XLA op-dispatch, no HBM traffic for intermediates,
and no host round-trip inside the chunk.

Layout: everything lane-major. Positions/velocities/forces live as
``(3, N)`` f32 (components on sublanes, particles on lanes). The pair
sum uses the *half-shell* decomposition over the particle ring:

    every unordered pair (i, j) appears exactly once as (i, s) with
    s = (j - i) mod N in {1, .., N/2}   (s = N/2 rows weighted 1/2)

For a block of ``BS`` consecutive shells the partner coordinates are a
single 2-D lane-roll of a precomputed "staircase" tile
``R_c[k, i] = x_c[(i + k) mod N]``, so no gathers and no transposes are
ever needed — the round-trip that kills XLA neighbor lists on TPU
(gathers serialize) and the (N, N, 3) HBM spills that bound the dense
XLA path (ops/pair_forces.py) are both avoided.

Newton's third law costs one extra roll per shell block: the reaction
force -w*d for row k must land at column i+s0+k; we roll the whole
G = w*d tile back by s0 and bank row k into accumulator row k, whose
residual mis-shift is the *constant* k — undone by BS single-row rolls
once per force evaluation.

Noise: in-kernel Box-Muller over ``pltpu.prng_random_bits`` in the same
(3, N) layout — drawing (N, 3) Gaussians with jax.random costs more
than the entire rest of a step at N=2048 (measured; threefry ~28 us).

Physics semantics match ``ops.nonbonded.all_pairs_energy`` (LJ with
cutoff + OpenMM quintic switch, minimum-image orthorhombic PBC) and the
BAOAB splitting of integrators/langevin.py ("V R O R V",
a = exp(-gamma h), b = sqrt(1 - a^2); reference integrators.py:1143).

Reference: replaces OpenMM's fused GPU integrator+force kernels
(SURVEY.md §2.2 row 1-2) for the monodisperse uncharged LJ case.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedDenseBAOAB", "FusedSortedLangevin",
           "FusedSortedBAOAB"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fast_round(z):
    """round-to-nearest (half away from zero) for |z| < 2^31 via int casts.

    jnp.round lowers to the slow transcendental path on TPU (measured:
    ~3 rounds/pair cost 36 us/step at N=2048). Truncating int casts are
    full-rate VPU ops. (The classic add-magic-constant trick is unsafe
    here: XLA's algebraic simplifier folds (z + C) - C back to z.)
    Ties round away from zero instead of to-even — for the minimum-image
    convention the |d| = L/2 tie picks an equivalent image either way.
    """
    half = jnp.where(z < 0, jnp.float32(-0.5), jnp.float32(0.5))
    return (z + half).astype(jnp.int32).astype(jnp.float32)


def _fast_rsqrt(x, newton_steps=2):
    """1/sqrt(x) via the bit-trick seed + Newton steps (2 -> ~1e-7 rel).

    jnp.sqrt/rsqrt run on the slow transcendental unit (measured: the
    switch region's one sqrt/pair cost ~50 us/step at N=2048); the
    integer-shift seed plus two Newton iterations uses only full-rate
    VPU ops. x = 0 yields a huge finite seed that diverges to inf — ok,
    callers mask those lanes. ``newton_steps`` is an experiment knob
    (round-5 op-lever sweep): 1 step leaves ~1.7e-3 rel error — wrong
    forces at the tolerance standards here — and is for measurement only.
    """
    i = pltpu.bitcast(x, jnp.int32)
    y = pltpu.bitcast(jnp.int32(0x5F3759DF) - (i >> 1), jnp.float32)
    for _ in range(newton_steps):
        y = y * (1.5 - 0.5 * x * y * y)
    return y


class FusedDenseBAOAB:
    """Compiled fused BAOAB+LJ chunk program for one System configuration.

    Parameters are static (baked into the compiled kernel) except the
    box, temperature (kT) and RNG seed, which are runtime inputs — so a
    sampler state carrying a non-default box integrates correctly
    (ADVICE.md round-1 item 3).
    """

    def __init__(self, n_particles, cutoff, switch_width, sigma, epsilon,
                 mass, timestep, collision_rate, shell_block=8,
                 interpret=False):
        self.n = int(n_particles)
        self.n_pad = _round_up(self.n, 128)
        self.rc = float(cutoff)
        self.switch_width = (None if switch_width is None
                             else float(switch_width))
        self.sigma = float(sigma)
        self.epsilon = float(epsilon)
        self.mass = float(mass)
        self.dt = float(timestep)
        self.gamma = float(collision_rate)
        self.bs = int(shell_block)
        self.interpret = bool(interpret)
        # O substep constants (integrators.py:1143-1146; single O per step)
        self.ou_a = math.exp(-self.gamma * self.dt)
        self.ou_b = math.sqrt(1.0 - math.exp(-2.0 * self.gamma * self.dt))
        self._run_cache = {}

    # -- kernel body --------------------------------------------------------

    def _forces(self, x, Lref, valid):
        """LJ energy + forces of the (3, N_pad) configuration ``x``.

        Returns (F (3, N_pad), U scalar). Pure jnp on values; lives
        inside the kernel trace.
        """
        n = self.n_pad
        bs = self.bs
        half = n // 2
        n_blocks = -(-half // bs)
        rc2 = self.rc * self.rc
        sig2 = self.sigma * self.sigma
        eps4 = 4.0 * self.epsilon
        eps24 = 24.0 * self.epsilon
        dtype = x.dtype

        L = [Lref[c, 0] for c in range(3)]
        invL = [1.0 / L[c] for c in range(3)]

        def rollL(a, s):
            # lane-roll matching jnp.roll semantics; static shift
            return pltpu.roll(a, ((s % n) + n) % n, axis=1)

        # staircase tiles: R[c][k, i] = x[c, (i + k) mod n], k = 0..bs-1
        stair = []
        for c in range(3):
            row = x[c:c + 1, :]
            stair.append(jnp.concatenate(
                [rollL(row, -k) for k in range(bs)], axis=0))
        vstair = None
        if valid is not None:
            vrow = valid  # (1, n) f32 1/0
            vstair = jnp.concatenate(
                [rollL(vrow, -k) for k in range(bs)], axis=0)

        acc_p = [jnp.zeros((bs, n), dtype) for _ in range(3)]
        acc_m = [jnp.zeros((bs, n), dtype) for _ in range(3)]
        acc_e = jnp.zeros((bs, n), dtype)

        for it in range(n_blocks):
            s0 = 1 + it * bs
            # per-row shell weights: 1 for s < n/2, 1/2 for s == n/2
            # (the N/2 shell is generated from both endpoints), 0 beyond.
            # Built from iota in-kernel (array constants can't be captured).
            if s0 + bs - 1 < half:
                wrow = None  # all-ones: skip the multiply entirely
            else:
                srow = s0 + jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
                wrow = jnp.where(
                    srow < half, jnp.ones((), dtype),
                    jnp.where(srow == half, jnp.full((), 0.5, dtype),
                              jnp.zeros((), dtype)))

            d = []
            r2 = None
            for c in range(3):
                xj = rollL(stair[c], -s0)
                dc = x[c:c + 1, :] - xj
                dc = dc - L[c] * _fast_round(dc * invL[c])
                d.append(dc)
                r2 = dc * dc if r2 is None else r2 + dc * dc

            mask = (r2 < rc2) & (r2 > 1e-12)
            if vstair is not None:
                vj = rollL(vstair, -s0)
                mask = mask & (valid > 0.5) & (vj > 0.5)

            # all masking flows through inv_r: zero inv_r kills every
            # downstream term (s6, s12, e, w) without further selects
            inv_r = jnp.where(mask, _fast_rsqrt(r2), jnp.zeros((), dtype))
            if wrow is not None:
                # fold the s = n/2 half-weight into the kernel via inv_r?
                # no — e, w scale differently; apply wrow to e and w below
                pass
            inv_r2 = inv_r * inv_r
            s2 = sig2 * inv_r2
            s6 = s2 * s2 * s2
            s12 = s6 * s6
            e = eps4 * (s12 - s6)
            w = eps24 * (2.0 * s12 - s6) * inv_r2
            if self.switch_width is not None:
                rs = self.rc - self.switch_width
                inv_span = 1.0 / self.switch_width
                r = r2 * inv_r
                t = jnp.clip((r - rs) * inv_span, 0.0, 1.0)
                S = 1.0 + t * t * t * (-10.0 + t * (15.0 - 6.0 * t))
                omt = 1.0 - t
                dS = (-30.0 * inv_span) * (t * t) * (omt * omt)
                w = w * S - e * dS * inv_r
                e = e * S
            if wrow is not None:
                w = w * wrow
                e = e * wrow
            acc_e = acc_e + e
            for c in range(3):
                g = w * d[c]
                acc_p[c] = acc_p[c] + g
                acc_m[c] = acc_m[c] + rollL(g, s0)

        U = jnp.sum(acc_e)
        F_rows = []
        for c in range(3):
            fplus = jnp.sum(acc_p[c], axis=0, keepdims=True)
            fminus = jnp.zeros((1, n), dtype)
            for k in range(self.bs):
                fminus = fminus + rollL(acc_m[c][k:k + 1, :], k)
            F_rows.append(fplus - fminus)
        return jnp.concatenate(F_rows, axis=0), U

    def _kernel(self, n_steps, L_ref, kT_ref, seed_ref, x_in, v_in, valid_in,
                x_out, v_out, f_out, u_out):
        n = self.n_pad
        dtype = x_in.dtype
        h2 = self.dt * 0.5
        inv_m = 1.0 / self.mass
        valid = valid_in[:] if self.n != n else None

        if self.ou_b != 0.0:
            pltpu.prng_seed(seed_ref[0])
        kT = kT_ref[0]
        sig_noise = jnp.sqrt(kT * inv_m)

        def draw_noise():
            # bitcast to uint32: prng bits arrive as int32, and an
            # arithmetic >> of a negative value yields u < 0 -> log NaN
            bits = pltpu.bitcast(pltpu.prng_random_bits((8, n)), jnp.uint32)
            # logical >> leaves 23 bits; bitcast back to int32 (positive)
            # because Mosaic lacks a uint32 -> f32 cast
            u = (pltpu.bitcast(bits >> 9, jnp.int32).astype(dtype)
                 * (1.0 / (1 << 23)) + (0.5 / (1 << 23)))
            u1 = u[0:3, :]
            u2 = u[3:6, :]
            rad = jnp.sqrt(-2.0 * jnp.log(u1))
            return rad * jnp.cos((2.0 * math.pi) * u2)

        def wrap(x):
            rows = []
            for c in range(3):
                Lc = L_ref[c, 0]
                xc = x[c:c + 1, :]
                rows.append(xc - Lc * jnp.floor(xc * (1.0 / Lc)))
            return jnp.concatenate(rows, axis=0)

        x0 = wrap(x_in[:])
        F0, U0 = self._forces(x0, L_ref, valid)

        def body(_, carry):
            x, v, F, U = carry
            v = v + (h2 * inv_m) * F          # V
            x = x + h2 * v                     # R
            if self.ou_b != 0.0:               # O
                v = self.ou_a * v + (self.ou_b * sig_noise) * draw_noise()
            elif self.ou_a != 1.0:
                v = self.ou_a * v
            x = x + h2 * v                     # R
            x = wrap(x)
            F, U = self._forces(x, L_ref, valid)
            v = v + (h2 * inv_m) * F          # V
            return (x, v, F, U)

        x, v, F, U = jax.lax.fori_loop(
            0, n_steps, body, (x0, v_in[:], F0, U0))
        x_out[:] = x
        v_out[:] = v
        f_out[:] = F
        u_out[:, :] = U[None, None]  # scalar stores to VMEM are rejected

    # -- host-facing entry --------------------------------------------------

    def _build(self, n_steps):
        n = self.n_pad
        kernel = functools.partial(self._kernel, n_steps)
        call = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((3, n), jnp.float32),
                jax.ShapeDtypeStruct((3, n), jnp.float32),
                jax.ShapeDtypeStruct((3, n), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),    # L (3,1)
                pl.BlockSpec(memory_space=pltpu.SMEM),    # kT (1,)
                pl.BlockSpec(memory_space=pltpu.SMEM),    # seed (1,)
                pl.BlockSpec(memory_space=pltpu.VMEM),    # x
                pl.BlockSpec(memory_space=pltpu.VMEM),    # v
                pl.BlockSpec(memory_space=pltpu.VMEM),    # valid
            ],
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(4)),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def run_fn(x, v, box, kT, seed):
            # (N, 3) canonical <-> (3, N_pad) kernel layout
            pad = n - self.n
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            valid_arr = (lanes < self.n).astype(jnp.float32)
            xT = jnp.pad(x.T.astype(jnp.float32), ((0, 0), (0, pad)))
            vT = jnp.pad(v.T.astype(jnp.float32), ((0, 0), (0, pad)))
            L = jnp.diagonal(box).astype(jnp.float32).reshape(3, 1)
            kT_arr = jnp.asarray(kT, jnp.float32).reshape(1)
            seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
            xo, vo, fo, uo = call(L, kT_arr, seed_arr, xT, vT, valid_arr)
            return (xo[:, :self.n].T, vo[:, :self.n].T,
                    fo[:, :self.n].T, uo[0, 0])

        return jax.jit(run_fn)

    def run(self, x, v, box, kT, key, n_steps):
        """Advance (x, v) by n_steps; returns (x, v, F, U, new_key)."""
        fn = self._run_cache.get(n_steps)
        if fn is None:
            self._run_cache[n_steps] = fn = self._build(n_steps)
        key, sub = jax.random.split(key)
        seed = jax.random.randint(sub, (), 0, np.iinfo(np.int32).max,
                                  dtype=jnp.int32)
        xo, vo, fo, uo = fn(x, v, box, kT, seed)
        return xo, vo, fo, uo, key


# ---------------------------------------------------------------------------
# Sorted half-shell kernel with a dynamic interaction-range bound.
#
# The dense kernel above always sweeps all N/2 shells; at gas-like or
# droplet state points (the bench: rho* = 0.05, condensing) the vast
# majority of pair slots lie beyond the cutoff.  This variant exploits
# that: particles are kept sorted by their x-coordinate (re-sorted every
# ``sort_interval`` steps by XLA *outside* the kernel — argsort + one
# gather per window, amortized to noise).  The x-ring wraps periodically
# exactly like the index ring of the half-shell decomposition, so any
# pair within cutoff+skin spans at most ~N·(r/L_x) sorted indices — a
# bound that holds at any box position (a space-filling curve has better
# average locality but a far worse max, and the sweep bound is a max:
# measured 230 vs 994 of 1024 shells on the bench state point).
#
# The kernel tracks that bound itself: whenever any particle has moved
# more than skin/2 since the last rebuild (the classic Verlet-list
# validity criterion, checked every step), the NEXT force evaluation
# sweeps ALL shells and records the last shell-block containing any pair
# within cutoff+skin; all other evaluations sweep only that many blocks.
# Rebuilds therefore happen exactly when needed and the kernel is
# *unconditionally* sound — there is no violation flag and no fallback.
#
# The block loop runs HIGH→LOW so every in-loop roll has the *static*
# shift ``bs``: the partner staircase advances by +bs per iteration (one
# dynamic roll seeds it at the top block), and the Newton reaction tiles
# accumulate Horner-style — A ← roll(A, bs) + g — which after the loop
# equals Σ_b roll(g_b, b·bs); a final +1 roll lands every reaction at its
# true shell offset s0_b = 1 + b·bs.  Accumulators, partner tiles and
# integration state live in VMEM scratch refs mutated in place, so the
# loops carry nothing.
#
# Reference role: replaces OpenMM's neighbor-list force kernels
# (SURVEY.md SS2.2 row 1) with a TPU-shaped equivalent: no gathers, no
# device-side reordering — index-space *bounding* instead of lists.
# ---------------------------------------------------------------------------


class FusedSortedLangevin:
    """Fused Langevin-splitting + LJ chunk program over spatially-sorted
    particles, for ANY R/V/O splitting string (BAOAB, g-BAOAB, VVVR,
    OBABO, velocity Verlet, ... — the reference presets of
    integrators.py:2125-2242 minus Metropolization).

    Same physics/contract as FusedDenseBAOAB (monodisperse uncharged LJ,
    cutoff+switch, minimum-image orthorhombic PBC) with two additions:
    the particle order is a free permutation (LJ fluids are exchange-
    symmetric; the public ``run`` restores the caller's order), and the
    shell sweep is bounded by the measured interaction range.

    Token emission mirrors integrators/langevin.py: per-token substep
    sizes dt/n_R, dt/n_V, dt/n_O; a force sweep runs lazily before the
    first V following any R (and at step end if positions moved), so
    every standard splitting costs exactly one sweep per step.
    """

    def __init__(self, n_particles, cutoff, switch_width, sigma, epsilon,
                 mass, timestep, collision_rate, shell_block=8,
                 skin=None, sort_interval=500, interpret=False,
                 tokens=("V", "R", "O", "R", "V"),
                 rsqrt_newton=2, bf16_mask=False):
        # experiment knobs (round-5 op-lever sweep, scripts/tune_levers.py):
        # rsqrt_newton < 2 and bf16_mask change numerics — measurement only
        self.rsqrt_newton = int(rsqrt_newton)
        self.bf16_mask = bool(bf16_mask)
        self.n = int(n_particles)
        self.n_pad = _round_up(self.n, 128)
        self.rc = float(cutoff)
        self.switch_width = (None if switch_width is None
                             else float(switch_width))
        self.sigma = float(sigma)
        self.epsilon = float(epsilon)
        self.mass = float(mass)
        self.dt = float(timestep)
        self.gamma = float(collision_rate)
        self.bs = int(shell_block)
        if (self.n_pad // 2) % self.bs != 0:
            # guarantees the sweep never visits a shell > n/2, so the
            # only per-row weight the kernel needs is the s == n/2 half
            raise ValueError("shell_block must divide n_pad // 2")
        self.skin = float(skin) if skin is not None else 0.3 * self.sigma
        self.sort_interval = int(sort_interval)
        self.interpret = bool(interpret)
        self.tokens = tuple(t.upper() for t in tokens)
        if not set(self.tokens) <= {"R", "V", "O"}:
            raise ValueError("fused kernel supports R/V/O tokens only")
        n_R = max(1, self.tokens.count("R"))
        n_V = max(1, self.tokens.count("V"))
        n_O = max(1, self.tokens.count("O"))
        self.h_R = self.dt / n_R
        self.h_V = self.dt / n_V
        h_O = self.dt / n_O
        self.ou_a = math.exp(-self.gamma * h_O)
        self.ou_b = math.sqrt(1.0 - math.exp(-2.0 * self.gamma * h_O))
        self._run_cache = {}
        self._kernel_cache = {}

    # -- in-kernel bound measurement ---------------------------------------

    def _measure_bound(self, x, L, refs):
        """Distance-only bound sweep: writes 1 + (last shell-block with
        any pair at r^2 <= (rc+skin)^2) into refs['nblk_sm'].

        Replaces the full *force* sweep the tracked rebuild used to
        require (round-3 rebuild-cost fix): same r^2 computation but no
        rsqrt/LJ/switch/accumulate chain, ~1/4 the per-block op count.
        (An x-window-only bound was tried first and is ~4x cheaper per
        block, but with x-sorted particles nearly every index-near pair
        has small |dx|, so the bound came out ~2x looser and the bounded
        force sweeps ate the savings — measured on hardware.)"""
        n = self.n_pad
        bs = self.bs
        half = n // 2
        n_blocks = half // bs
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

        def body(i, last_active):
            it = n_blocks - 1 - i
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
            active = jnp.any(r2 <= w2)
            last_active = jnp.maximum(last_active,
                                      jnp.where(active, it, -1))
            return last_active

        last_active = jax.lax.fori_loop(0, n_blocks, body, jnp.int32(-1))
        refs["nblk_sm"][0] = last_active + 1

    # -- in-kernel force sweep ---------------------------------------------

    def _sweep(self, x, L, n_blk, refs):
        """One half-shell force sweep over shell-blocks [0, n_blk).

        Writes forces into refs['F'] and the potential into refs['u_sm'].
        Uses the scratch refs refs['xj'] (3*bs, n), refs['accP'],
        refs['accA'] (3*bs, n) and refs['accE'] (bs, n) as in-place loop
        state.  Padded lanes are POISONED to huge x-coordinates by the
        in-kernel wrap() (not masked): every pair involving one is beyond
        the cutoff, so no validity plane or per-block mask ops are needed.
        """
        n = self.n_pad
        bs = self.bs
        half = n // 2
        rc2 = self.rc * self.rc
        sig2 = self.sigma * self.sigma
        eps4 = 4.0 * self.epsilon
        eps24 = 24.0 * self.epsilon
        dtype = x.dtype

        Lc = [L[c, 0] for c in range(3)]
        halfL = [0.5 * Lc[c] for c in range(3)]
        xj_ref = refs["xj"]
        accP = refs["accP"]
        accA = refs["accA"]
        accE = refs["accE"]

        # staircase tiles: stair[c][k, i] = x[c, (i + k) mod n], seeded at
        # the TOP block's shift (the only dynamic roll of the sweep)
        s0_top = 1 + (n_blk - 1) * bs
        back_top = jnp.mod(n - s0_top, n)
        for c in range(3):
            row = x[c:c + 1, :]
            stair_c = jnp.concatenate(
                [pltpu.roll(row, (n - k) % n, axis=1) for k in range(bs)],
                axis=0)
            xj_ref[c * bs:(c + 1) * bs, :] = pltpu.roll(stair_c, back_top,
                                                        axis=1)

        accP[:, :] = jnp.zeros((3 * bs, n), dtype)
        accA[:, :] = jnp.zeros((3 * bs, n), dtype)
        accE[:, :] = jnp.zeros((bs, n), dtype)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)

        def body(i, _):
            it = n_blk - 1 - i
            s0 = 1 + it * bs
            # the only shell needing a weight is s == n/2 (generated from
            # both endpoints: count it half); shells > n/2 never occur
            # because bs divides n/2 and the bound never exceeds n/(2 bs)
            whalf = 1.0 - 0.5 * (s0 + row_iota == half).astype(dtype)

            d = []
            r2 = None
            for c in range(3):
                dc = x[c:c + 1, :] - xj_ref[c * bs:(c + 1) * bs, :]
                # positions are wrapped to [0, L) every step, so
                # dc in (-L, L): one compare-select per side suffices
                dc = dc + jnp.where(dc < -halfL[c], Lc[c],
                                    jnp.zeros((), dtype))
                dc = dc - jnp.where(dc > halfL[c], Lc[c],
                                    jnp.zeros((), dtype))
                d.append(dc)
                r2 = dc * dc if r2 is None else r2 + dc * dc

            if self.bf16_mask:
                # round-5 op-lever experiment: classify pairs from a bf16
                # r^2 (cheaper per-element IF the VPU runs bf16 compares
                # at 2x). Physics survivors still use the f32 r2 plane —
                # lanes are evaluated unconditionally on the VPU, so this
                # can only win if bf16 compare/mul rate beats f32.
                r2_bf = None
                for dc in d:
                    dcb = dc.astype(jnp.bfloat16)
                    r2_bf = dcb * dcb if r2_bf is None else r2_bf + dcb * dcb
                mask = ((r2_bf < jnp.bfloat16(rc2))
                        & (r2_bf > jnp.bfloat16(1e-12)))
            else:
                mask = (r2 < rc2) & (r2 > 1e-12)

            inv_r = jnp.where(mask, _fast_rsqrt(r2, self.rsqrt_newton),
                              jnp.zeros((), dtype))
            inv_r2 = inv_r * inv_r
            s2 = sig2 * inv_r2
            s6 = s2 * s2 * s2
            s12 = s6 * s6
            e = eps4 * (s12 - s6)
            w = eps24 * (2.0 * s12 - s6) * inv_r2
            if self.switch_width is not None:
                rs = self.rc - self.switch_width
                inv_span = 1.0 / self.switch_width
                r = r2 * inv_r
                # mask guarantees r < rc so t <= 1; only the lower clamp
                t = jnp.maximum((r - rs) * inv_span, 0.0)
                S = 1.0 + t * t * t * (-10.0 + t * (15.0 - 6.0 * t))
                omt = 1.0 - t
                dS = (-30.0 * inv_span) * (t * t) * (omt * omt)
                w = w * S - e * dS * inv_r
                e = e * S
            w = w * whalf
            accE[:, :] = accE[:, :] + e * whalf
            for c in range(3):
                sl = slice(c * bs, (c + 1) * bs)
                g = w * d[c]
                accP[sl, :] = accP[sl, :] + g
                # Horner: the remaining `it` iterations roll this g by
                # it*bs total; the global +1 is applied after the loop
                accA[sl, :] = pltpu.roll(accA[sl, :], bs, axis=1) + g
                # advance partner tiles to the next (lower) block
                xj_ref[sl, :] = pltpu.roll(xj_ref[sl, :], bs, axis=1)
            return 0

        jax.lax.fori_loop(0, n_blk, body, 0)

        refs["u_sm"][0] = jnp.sum(accE[:, :])
        F_rows = []
        for c in range(3):
            sl = slice(c * bs, (c + 1) * bs)
            fplus = jnp.sum(accP[sl, :], axis=0, keepdims=True)
            fminus = jnp.zeros((1, n), dtype)
            for k in range(bs):
                # row k of A carries a residual k-shift plus the global +1
                fminus = fminus + pltpu.roll(accA[c * bs + k:c * bs + k + 1, :],
                                             k + 1, axis=1)
            F_rows.append(fplus - fminus)
        refs["F"][:, :] = jnp.concatenate(F_rows, axis=0)

    # -- kernel body --------------------------------------------------------

    def _kernel(self, n_steps, L_ref, kT_ref, seed_ref, x_in, v_in,
                x_out, v_out, f_out, u_out, stat_out,
                xs, vs, Fs, snap, xj, accP, accA, accE,
                u_sm, nblk_sm, reb_sm):
        n = self.n_pad
        dtype = jnp.float32
        inv_m = 1.0 / self.mass
        half_skin2 = (0.5 * self.skin) ** 2

        refs = {"xj": xj, "accP": accP, "accA": accA, "accE": accE,
                "F": Fs, "u_sm": u_sm, "nblk_sm": nblk_sm}

        if self.ou_b != 0.0:
            pltpu.prng_seed(seed_ref[0])
        kT = kT_ref[0]
        sig_noise = jnp.sqrt(kT * inv_m)
        L = L_ref[:]

        # Padded lanes are POISONED, not masked: wrap() pins lane l >= n
        # to x = (l+1)*1e8 (staggered so poison-poison |dx| >= 1e8) and
        # y = z = 0.  Every pair involving one is then beyond the cutoff
        # in x alone, the Verlet displacement is exactly zero, and the
        # sweep needs no validity plane or per-block mask ops.
        if self.n != n:
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            pad_mask = lanes >= self.n
            poison = (lanes.astype(dtype) + 1.0) * jnp.float32(1e8)

        def draw_noise():
            bits = pltpu.bitcast(pltpu.prng_random_bits((8, n)), jnp.uint32)
            u = (pltpu.bitcast(bits >> 9, jnp.int32).astype(dtype)
                 * (1.0 / (1 << 23)) + (0.5 / (1 << 23)))
            u1 = u[0:3, :]
            u2 = u[3:6, :]
            rad = jnp.sqrt(-2.0 * jnp.log(u1))
            return rad * jnp.cos((2.0 * math.pi) * u2)

        def wrap(x):
            rows = []
            for c in range(3):
                Lc = L[c, 0]
                xc = x[c:c + 1, :]
                xc = xc - Lc * jnp.floor(xc * (1.0 / Lc))
                if self.n != n:
                    xc = jnp.where(pad_mask,
                                   poison if c == 0
                                   else jnp.zeros((), dtype), xc)
                rows.append(xc)
            return jnp.concatenate(rows, axis=0)

        def dispatch_sweep(x):
            """Wrap positions, apply the Verlet validity check (re-measure
            the shell bound on violation), run the bounded sweep. Returns
            the wrapped positions; forces land in Fs."""
            x = wrap(x)
            # rebuild as soon as any particle has moved more than skin/2
            # (min-image: wrap() can jump a coordinate by L) from the
            # snapshot the current bound was measured at
            disp2 = jnp.zeros((1, n), dtype)
            for c in range(3):
                dc = x[c:c + 1, :] - snap[c:c + 1, :]
                dc = dc + jnp.where(dc < -0.5 * L[c, 0], L[c, 0],
                                    jnp.zeros((), dtype))
                dc = dc - jnp.where(dc > 0.5 * L[c, 0], L[c, 0],
                                    jnp.zeros((), dtype))
                disp2 = disp2 + dc * dc
            rebuild = jnp.max(disp2) > half_skin2

            @pl.when(rebuild)
            def _():
                snap[:, :] = x
                reb_sm[0] = reb_sm[0] + 1
                self._measure_bound(x, L, refs)

            self._sweep(x, L, nblk_sm[0], refs)
            return x

        # chunk start: wrap, snapshot, measure the bound, sweep
        x0 = wrap(x_in[:])
        xs[:, :] = x0
        vs[:, :] = v_in[:]
        snap[:, :] = x0
        reb_sm[0] = jnp.int32(1)
        self._measure_bound(x0, L, refs)
        self._sweep(x0, L, nblk_sm[0], refs)

        h_R = self.h_R
        h_V = self.h_V

        def body(step, _):
            x = xs[:, :]
            v = vs[:, :]
            stale = False
            for tok in self.tokens:
                if tok == "R":
                    x = x + h_R * v
                    stale = True
                elif tok == "O":
                    if self.ou_b != 0.0:
                        v = (self.ou_a * v
                             + (self.ou_b * sig_noise) * draw_noise())
                    elif self.ou_a != 1.0:
                        v = self.ou_a * v
                else:  # V
                    if stale:
                        x = dispatch_sweep(x)
                        stale = False
                    v = v + (h_V * inv_m) * Fs[:, :]
            if stale:
                x = dispatch_sweep(x)
            xs[:, :] = x
            vs[:, :] = v
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        x_out[:] = xs[:, :]
        v_out[:] = vs[:, :]
        f_out[:] = Fs[:, :]
        u_out[:, :] = u_sm[0][None, None]
        stat_out[:, :] = jnp.stack(
            [reb_sm[0].astype(jnp.float32)[None],
             nblk_sm[0].astype(jnp.float32)[None]], axis=0)

    # -- host-facing orchestration ------------------------------------------

    def _build_kernel(self, n_steps):
        n = self.n_pad
        bs = self.bs
        key = int(n_steps)
        call = self._kernel_cache.get(key)
        if call is None:
            kernel = functools.partial(self._kernel, n_steps)
            call = pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct((3, n), jnp.float32),
                    jax.ShapeDtypeStruct((3, n), jnp.float32),
                    jax.ShapeDtypeStruct((3, n), jnp.float32),
                    jax.ShapeDtypeStruct((1, 1), jnp.float32),
                    jax.ShapeDtypeStruct((2, 1), jnp.float32),
                ),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),    # L (3,1)
                    pl.BlockSpec(memory_space=pltpu.SMEM),    # kT (1,)
                    pl.BlockSpec(memory_space=pltpu.SMEM),    # seed (1,)
                    pl.BlockSpec(memory_space=pltpu.VMEM),    # x
                    pl.BlockSpec(memory_space=pltpu.VMEM),    # v
                ],
                out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                                for _ in range(5)),
                scratch_shapes=[
                    pltpu.VMEM((3, n), jnp.float32),      # xs
                    pltpu.VMEM((3, n), jnp.float32),      # vs
                    pltpu.VMEM((3, n), jnp.float32),      # Fs
                    pltpu.VMEM((3, n), jnp.float32),      # snap
                    pltpu.VMEM((3 * bs, n), jnp.float32),  # xj
                    pltpu.VMEM((3 * bs, n), jnp.float32),  # accP
                    pltpu.VMEM((3 * bs, n), jnp.float32),  # accA
                    pltpu.VMEM((bs, n), jnp.float32),      # accE
                    pltpu.SMEM((1,), jnp.float32),         # u_sm
                    pltpu.SMEM((1,), jnp.int32),           # nblk_sm
                    pltpu.SMEM((1,), jnp.int32),           # reb_sm
                ],
                interpret=self.interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            self._kernel_cache[key] = call
        return call

    def _build(self, n_steps):
        n = self.n_pad
        W = min(self.sort_interval, n_steps) if n_steps > 0 else 1
        n_windows, remainder = divmod(n_steps, W)
        call_W = self._build_kernel(W) if n_windows else None
        # n_steps == 0 still runs a 0-step kernel: the initial sweep
        # computes forces/energy of the input configuration
        if remainder or n_windows == 0:
            call_rem = self._build_kernel(remainder)
        else:
            call_rem = None

        # Sort along ONE axis: the x-coordinate ring wraps periodically
        # exactly like the index ring of the half-shell decomposition
        # (see module comment) — measured max pair separation 230/1024
        # shells vs 994 for a Morton order at the bench state point.
        def sort_spatial(xT, vT, perm_tot):
            p = jnp.argsort(xT[0, :self.n])
            # optimization_barrier: a lane gather fused into downstream
            # arithmetic lowers to a serialized loop (CLAUDE.md rule 3)
            xg, vg, pg = jax.lax.optimization_barrier(
                (xT[:, :self.n][:, p], vT[:, :self.n][:, p], perm_tot[p]))
            xT = jnp.concatenate([xg, xT[:, self.n:]], axis=1)
            vT = jnp.concatenate([vg, vT[:, self.n:]], axis=1)
            return xT, vT, pg

        def run_fn(x, v, box, kT, key):
            pad = n - self.n
            xT = jnp.pad(x.T.astype(jnp.float32), ((0, 0), (0, pad)))
            vT = jnp.pad(v.T.astype(jnp.float32), ((0, 0), (0, pad)))
            Ldiag = jnp.diagonal(box).astype(jnp.float32)
            L = Ldiag.reshape(3, 1)
            kT_arr = jnp.asarray(kT, jnp.float32).reshape(1)
            key_out, sub = jax.random.split(key)
            seed0 = jax.random.randint(sub, (), 0, np.iinfo(np.int32).max,
                                       dtype=jnp.int32)
            perm_tot = jnp.arange(self.n, dtype=jnp.int32)

            fT = jnp.zeros_like(xT)
            U = jnp.float32(0.0)
            stats = jnp.zeros((2,), jnp.float32)

            def window(carry, seed_w):
                xT, vT, fT, U, perm_tot, stats = carry
                xT, vT, perm_tot = sort_spatial(xT, vT, perm_tot)
                xo, vo, fo, uo, stat = call_W(
                    L, kT_arr, seed_w.reshape(1), xT, vT)
                stats = stats + jnp.stack([stat[0, 0], stat[1, 0]])
                return (xo, vo, fo, uo[0, 0], perm_tot, stats), None

            if n_windows > 0:
                seeds = seed0 + jnp.arange(n_windows, dtype=jnp.int32)
                (xT, vT, fT, U, perm_tot, stats), _ = jax.lax.scan(
                    window, (xT, vT, fT, U, perm_tot, stats), seeds)
            if call_rem is not None:
                xT, vT, perm_tot = sort_spatial(xT, vT, perm_tot)
                xo, vo, fo, uo, stat = call_rem(
                    L, kT_arr, (seed0 + n_windows).reshape(1),
                    xT, vT)
                xT, vT, fT = xo, vo, fo
                U = uo[0, 0]
                stats = stats + jnp.stack([stat[0, 0], stat[1, 0]])

            # restore the caller's particle order
            def unperm(aT):
                a = aT[:, :self.n].T
                return jnp.zeros_like(a).at[perm_tot].set(a)

            return unperm(xT), unperm(vT), unperm(fT), U, stats, key_out

        return jax.jit(run_fn)

    def run(self, x, v, box, kT, key, n_steps):
        """Advance (x, v) by n_steps; returns (x, v, F, U, new_key).

        Unconditionally sound: the kernel rebuilds its sweep bound
        whenever the Verlet skin criterion requires it. ``last_stats``
        holds (total rebuild count, summed per-window bound) diagnostics.
        """
        fn = self._run_cache.get(n_steps)
        if fn is None:
            self._run_cache[n_steps] = fn = self._build(n_steps)
        xo, vo, fo, uo, stats, key = fn(x, v, box, kT, key)
        self.last_stats = stats  # (rebuild count, summed window bounds)
        return xo, vo, fo, uo, key


# backward-compatible name (tokens default to BAOAB)
FusedSortedBAOAB = FusedSortedLangevin
