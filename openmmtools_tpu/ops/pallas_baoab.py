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

__all__ = ["FusedDenseBAOAB"]


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


def _fast_rsqrt(x):
    """1/sqrt(x) via the bit-trick seed + 2 Newton steps (~1e-7 rel).

    jnp.sqrt/rsqrt run on the slow transcendental unit (measured: the
    switch region's one sqrt/pair cost ~50 us/step at N=2048); the
    integer-shift seed plus two Newton iterations uses only full-rate
    VPU ops. x = 0 yields a huge finite seed that diverges to inf — ok,
    callers mask those lanes.
    """
    i = pltpu.bitcast(x, jnp.int32)
    y = pltpu.bitcast(jnp.int32(0x5F3759DF) - (i >> 1), jnp.float32)
    y = y * (1.5 - 0.5 * x * y * y)
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

        valid_np = np.zeros((1, n), np.float32)
        valid_np[0, :self.n] = 1.0

        def run_fn(x, v, box, kT, seed):
            # (N, 3) canonical <-> (3, N_pad) kernel layout
            pad = n - self.n
            xT = jnp.pad(x.T.astype(jnp.float32), ((0, 0), (0, pad)))
            vT = jnp.pad(v.T.astype(jnp.float32), ((0, 0), (0, pad)))
            L = jnp.diagonal(box).astype(jnp.float32).reshape(3, 1)
            kT_arr = jnp.asarray(kT, jnp.float32).reshape(1)
            seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
            xo, vo, fo, uo = call(L, kT_arr, seed_arr, xT, vT,
                                  jnp.asarray(valid_np))
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
