"""Reciprocal-space scaling study (VERDICT r3 next-round item 8).

Measures the factorized-Ewald reciprocal term's energy+gradient wall time
vs N on synthetic neutral charge boxes at water-like density, against the
O(N * M^2) HBM-traffic model (the (N, (2M+1)^2) phase-product intermediate
dominates; MACs are ~free on the MXU), and — for the FFT-PME decision —
times the two building blocks a smooth-PME path would need on this
backend: the 3D real FFT of the charge grid and the B-spline scatter-add
charge spreading.

The reference's compute substrate uses smooth PME
(/root/reference/openmmtools/alchemy/alchemy.py:1510-1537 assumes PME
reciprocal; SURVEY.md §2.2 row 1); this repo deliberately uses direct
k-space Ewald (ops/pme.py docstring). This script puts the crossover
question on data: at what N does an FFT grid win on THIS hardware?

Run: python -m openmmtools_tpu.scripts.bench_recip_scaling [--sizes ...]
"""
import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.ops.pme import (
    DEFAULT_EWALD_ERROR_TOLERANCE,
    ewald_alpha,
    ewald_kmax,
    make_ewald_reciprocal_term,
)

ATOMS_PER_NM3 = 100.0   # ~water density (33.4 molecules/nm^3 x 3 atoms)
CUTOFF = 0.9


def build(n):
    rng = np.random.default_rng(0)
    box_edge = (n / ATOMS_PER_NM3) ** (1.0 / 3.0)
    x = rng.uniform(0, box_edge, size=(n, 3)).astype(np.float32)
    q = np.where(np.arange(n) % 2 == 0, 0.5, -0.5).astype(np.float32)
    term = make_ewald_reciprocal_term(
        q, box_edge, CUTOFF, exclusion_index=np.zeros((0, 2), np.int64))
    box = np.diag([box_edge] * 3).astype(np.float32)
    return term, x, box, box_edge


def time_inprogram(step, x0, iters=20, reps=5, agg="median"):
    """Per-application wall time of ``step`` (array -> same-shape array).

    The relay's per-dispatch constant (~30 ms) and occasional phantom
    block_until_ready returns make single-call timing meaningless at the
    sub-ms scale; instead chain ``iters`` data-dependent applications into
    ONE device program, end each rep with a real host fetch, and divide.

    ``agg="min"`` takes the fastest rep at each trip count instead of the
    median — use it with larger ``reps``/``iters`` during relay-stall
    windows (CLAUDE.md relay rule 11: stalls distort medians for minutes;
    the fastest fetch-verified rep is the machine's honest rate).
    """
    def make(length):
        def prog(a):
            def body(carry, _):
                return step(carry), None

            out, _ = jax.lax.scan(body, a, None, length=length)
            return out

        return jax.jit(prog)

    def rep_time(fn):
        out = fn(x0)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]))  # compile+sync
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(x0)
            np.asarray(jax.device_get(jax.tree.leaves(out)[0]))  # true sync
            times.append(time.perf_counter() - t0)
        t = min(times) if agg == "min" else sorted(times)[len(times) // 2]
        return t, out

    # two trip counts; the slope cancels the dispatch constant exactly
    lo = max(2, iters // 5)
    t_lo, _ = rep_time(make(lo))
    t_hi, out = rep_time(make(iters))
    return max(t_hi - t_lo, 1e-9) / (iters - lo), out


def pme_grid_size(alpha, box_edge, tol=DEFAULT_EWALD_ERROR_TOLERANCE):
    """OpenMM's PME mesh heuristic: n = 2*alpha*L/(3*tol^(1/5)), rounded up
    to an FFT-friendly size."""
    n = int(math.ceil(2.0 * alpha * box_edge / (3.0 * tol ** 0.2)))
    # round up to a multiple of 4 (good-enough proxy for 2^a 3^b 5^c)
    return (n + 3) // 4 * 4


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[13600, 23500, 50000, 100000])
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    print(f"backend={jax.default_backend()}  tol="
          f"{DEFAULT_EWALD_ERROR_TOLERANCE}  cutoff={CUTOFF} nm")
    header = (f"{'N':>7} {'L(nm)':>6} {'kmax':>4} {'grid':>4} "
              f"{'E+grad(ms)':>10} {'model*':>7} {'fft(ms)':>8} "
              f"{'spread(ms)':>10}")
    print(header)

    t_ref = None
    for n in args.sizes:
        term, x, box, box_edge = build(n)
        alpha = ewald_alpha(CUTOFF)
        m = ewald_kmax(alpha, box_edge)

        def e_and_g_step(xx, term=term, box=box):
            # data-dependent chaining: nudge x by the gradient so successive
            # applications cannot be CSE'd into one
            e, g = jax.value_and_grad(lambda a: term.energy(a, box))(xx)
            return xx + 1e-12 * g

        t_fac, xg = time_inprogram(e_and_g_step, jnp.asarray(x),
                                   reps=args.reps)
        e, g = jax.jit(jax.value_and_grad(
            lambda a: term.energy(a, box)))(jnp.asarray(x))
        assert bool(jnp.isfinite(e)) and bool(jnp.all(jnp.isfinite(g)))

        # O(N * (2M+1)^2) traffic model, normalized to the first point
        model = n * (2 * m + 1) ** 2
        if t_ref is None:
            t_ref = (t_fac, model)
        model_ms = t_ref[0] * model / t_ref[1] * 1e3

        # FFT-PME building blocks at the OpenMM mesh for this box
        grid = pme_grid_size(alpha, box_edge)

        def fft_roundtrip(rho):
            rho_k = jnp.fft.rfftn(rho)
            return jnp.fft.irfftn(rho_k, s=rho.shape)

        rho = jnp.asarray(
            np.random.default_rng(1).normal(size=(grid, grid, grid))
            .astype(np.float32))
        t_fft, _ = time_inprogram(fft_roundtrip, rho, reps=args.reps)

        # 4th-order B-spline spreading: N atoms scatter-add into 4^3 = 64
        # grid cells each — the scatter-bound step of smooth PME
        def spread(xx, q, grid=grid, box_edge=box_edge):
            h = box_edge / grid
            u = xx / h
            base = jnp.floor(u).astype(jnp.int32)
            frac = u - base
            # cheap 4-point weights per axis (shape proxy for B-splines)
            offs = jnp.arange(-1, 3)
            w = jnp.stack([0.25 - 0.1 * (frac - o) ** 2 for o in range(4)],
                          axis=-1)  # (N, 3, 4) stand-in weights
            g = jnp.zeros((grid, grid, grid), jnp.float32)
            ix = jnp.mod(base[:, 0, None] + offs[None, :], grid)
            iy = jnp.mod(base[:, 1, None] + offs[None, :], grid)
            iz = jnp.mod(base[:, 2, None] + offs[None, :], grid)
            wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
            val = (q[:, None, None, None] * wx[:, :, None, None]
                   * wy[:, None, :, None] * wz[:, None, None, :])
            idx = (ix[:, :, None, None] * grid * grid
                   + iy[:, None, :, None] * grid
                   + iz[:, None, None, :])
            return g.reshape(-1).at[idx.reshape(-1)].add(
                val.reshape(-1)).reshape(grid, grid, grid)

        q = jnp.asarray(np.ones(n, np.float32))

        def spread_step(xx, q=q):
            g = spread(xx, q)
            # fold a grid-dependent scalar back into x: data dependence
            return xx + 1e-20 * g.reshape(-1)[0]

        t_spread, _ = time_inprogram(spread_step, jnp.asarray(x),
                                     reps=args.reps)

        print(f"{n:>7} {box_edge:>6.2f} {m:>4} {grid:>4} "
              f"{t_fac * 1e3:>10.2f} {model_ms:>7.2f} {t_fft * 1e3:>8.2f} "
              f"{t_spread * 1e3:>10.2f}")

    print("\n*model: first-point time scaled by N*(2M+1)^2 (HBM traffic of "
          "the factorized path's (N, K^2) intermediate)")
    print("fft: one rfftn+irfftn round trip at the OpenMM PME mesh; "
          "spread: 4^3-stencil scatter-add of N charges (the FFT path "
          "needs spread + fft + gather + the same again backward)")


if __name__ == "__main__":
    main()
