"""DHFR reciprocal-space model-gap profile (VERDICT r4 item 3).

Round 4 measured the factorized Ewald at DHFR shape (N=23.5k, kmax=16) at
1.27 ms isolated / 1.61 ms in-situ vs a 0.54 ms N*(2M+1)^2 op model — the
only budget line where measured >> modeled with no recorded explanation.

Hypothesis under test: the cost is the HBM round trip of the staged
structure-factor intermediate, not MACs. Whatever contraction order XLA
picks for einsum('n,nx,ny,nz->xyz'), it must materialize either
(N, (M+1)(2M+1)) [pair x first: 561 cols -> 105 MB complex64 at DHFR] or
(N, (2M+1)^2) [pair yz first: 1089 cols -> 205 MB], written + read once
per pass — and SF_PRECISION=HIGH runs THREE bf16 passes per matmul. At
~819 GB/s v5e HBM bandwidth those are sub-ms-to-ms scale numbers, i.e.
the measured time.

Measures, slope-timed in-program:
  1. forward E_rec only (current einsum)
  2. E_rec + grad (the production cost; backward has 3 heavy contractions)
  3. forward variants with hand-staged intermediates:
       xy-first (N, 561) vs yz-first (N, 1089) — NO reshapes (the axon
       backend miscompiles reshape-of-padded-3D + dot, CLAUDE.md rule 4);
       staging is expressed with elementwise outer products + einsum
  4. numerics of each variant vs the shipped path (miscompile guard)

Run: timeout 1750 python -m openmmtools_tpu.scripts.profile_recip
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.constants import ONE_4PI_EPS0
from openmmtools_tpu.ops.pme import SF_PRECISION, _phase_tables
from openmmtools_tpu.scripts.bench_recip_scaling import build, time_inprogram

N = 23500


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    term, x, box, box_edge = build(N)
    M = int(term.kmax)
    print(f"N={N} kmax={M} box={box_edge:.2f} nm "
          f"SF_PRECISION={SF_PRECISION}", flush=True)
    x = jnp.asarray(x)
    box = jnp.asarray(box)

    def e_rec(xx):
        return term.energy(xx, box, None)

    # 1. forward only
    def fwd_step(a):
        return a + 1e-20 * e_rec(a)

    t_fwd, _ = time_inprogram(fwd_step, x, iters=20)
    print(f"forward E_rec:            {t_fwd * 1e3:7.3f} ms", flush=True)

    # 2. forward + gradient (production cost)
    def fg_step(a):
        u, g = jax.value_and_grad(e_rec)(a)
        return a + 1e-20 * g

    t_fg, _ = time_inprogram(fg_step, x, iters=20)
    print(f"E_rec + grad:             {t_fg * 1e3:7.3f} ms "
          f"(backward ~ {1e3 * (t_fg - t_fwd):.3f} ms)", flush=True)

    # 3. staged-forward variants (energy only, weight-summed |S|^2)
    lengths = jnp.diagonal(box)
    volume = jnp.prod(lengths)
    two_pi = 2.0 * jnp.pi
    w = term.weight_grid(box)
    q = jnp.asarray(term.charge)
    pref = ONE_4PI_EPS0 * (two_pi / volume)

    def tables(xx):
        tx = (two_pi / lengths[0]) * xx[:, 0]
        ty = (two_pi / lengths[1]) * xx[:, 1]
        tz = (two_pi / lengths[2]) * xx[:, 2]
        return (_phase_tables(tx, M, half=True), _phase_tables(ty, M),
                _phase_tables(tz, M))

    def v_oneshot(xx):
        Px, Py, Pz = tables(xx)
        S = jnp.einsum('n,nx,ny,nz->xyz',
                       jax.lax.complex(q, jnp.zeros_like(q)),
                       Px, Py, Pz, precision=SF_PRECISION)
        return pref * jnp.sum(w * (jnp.real(S) ** 2 + jnp.imag(S) ** 2))

    def v_xy_first(xx):
        Px, Py, Pz = tables(xx)
        A = jax.lax.complex(q, jnp.zeros_like(q))[:, None] * Px   # (N, M+1)
        Pxy = A[:, :, None] * Py[:, None, :]                      # (N, M+1, 2M+1)
        S = jnp.einsum('nxy,nz->xyz', Pxy, Pz, precision=SF_PRECISION)
        return pref * jnp.sum(w * (jnp.real(S) ** 2 + jnp.imag(S) ** 2))

    def v_yz_first(xx):
        Px, Py, Pz = tables(xx)
        A = jax.lax.complex(q, jnp.zeros_like(q))[:, None] * Px
        Pyz = Py[:, :, None] * Pz[:, None, :]                     # (N, 2M+1, 2M+1)
        S = jnp.einsum('nx,nyz->xyz', A, Pyz, precision=SF_PRECISION)
        return pref * jnp.sum(w * (jnp.real(S) ** 2 + jnp.imag(S) ** 2))

    e_ref = None
    for label, fn in (("oneshot (shipped form)", v_oneshot),
                      ("staged xy-first (N,561)", v_xy_first),
                      ("staged yz-first (N,1089)", v_yz_first)):
        def step(a, fn=fn):
            return a + 1e-20 * fn(a)

        t, _ = time_inprogram(step, x, iters=20)
        e_val = float(jax.jit(fn)(x))
        if e_ref is None:
            e_ref = e_val
        rel = abs(e_val - e_ref) / max(abs(e_ref), 1e-9)
        print(f"fwd {label:26s}: {t * 1e3:7.3f} ms  E={e_val:.3f} "
              f"(rel vs shipped {rel:.2e})", flush=True)

    # HBM traffic model
    bw = 819e9  # v5e HBM GB/s
    for label, cols in (("xy-first", (M + 1) * (2 * M + 1)),
                        ("yz-first", (2 * M + 1) ** 2)):
        bytes_int = N * cols * 8  # complex64
        t_model = 2 * bytes_int / bw
        print(f"traffic model {label}: intermediate {bytes_int / 1e6:.0f} MB"
              f" -> {t_model * 1e3:.3f} ms/pass (write+read, f32 pair)",
              flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
