"""DHFR reciprocal-space model-gap profile (VERDICT r4 item 3).

Round 4 measured the factorized Ewald at DHFR shape (N=23.5k, kmax=16) at
1.27 ms isolated / 1.61 ms in-situ vs a 0.54 ms N*(2M+1)^2 op model — the
only budget line where measured >> modeled with no recorded explanation.

Round-5 findings so far (first pass of this script): forward E_rec
0.364 ms, E_rec+grad 1.139 ms (backward ~0.776 ms) — and the backward's
three per-axis contractions each force a DIFFERENT (N, ~K^2) staged
phase-product intermediate into HBM (yz 205 MB + xz 105 + xy 105 at
DHFR; model 0.26-0.50 ms/pass write+read at 819 GB/s), which explains
the gap: the cost is staging traffic, not MACs.

This pass measures the fixes, each A/B'd on hardware with grad numerics
pinned against a NumPy f64 reference (a cheaper pass is admitted only
inside the 5e-4 Ewald force tolerance):
  1. SF_BWD_SHARED — all four complex-path finishing sums fold into ONE
     matmul against ONE shared (N, (2M+1)^2) staging (measured r5:
     E+grad 0.929 -> 0.753 ms);
  2. SF_IMPL='real' — parity-folded cos/sin basis: real charges make
     w(k) even in ky/kz, and the sign-summed |S|^2 diagonalizes in the
     cos/sin basis, halving staged columns AND real MACs in both
     directions (see the pme.py real-basis note);
  3. SF_BWD_PRECISION=DEFAULT — 1-pass bf16 backward (REFUTED for the
     complex path at 2.8e-3 > 5e-4; re-measured for the real basis).

Run: timeout 1750 python -m openmmtools_tpu.scripts.profile_recip
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import openmmtools_tpu.ops.pme as pme
from openmmtools_tpu.scripts.bench_recip_scaling import build, time_inprogram

N = 23500


def f64_reference_grad(term, x, box):
    """NumPy f64 oracle for dE_rec/dx (factorized path, full precision)."""
    M = int(term.kmax)
    lengths = np.diagonal(np.asarray(box, np.float64))
    volume = float(np.prod(lengths))
    two_pi = 2.0 * np.pi
    q = np.asarray(term.charge, np.float64)
    xx = np.asarray(x, np.float64)
    th = [two_pi * xx[:, c] / lengths[c] for c in range(3)]
    mjx = np.arange(0, M + 1, dtype=np.float64)
    mj = np.arange(-M, M + 1, dtype=np.float64)
    Px = np.exp(1j * th[0][:, None] * mjx[None, :])
    Py = np.exp(1j * th[1][:, None] * mj[None, :])
    Pz = np.exp(1j * th[2][:, None] * mj[None, :])
    kx = two_pi * mjx / lengths[0]
    ky = two_pi * mj / lengths[1]
    kz = two_pi * mj / lengths[2]
    k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
          + kz[None, None, :] ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_k2 = np.where(k2 > 0, 1.0 / k2, 0.0)
    herm = np.where(mjx > 0, 2.0, 1.0)[:, None, None]
    w = herm * np.exp(-k2 / (4.0 * term.alpha ** 2)) * inv_k2
    S = np.einsum('n,nx,ny,nz->xyz', q.astype(np.complex128), Px, Py, Pz,
                  optimize=True)
    B = w * np.conj(S)
    pref = pme.ONE_4PI_EPS0 * (two_pi / volume)
    # dE/dtheta_c = -2 pref q Im(H_c); dE/dx_c = dE/dtheta_c * 2 pi / L_c
    grads = []
    for c in range(3):
        if c == 0:
            Hc = np.einsum('xyz,nx,ny,nz->n', B * mjx[:, None, None],
                           Px, Py, Pz, optimize=True)
        elif c == 1:
            Hc = np.einsum('xyz,nx,ny,nz->n', B * mj[None, :, None],
                           Px, Py, Pz, optimize=True)
        else:
            Hc = np.einsum('xyz,nx,ny,nz->n', B * mj[None, None, :],
                           Px, Py, Pz, optimize=True)
        dth = pref * q * (-2.0) * np.imag(Hc)
        grads.append(dth * two_pi / lengths[c])
    return np.stack(grads, axis=1)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    term, x, box, box_edge = build(N)
    M = int(term.kmax)
    print(f"N={N} kmax={M} box={box_edge:.2f} nm "
          f"SF_PRECISION={pme.SF_PRECISION}", flush=True)
    x = jnp.asarray(x)
    box = jnp.asarray(box)

    def e_rec(xx):
        return term.energy(xx, box, None)

    # forward only (backward structure doesn't matter here)
    def fwd_step(a):
        return a + 1e-20 * e_rec(a)

    t_fwd_by_impl = {}
    for impl in ("complex", "real"):
        pme.SF_IMPL = impl
        t_fwd, _ = time_inprogram(fwd_step, x, iters=100, reps=10,
                                  agg="min")
        t_fwd_by_impl[impl] = t_fwd
        print(f"forward E_rec [{impl:7s}]:  {t_fwd * 1e3:7.3f} ms",
              flush=True)

    print("computing f64 reference grad (NumPy, host)...", flush=True)
    t0 = time.perf_counter()
    g_ref = f64_reference_grad(term, x, box)
    g_scale = float(np.max(np.abs(g_ref)))
    print(f"  done in {time.perf_counter() - t0:.0f}s "
          f"(max |g| = {g_scale:.3e})", flush=True)

    def fg_step(a):
        u, g = jax.value_and_grad(e_rec)(a)
        return a + 1e-20 * g

    combos = [
        ("complex 3-axis HIGH bwd (r4)", "complex", False, None),
        ("complex shared HIGH bwd", "complex", True, None),
        ("REAL-BASIS HIGH (r5 default)", "real", True, None),
        ("REAL-BASIS DEFAULT bwd (bf16)", "real", True,
         jax.lax.Precision.DEFAULT),
    ]
    for label, impl, shared, bwd_prec in combos:
        pme.SF_IMPL = impl
        pme.SF_BWD_SHARED = shared
        pme.SF_BWD_PRECISION = bwd_prec
        t_fg, _ = time_inprogram(fg_step, x, iters=100, reps=10,
                                 agg="min")
        g = jax.jit(jax.grad(e_rec))(x)
        g = np.asarray(jax.device_get(g), np.float64)
        # max error relative to the global force scale (the Ewald 5e-4
        # tolerance is defined on the total-force scale, not per tiny
        # component)
        err = float(np.max(np.abs(g - g_ref))) / g_scale
        t_fwd = t_fwd_by_impl[impl]
        print(f"E+grad {label:34s}: {t_fg * 1e3:7.3f} ms  "
              f"(bwd ~{1e3 * (t_fg - t_fwd):6.3f} ms, max err/scale "
              f"{err:.2e})", flush=True)
    pme.SF_IMPL = "real"
    pme.SF_BWD_SHARED = True
    pme.SF_BWD_PRECISION = None
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
