"""DHFR per-step component budget (round-5 142 -> 150 steps/s push).

Decomposes the production BAOAB step at DHFR shape (23,558 atoms, PME,
h-bond constraints) into its device-time components, each timed with the
slope-cancelling in-program chain (bench_recip_scaling.time_inprogram):

  - full step        : b.run() per-step wall (the end-to-end number)
  - sweep eval       : _sweep_eval = kernel + barriered gathers + XLA
                       remainder (exceptions + bonded + reciprocal)
  - remainder        : the XLA value_and_grad of (exceptions + other
                       terms) alone
  - remainder-no-rec : same minus the EwaldReciprocalTerm -> the in-situ
                       reciprocal cost by difference
  - recip isolated   : EwaldReciprocalTerm E+grad alone (the
                       profile_recip.py number, for the scheduling gap)
  - constraints      : SETTLE + M-SHAKE position projection + RATTLE
                       velocity projection at step-scale violation

Run: timeout 1750 python -m openmmtools_tpu.scripts.profile_dhfr_step
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import DHFRExplicit
from openmmtools_tpu.ops.pme import EwaldReciprocalTerm
from openmmtools_tpu.scripts.bench_recip_scaling import time_inprogram


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    t0 = time.perf_counter()
    d = DHFRExplicit()
    print(f"DHFR built in {time.perf_counter()-t0:.0f}s", flush=True)

    integ = BAOABIntegrator(temperature=300.0, collision_rate=1.0,
                            timestep=0.002)
    b = integ.bind(d.system)
    assert b.sweep_mode
    s = b.initial_state(d.sampler_state(), jax.random.PRNGKey(0),
                        temperature=300.0)
    jax.block_until_ready(s.positions)

    # steady state + warm caches: run one chunk, then time the second
    s = b.run(s, 500)
    jax.block_until_ready(s.positions)
    t0 = time.perf_counter()
    s = b.run(s, 500)
    jax.block_until_ready(s.positions)
    t_full = (time.perf_counter() - t0) / 500
    print(f"full step            : {t_full*1e3:7.3f} ms "
          f"({1.0/t_full:,.0f} steps/s)", flush=True)

    x0 = s.positions
    box = s.box if s.box is not None else jnp.asarray(d.system.default_box)
    params = s.global_params or {}
    sw = {"perm": s.sweep_perm, "inv": s.sweep_inv, "snap": s.sweep_snap,
          "nblk": s.sweep_nblk, "excl": s.sweep_excl}

    def t_of(step, label, x=x0):
        t, _ = time_inprogram(step, x, iters=60, reps=8, agg="min")
        print(f"{label:21s}: {t*1e3:7.3f} ms", flush=True)
        return t

    # -- sweep eval (kernel + gathers + full XLA remainder) ---------------
    def sweep_step(a):
        u, F, _ = b._sweep_eval(a, box, params, sw)
        return a + 1e-20 * F

    t_sweep = t_of(sweep_step, "sweep eval (k+rem)")

    # -- Pallas kernel alone (sorted coords prepared outside) -------------
    k = b._sweep_kernel
    term0 = b._sweep_term
    from openmmtools_tpu.ops.geometry import gather_rows as _gr

    n = b.system.n_particles
    L = jnp.diagonal(box)
    xw = x0 - L * jnp.floor(x0 / L)
    y = _gr(xw, sw["perm"])
    pad = k.n_pad - n
    y_pad = jnp.concatenate([y, jnp.full((pad, 3), 1e6, y.dtype)]) \
        if pad else y
    par = jnp.stack([jnp.asarray(term0.sigma),
                     jnp.asarray(b._sweep_sqrt_eps),
                     jnp.asarray(term0.charge)], axis=1)[
        jnp.asarray(sw["perm"])]
    par_pad = jnp.concatenate(
        [par, jnp.zeros((pad, par.shape[1]), par.dtype)]) if pad else par
    nblk0 = jnp.maximum(sw["nblk"], 0)

    def kernel_step(yy):
        F_s, u_s, _ = k.forces(yy, par_pad, box, sw["excl"],
                               jnp.zeros((), bool), nblk0)
        return yy + 1e-20 * F_s

    t_of(kernel_step, "pallas kernel only", x=y_pad)

    # -- XLA remainder alone ---------------------------------------------
    term = b._sweep_term
    g = b._sweep_group
    other_terms = tuple(
        t for t in b.system.terms
        if t is not term and (g is None or t.force_group == g))
    from openmmtools_tpu.ops import nonbonded

    def u_rest_terms(xx, terms):
        tot = jnp.zeros((), xx.dtype)
        if term.exception_index.shape[0] > 0:
            tot = tot + nonbonded.pair_list_energy(
                xx, box, term.exception_index,
                term.exception_chargeprod, term.exception_sigma,
                term.exception_epsilon,
                method="no_cutoff", periodic=term.periodic)
        for t in terms:
            tot = tot + t.energy(xx, box, params)
        return tot

    def rem_step(a):
        u, gr = jax.value_and_grad(
            lambda xx: u_rest_terms(xx, other_terms))(a)
        return a + 1e-20 * gr

    t_rem = t_of(rem_step, "remainder (all)")

    no_recip = tuple(t for t in other_terms
                     if not isinstance(t, EwaldReciprocalTerm))
    recip = [t for t in other_terms if isinstance(t, EwaldReciprocalTerm)]

    def rem_norec_step(a):
        u, gr = jax.value_and_grad(
            lambda xx: u_rest_terms(xx, no_recip))(a)
        return a + 1e-20 * gr

    t_norec = t_of(rem_norec_step, "remainder w/o recip")
    print(f"  -> in-situ recip   : {1e3*(t_rem-t_norec):7.3f} ms",
          flush=True)

    if recip:
        rt = recip[0]

        def recip_step(a):
            u, gr = jax.value_and_grad(
                lambda xx: rt.energy(xx, box, params))(a)
            return a + 1e-20 * gr

        t_recip = t_of(recip_step, "recip isolated")

        # reciprocal WITHOUT the O(E) exclusion-correction remainder
        q = rt.effective_charge(params)

        def recip_rec_only(a):
            lengths = jnp.diagonal(box)
            vol = jnp.prod(lengths)
            u, gr = jax.value_and_grad(
                lambda xx: rt._reciprocal_factorized(
                    q, xx, lengths, vol))(a)
            return a + 1e-20 * gr

        t_of(recip_rec_only, "recip k-space only")

    # exceptions-only (the O(E) direct-space add-back)
    def exc_step(a):
        u, gr = jax.value_and_grad(
            lambda xx: u_rest_terms(xx, ()))(a)
        return a + 1e-20 * gr

    t_of(exc_step, "exceptions only")

    # -- constraints at step-scale violation ------------------------------
    def cpos_step(a):
        moved = a + 1e-4 * jnp.sin(1.7 * a)
        return b._constrain_positions(moved, a)

    t_of(cpos_step, "constrain positions")

    v0 = s.velocities

    def cvel_step(vv):
        return b._constrain_velocities(x0, vv)

    t_of(cvel_step, "constrain velocities", x=v0)

    print(f"\nfull {t_full*1e3:.3f} vs sweep-eval {t_sweep*1e3:.3f} "
          f"-> integrator+constraints+misc "
          f"{1e3*(t_full-t_sweep):7.3f} ms", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
