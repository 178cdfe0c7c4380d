"""Atom-axis (spatial) sharding of one system's force evaluation.

SURVEY §2.3 item 2: the reference delegates intra-system parallelism to
OpenMM's atom-parallel GPU kernels; scaling one system past a single
TensorCore here means sharding the O(N^2)/O(N K^3) work over a mesh axis.
This module shard_maps the two FLOP-dominant pieces:

* **Direct space** (dense LJ/Coulomb/erfc pair sum): row-block
  decomposition. Each device evaluates the (N/D, N) ordered-pair plane of
  its owned rows against all columns (ops/pair_forces.py rect mode) — the
  half-sum of ordered pairs psums to the exact total energy, and each
  device's row sums ARE its atoms' exact forces. No halo exchange: x is
  replicated (N*12 bytes, trivially small next to the pair planes), so the
  only collectives are one psum(scalar) and the implicit all-gather of x.
* **Reciprocal space** (factorized Ewald structure factors): S(k) is a sum
  over particles, so each device contracts its atom block's phase tables
  and the partial S psums across the mesh — O(N/D * K^3) MACs per device.
  The hand-written VJP (pme._sf_bwd — the autodiff backward picks a
  pathological contraction path on TPU) applies unchanged with the global
  S and local phases, so block forces cost the same three heavy
  contractions per device.

O(N)/O(E) remainders (bonded terms, nonbonded exceptions, exclusion
corrections, Ewald self energy, dispersion tail) are computed REPLICATED —
identical work on every device, zero communication — and their forces
row-sliced. GBSA and softcore alchemical terms currently ride this
replicated path too (they are O(N^2): sharding them is the recorded
follow-up, ROADMAP round-5 notes).

Projected scaling: at DHFR (23.5k atoms) the dense direct space + recip
are ~95% of the step FLOPs, so D devices give ~D-fold on those pieces
with a replicated O(N) tail — and the real production path (the sorted
sweep kernel) partitions the same way by ring blocks once multi-chip
hardware is available.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from openmmtools_tpu.constants import ONE_4PI_EPS0
from openmmtools_tpu.ops import nonbonded, pair_forces
from openmmtools_tpu.ops import pme as _pme
from openmmtools_tpu.ops.pme import EwaldReciprocalTerm, _sf_bwd, _sf_forward
from openmmtools_tpu.system import NonbondedTerm, _param

__all__ = ["make_sharded_energy_force_fn"]


# ---------------------------------------------------------------------------
# sharded structure-factor weighted sum
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _sf_weighted_sum_sharded(q, tx, ty, tz, w, M, axis_name):
    """W = sum_k w(k) |S(k)|^2 with S = psum of per-device partial structure
    factors over the ``axis_name`` mesh axis. Identical math to
    pme._sf_weighted_sum with the particle sum distributed; the backward
    reuses pme._sf_bwd verbatim (local phase tables x global S)."""
    S_local = _sf_forward(q, tx, ty, tz, M)
    S = jax.lax.complex(jax.lax.psum(jnp.real(S_local), axis_name),
                        jax.lax.psum(jnp.imag(S_local), axis_name))
    s2 = jnp.real(S) ** 2 + jnp.imag(S) ** 2
    return jnp.sum(w * s2)


def _sfs_fwd(q, tx, ty, tz, w, M, axis_name):
    S_local = _sf_forward(q, tx, ty, tz, M)
    S = jax.lax.complex(jax.lax.psum(jnp.real(S_local), axis_name),
                        jax.lax.psum(jnp.imag(S_local), axis_name))
    s2 = jnp.real(S) ** 2 + jnp.imag(S) ** 2
    return jnp.sum(w * s2), (q, tx, ty, tz, w, S)


def _sfs_bwd(M, axis_name, res, g):
    # pme._sf_bwd computes per-particle cotangents from the particle-local
    # phase tables and the (here: global, psum'd) S — exactly the partial
    # derivative of W w.r.t. this device's block
    return _sf_bwd(M, res, g)


_sf_weighted_sum_sharded.defvjp(_sfs_fwd, _sfs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _sf_weighted_sum_real_sharded(q, tx, ty, tz, w, M, axis_name):
    """Real-basis (parity-folded) sharded analog: the T tensor is a sum
    over particles, so each device contracts its block and the partial T
    psums; the backward reuses pme._sfr_bwd verbatim (local cos/sin
    tables x global T). Dispatch follows pme.SF_IMPL."""
    T_local, _, _, _ = _pme._sf_forward_real(q, tx, ty, tz, M)
    T = jax.lax.psum(T_local, axis_name)
    return jnp.sum(_pme._real_weight_full(w, M) * T * T)


def _sfrs_fwd(q, tx, ty, tz, w, M, axis_name):
    T_local, _, _, _ = _pme._sf_forward_real(q, tx, ty, tz, M)
    T = jax.lax.psum(T_local, axis_name)
    return (jnp.sum(_pme._real_weight_full(w, M) * T * T),
            (q, tx, ty, tz, w, T))


def _sfrs_bwd(M, axis_name, res, g):
    return _pme._sfr_bwd(M, res, g)


_sf_weighted_sum_real_sharded.defvjp(_sfrs_fwd, _sfrs_bwd)


# ---------------------------------------------------------------------------
# the sharded evaluator
# ---------------------------------------------------------------------------


def make_sharded_energy_force_fn(system, mesh: Mesh, axis_name: str = "atom"):
    """Return ``(x, box, params) -> (U, F)`` evaluated SPMD over
    ``mesh[axis_name]`` with exact single-device semantics.

    Parity contract: U and F match :func:`system.make_energy_force_fn` to
    reduction-order rounding (tests/test_atom_shard.py pins <= 1e-5 rel at
    DHFR scale on the virtual 8-mesh). Not yet supported sharded: virtual
    sites (TIP4P/TIP5P) — raises, use the unsharded path.
    """
    if system.virtual_sites is not None and system.virtual_sites.n_sites > 0:
        raise NotImplementedError(
            "atom-axis sharding does not support virtual-site systems yet; "
            "use the unsharded energy/force path")
    n_devices = mesh.shape[axis_name]
    n = system.n_particles
    block = -(-n // n_devices)
    n_pad = block * n_devices

    def pad1(arr):
        arr = np.asarray(arr)
        if n_pad == n:
            return arr
        return np.concatenate([arr, np.zeros((n_pad - n,), arr.dtype)])

    nb_terms = [t for t in system.terms if type(t) is NonbondedTerm]
    recip_terms = [t for t in system.terms
                   if isinstance(t, EwaldReciprocalTerm)
                   and t.kmax is not None]
    shard_ids = {id(t) for t in nb_terms + recip_terms}
    other_terms = [t for t in system.terms if id(t) not in shard_ids]
    nb_padded = [(t, pad1(t.charge), pad1(t.sigma), pad1(t.epsilon))
                 for t in nb_terms]

    def _recip_block_energy(term, x_blk, row_start, box, params):
        """Reciprocal-space energy as a function of this device's atom
        block; the psum inside makes the value replicated-global, and its
        grad w.r.t. x_blk is the block's exact reciprocal force."""
        q = term.effective_charge(params)
        q_blk = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([jnp.asarray(q),
                             jnp.zeros((n_pad - n,), x_blk.dtype)])
            if n_pad != n else jnp.asarray(q), row_start, block)
        lengths = jnp.diagonal(box)
        volume = jnp.prod(lengths)
        two_pi = 2.0 * jnp.pi
        w = term.weight_grid(box)
        sf = (_sf_weighted_sum_real_sharded if _pme.SF_IMPL == "real"
              else _sf_weighted_sum_sharded)
        W = sf(q_blk.astype(x_blk.dtype),
               (two_pi / lengths[0]) * x_blk[:, 0],
               (two_pi / lengths[1]) * x_blk[:, 1],
               (two_pi / lengths[2]) * x_blk[:, 2],
               w.astype(x_blk.dtype), int(term.kmax), axis_name)
        return ONE_4PI_EPS0 * (two_pi / volume) * W

    def body(x_blk, x, box, params):
        row_start = jax.lax.axis_index(axis_name) * block
        u_shard = jnp.zeros((), x.dtype)
        f_blk = jnp.zeros((block, 3), x.dtype)
        u_repl = jnp.zeros((), x.dtype)
        f_full = jnp.zeros_like(x)

        for term, q_pad, sig_pad, eps_pad in nb_padded:
            charge_scale = _param(params, term.charge_scale_param, None)
            lj_scale = _param(params, term.lj_scale_param, None)
            charges = q_pad
            if charge_scale is None and not np.any(q_pad):
                charges = None
            u, f = pair_forces.dense_pair_energy_forces(
                x, box, charges, sig_pad, eps_pad,
                method=term.method, cutoff=term.cutoff,
                switch_width=term.switch_width,
                dielectric=term.dielectric, alpha=term.ewald_alpha,
                periodic=term.periodic, charge_scale=charge_scale,
                lj_scale=lj_scale, shift_rf=term.shift_rf,
                switch_coulomb=term.switch_coulomb,
                exclude_index=term.exception_index,
                row_start=row_start, row_block=block, n_valid=n)
            u_shard = u_shard + u
            f_blk = f_blk + f
            # O(E)/O(1) remainders, replicated
            if term.exception_index.shape[0] > 0:
                u_exc, f_exc = pair_forces.pair_list_energy_forces(
                    x, box, term.exception_index,
                    term.exception_chargeprod, term.exception_sigma,
                    term.exception_epsilon,
                    method="no_cutoff", periodic=term.periodic)
                u_repl = u_repl + u_exc
                f_full = f_full + f_exc
            if term.use_dispersion_correction and term.periodic:
                u_repl = u_repl + nonbonded.dispersion_correction_energy(
                    box, term.sigma, term.epsilon, term.cutoff,
                    lj_scale=lj_scale)

        for term in recip_terms:
            u_rec, g = jax.value_and_grad(
                lambda xb, t=term: _recip_block_energy(
                    t, xb, row_start, box, params))(x_blk)
            u_repl = u_repl + u_rec  # already global via the inner psum
            f_blk = f_blk - g
            # self + exclusion corrections: O(N)+O(E), replicated
            q = term.effective_charge(params)

            def u_rest(xx, t=term, q=q):
                return t.self_exclusion_energy(q, xx, box)

            u_se, g_se = jax.value_and_grad(u_rest)(x)
            u_repl = u_repl + u_se
            f_full = f_full - g_se

        for term in other_terms:
            if hasattr(term, "energy_forces"):
                u, f = term.energy_forces(x, box, params)
            else:
                u, g = jax.value_and_grad(
                    lambda xx, t=term: t.energy(xx, box, params))(x)
                f = -g
            u_repl = u_repl + u
            f_full = f_full + f

        u_total = jax.lax.psum(u_shard, axis_name) + u_repl
        f_blk = f_blk + jax.lax.dynamic_slice_in_dim(f_full, row_start,
                                                     block)
        return u_total, f_blk

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P()),
        out_specs=(P(), P(axis_name)), check_vma=False)

    def energy_force_fn(x, box=None, params: Optional[dict] = None):
        if box is None:
            box = system.default_box
        box = jnp.asarray(box, dtype=x.dtype)
        params = {} if params is None else params
        if n_pad != n:
            x_pad = jnp.concatenate(
                [x, jnp.zeros((n_pad - n, 3), x.dtype)])
        else:
            x_pad = x
        u, f = sharded(x_pad, x_pad, box, params)
        return u, f[:n]

    return energy_force_fn
