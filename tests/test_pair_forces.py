"""Analytic dense pair forces vs autodiff of the reference energy.

The hand-differentiated (U, F) kernel (ops/pair_forces.py) is the
integrator's force provider; these tests pin it to jax.value_and_grad
of the dense energy (ops/nonbonded.py) — the correctness oracle — over
every electrostatics method, switching, exceptions, and scale hooks.
Mirrors the reference's cross-platform force validation
(scripts/test_openmm_platforms.py:154, 0.06 kcal/mol tolerance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.ops.nonbonded import all_pairs_energy
from openmmtools_tpu.ops.pair_forces import dense_pair_energy_forces
from openmmtools_tpu.system import NonbondedTerm, System, no_constraints


def _random_config(n=64, L=3.0, seed=0, charged=True):
    rng = np.random.default_rng(seed)
    # jittered lattice: no hard overlaps, so f32 comparisons stay tight
    g = int(np.ceil(n ** (1 / 3)))
    lattice = np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"),
                       axis=-1).reshape(-1, 3)[:n]
    x = (lattice + 0.5) * (L / g) + rng.normal(0, 0.02 * L / g, (n, 3))
    q = rng.uniform(-0.5, 0.5, n) if charged else np.zeros(n)
    q -= q.mean()
    sig = rng.uniform(0.25, 0.4, n)
    eps = rng.uniform(0.2, 1.0, n)
    box = jnp.diag(jnp.full((3,), L, jnp.float32))
    return (jnp.asarray(x, jnp.float32), box, jnp.asarray(q, jnp.float32),
            jnp.asarray(sig, jnp.float32), jnp.asarray(eps, jnp.float32))


CASES = [
    dict(method="no_cutoff", periodic=False),
    dict(method="cutoff_periodic", cutoff=1.0, periodic=True),
    dict(method="cutoff_periodic", cutoff=1.0, switch_width=0.3,
         periodic=True),
    dict(method="cutoff_nonperiodic", cutoff=1.0, periodic=False),
    dict(method="pme", cutoff=1.0, alpha=3.0, periodic=True),
    dict(method="ewald", cutoff=1.2, alpha=2.5, switch_width=0.2,
         periodic=True),
]


@pytest.mark.parametrize("kw", CASES, ids=[
    "nocutoff", "rf", "rf-switch", "rf-nonperiodic", "pme", "ewald-switch"])
@pytest.mark.parametrize("charged", [True, False])
def test_dense_matches_autodiff(kw, charged):
    x, box, q, sig, eps = _random_config(charged=charged)

    def u_fn(xx):
        return all_pairs_energy(x=xx, box=box, charges=q, sigmas=sig,
                                epsilons=eps, **kw)

    u_ref, g = jax.value_and_grad(u_fn)(x)
    u, f = dense_pair_energy_forces(x, box, q if charged else None, sig,
                                    eps, **kw)
    f_scale = float(jnp.max(jnp.abs(g))) + 1.0
    assert abs(float(u - u_ref)) <= 2e-4 * (abs(float(u_ref)) + 1.0)
    assert float(jnp.max(jnp.abs(f + g))) <= 2e-4 * f_scale


def test_unshifted_switched_rf_matches_autodiff():
    """shift_rf=False + switch_coulomb=True (UnshiftedReactionFieldForce
    analog, reference forces.py:1110)."""
    x, box, q, sig, eps = _random_config(seed=11)
    kw = dict(method="cutoff_periodic", cutoff=1.0, switch_width=0.3,
              periodic=True, shift_rf=False, switch_coulomb=True)

    def u_fn(xx):
        return all_pairs_energy(x=xx, box=box, charges=q, sigmas=sig,
                                epsilons=eps, **kw)

    u_ref, g = jax.value_and_grad(u_fn)(x)
    u, f = dense_pair_energy_forces(x, box, q, sig, eps, **kw)
    f_scale = float(jnp.max(jnp.abs(g))) + 1.0
    assert abs(float(u - u_ref)) <= 2e-4 * (abs(float(u_ref)) + 1.0)
    assert float(jnp.max(jnp.abs(f + g))) <= 2e-4 * f_scale


def test_replace_reaction_field_unshifts_and_switches():
    """After replace_reaction_field the pair energy must go to zero
    continuously at the cutoff (c_rf = 0 + whole-energy switch)."""
    from openmmtools_tpu.forces import replace_reaction_field
    from openmmtools_tpu.system import System, no_constraints

    q = jnp.asarray([0.4, -0.4], jnp.float32)
    sig = jnp.full((2,), 0.3, jnp.float32)
    eps = jnp.full((2,), 0.5, jnp.float32)
    zero2 = jnp.zeros((0, 2), jnp.int32)
    zero = jnp.zeros((0,), jnp.float32)
    term = NonbondedTerm(charge=q, sigma=sig, epsilon=eps,
                         exception_index=zero2, exception_chargeprod=zero,
                         exception_sigma=zero, exception_epsilon=zero,
                         method="cutoff_periodic", cutoff=1.0,
                         switch_width=0.2)
    box = jnp.diag(jnp.full((3,), 5.0, jnp.float32))
    system = System(masses=jnp.ones((2,), jnp.float32), terms=(term,),
                    constraints=no_constraints(), default_box=box,
                    periodic=True)
    rf = replace_reaction_field(system)
    new_term = rf.terms[0]
    assert new_term.shift_rf is False and new_term.switch_coulomb is True

    def u_at(r, t):
        x = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]], jnp.float32)
        return float(t.energy(x, box, {}))

    # unshifted switched RF: the whole-energy switch takes U -> 0 at rc
    assert abs(u_at(0.999, new_term)) < 1e-4
    # well inside the cutoff, c_rf = 0 raises the energy by c_rf*qq
    from openmmtools_tpu.ops.nonbonded import reaction_field_constants
    from openmmtools_tpu.constants import ONE_4PI_EPS0

    _, c_rf = reaction_field_constants(1.0, 78.3)
    # removing the -c_rf*kqq shift raises the energy by +c_rf*kqq
    expected = ONE_4PI_EPS0 * float(q[0] * q[1]) * c_rf
    d = u_at(0.5, new_term) - u_at(0.5, term)
    assert abs(d - expected) < 1e-3 * abs(expected)


def test_scales_match_autodiff():
    x, box, q, sig, eps = _random_config(seed=3)
    kw = dict(method="cutoff_periodic", cutoff=1.0, switch_width=0.25,
              periodic=True)

    def u_fn(xx):
        return all_pairs_energy(x=xx, box=box, charges=q, sigmas=sig,
                                epsilons=eps, charge_scale=0.5,
                                lj_scale=0.7, **kw)

    u_ref, g = jax.value_and_grad(u_fn)(x)
    u, f = dense_pair_energy_forces(x, box, q, sig, eps, charge_scale=0.5,
                                    lj_scale=0.7, **kw)
    f_scale = float(jnp.max(jnp.abs(g))) + 1.0
    assert abs(float(u - u_ref)) <= 2e-4 * (abs(float(u_ref)) + 1.0)
    assert float(jnp.max(jnp.abs(f + g))) <= 2e-4 * f_scale


def _term_with_exceptions(q, sig, eps, method="cutoff_periodic", **kw):
    n = q.shape[0]
    exc = jnp.asarray([[0, 1], [2, 3], [1, 4]], jnp.int32)
    return NonbondedTerm(
        charge=q, sigma=sig, epsilon=eps,
        exception_index=exc,
        exception_chargeprod=jnp.asarray([0.0, 0.05, -0.02], jnp.float32),
        exception_sigma=jnp.asarray([0.3, 0.31, 0.28], jnp.float32),
        exception_epsilon=jnp.asarray([0.0, 0.4, 0.2], jnp.float32),
        method=method, **kw)


def test_term_energy_forces_with_exceptions():
    x, box, q, sig, eps = _random_config(seed=5)
    term = _term_with_exceptions(q, sig, eps, cutoff=1.0, switch_width=0.2,
                                 use_dispersion_correction=True)
    u_ref, g = jax.value_and_grad(lambda xx: term.energy(xx, box, {}))(x)
    u, f = term.energy_forces(x, box, {})
    f_scale = float(jnp.max(jnp.abs(g))) + 1.0
    assert abs(float(u - u_ref)) <= 2e-4 * (abs(float(u_ref)) + 1.0)
    assert float(jnp.max(jnp.abs(f + g))) <= 2e-4 * f_scale


def test_make_energy_force_fn_mixed_terms():
    """System-level (U, F): analytic nonbonded + autodiff bonded terms."""
    from openmmtools_tpu.system import HarmonicBondTerm, make_energy_fn, \
        make_energy_force_fn

    x, box, q, sig, eps = _random_config(seed=7)
    nb = _term_with_exceptions(q, sig, eps, cutoff=1.0)
    bonds = HarmonicBondTerm(index=jnp.asarray([[0, 1], [5, 9]], jnp.int32),
                             length=jnp.asarray([0.15, 0.2], jnp.float32),
                             k=jnp.asarray([1000.0, 800.0], jnp.float32))
    system = System(masses=jnp.ones((x.shape[0],), jnp.float32),
                    terms=(nb, bonds), constraints=no_constraints(),
                    default_box=box, periodic=True)
    u_ref, g = jax.value_and_grad(make_energy_fn(system))(x, box, {})
    u, f = make_energy_force_fn(system)(x, box, {})
    f_scale = float(jnp.max(jnp.abs(g))) + 1.0
    assert abs(float(u - u_ref)) <= 2e-4 * (abs(float(u_ref)) + 1.0)
    assert float(jnp.max(jnp.abs(f + g))) <= 2e-4 * f_scale
