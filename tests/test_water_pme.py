"""Water box + Ewald/PME validation."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.constants import ONE_4PI_EPS0, kB
from openmmtools_tpu.models.water import FlexibleWaterBox, WaterBox, WaterCluster
from openmmtools_tpu.ops.pme import (
    ewald_alpha,
    make_ewald_reciprocal_term,
)
from openmmtools_tpu.system import NonbondedTerm


def test_madelung_constant():
    """Rock-salt lattice: Ewald energy per ion = k_e M / (2 a) with
    M = -1.7475645946 — an absolute correctness check of the full
    direct+reciprocal+self decomposition."""
    a = 0.5
    m = 6
    L = m * a
    pos, q = [], []
    for i in range(m):
        for j in range(m):
            for k in range(m):
                pos.append((i * a, j * a, k * a))
                q.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    pos = np.asarray(pos)
    q = np.asarray(q)
    cutoff = 1.4
    alpha = ewald_alpha(cutoff, 1e-7)
    nb = NonbondedTerm(
        charge=jnp.asarray(q), sigma=jnp.full(len(q), 0.1),
        epsilon=jnp.zeros(len(q)),
        exception_index=jnp.zeros((0, 2), jnp.int32),
        exception_chargeprod=jnp.zeros(0), exception_sigma=jnp.zeros(0),
        exception_epsilon=jnp.zeros(0),
        method="pme", cutoff=cutoff, ewald_alpha=float(alpha))
    rec = make_ewald_reciprocal_term(q, L, cutoff, np.zeros((0, 2), np.int64),
                                     tol=1e-7)
    box = jnp.diag(jnp.asarray([L, L, L]))
    x = jnp.asarray(pos)
    u = float(nb.energy(x, box, None)) + float(rec.energy(x, box, None))
    per_ion = u / len(q)
    expected = ONE_4PI_EPS0 * (-1.7475645946) / (2.0 * a)
    assert np.isclose(per_ion, expected, rtol=1e-4), (per_ion, expected)


def test_ewald_cutoff_invariance():
    """Total Ewald energy must be independent of the direct/reciprocal
    split (the cutoff/alpha choice)."""
    rng = np.random.default_rng(0)
    n = 32
    L = 2.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()  # neutral
    box = jnp.diag(jnp.asarray([L, L, L]))
    energies = []
    for cutoff in (0.7, 0.9):
        alpha = ewald_alpha(cutoff, 1e-6)
        nb = NonbondedTerm(
            charge=jnp.asarray(q), sigma=jnp.full(n, 0.1),
            epsilon=jnp.zeros(n),
            exception_index=jnp.zeros((0, 2), jnp.int32),
            exception_chargeprod=jnp.zeros(0), exception_sigma=jnp.zeros(0),
            exception_epsilon=jnp.zeros(0),
            method="pme", cutoff=cutoff, ewald_alpha=float(alpha))
        rec = make_ewald_reciprocal_term(q, L, cutoff,
                                         np.zeros((0, 2), np.int64), tol=1e-6)
        u = float(nb.energy(jnp.asarray(x), box, None)) \
            + float(rec.energy(jnp.asarray(x), box, None))
        energies.append(u)
    assert np.isclose(energies[0], energies[1],
                      rtol=1e-3, atol=0.05), energies


@pytest.fixture(scope="module")
def waterbox():
    return WaterBox(box_edge=2.2, cutoff=0.9)


def test_waterbox_build(waterbox):
    assert waterbox.system.n_particles == 3 * waterbox.n_waters
    assert waterbox.system.constraints.n_constraints == 3 * waterbox.n_waters
    u = float(waterbox.thermodynamic_state(300.0)
              .potential_energy(waterbox.sampler_state()))
    assert np.isfinite(u)


def test_waterbox_md_stability(waterbox):
    """Rigid TIP3P box integrates stably with SHAKE/RATTLE + Ewald."""
    from openmmtools_tpu.integrators import BAOABIntegrator

    integ = BAOABIntegrator(temperature=300.0, collision_rate=5.0,
                            timestep=0.001, neighborlist=None)
    bound = integ.bind(waterbox.system)
    s = bound.initial_state(waterbox.sampler_state(), jax.random.PRNGKey(0),
                            temperature=300.0)
    s = bound.run(s, 50)
    assert bool(jnp.all(jnp.isfinite(s.positions)))
    # constraints hold
    c = waterbox.system.constraints
    xi = np.asarray(s.positions)
    d = np.linalg.norm(xi[np.asarray(c.index[:, 0])]
                       - xi[np.asarray(c.index[:, 1])], axis=1)
    assert np.allclose(d, np.asarray(c.distance), rtol=1e-4)


def test_flexible_waterbox():
    wb = FlexibleWaterBox(box_edge=2.2, cutoff=0.9)
    assert wb.system.constraints.n_constraints == 0
    u = float(wb.thermodynamic_state(300.0).potential_energy(
        wb.sampler_state()))
    assert np.isfinite(u)


def test_water_cluster():
    wc = WaterCluster(n_waters=8)
    u = float(wc.thermodynamic_state(300.0).potential_energy(
        wc.sampler_state()))
    assert np.isfinite(u)


def test_spce_model():
    wb = WaterBox(box_edge=2.2, cutoff=0.9, model="spce")
    u = float(wb.thermodynamic_state(300.0).potential_energy(
        wb.sampler_state()))
    assert np.isfinite(u)


def test_settle_matches_shake(waterbox):
    """SETTLE is the analytic solution of the SHAKE/RATTLE Lagrange system:
    constraints exact to machine precision, corrections in the span of the
    mass-weighted reference bond directions, and velocity projection
    identical to converged RATTLE."""
    from openmmtools_tpu.ops.constraints import (
        analyze_settle, rattle_velocities, settle_positions,
        settle_velocities, shake_positions)

    sys_ = waterbox.system
    spec = analyze_settle(sys_.constraints, sys_.masses)
    assert spec is not None
    assert spec.a.shape[0] == waterbox.n_waters

    x0 = jnp.asarray(waterbox.positions, jnp.float64)
    m = jnp.asarray(sys_.masses, jnp.float64)
    rng = np.random.default_rng(3)
    x1 = x0 + 2e-3 * jnp.asarray(rng.normal(size=x0.shape))
    xs = settle_positions(x1, x0, spec, m)
    i, j = sys_.constraints.index[:, 0], sys_.constraints.index[:, 1]
    d = jnp.linalg.norm(xs[i] - xs[j], axis=1)
    assert float(jnp.max(jnp.abs(d - sys_.constraints.distance))) < 1e-12
    # momentum conservation of the projection
    drift = jnp.sum(m[:, None] * (xs - x1), axis=0)
    assert float(jnp.max(jnp.abs(drift))) < 1e-10
    # agreement with iterative SHAKE at SHAKE's own convergence floor
    xk = shake_positions(x1, x0, sys_.constraints, m, tol=1e-12,
                         max_iter=5000)
    assert float(jnp.max(jnp.abs(xs - xk))) < 1e-6

    v = jnp.asarray(rng.normal(scale=0.5, size=x0.shape))
    vs = settle_velocities(xs, v, spec, m)
    tang = jnp.sum((vs[i] - vs[j]) * (xs[i] - xs[j]), axis=1)
    assert float(jnp.max(jnp.abs(tang))) < 1e-12
    vk = rattle_velocities(xs, v, sys_.constraints, m, tol=1e-12,
                           max_iter=5000)
    assert float(jnp.max(jnp.abs(vs - vk))) < 1e-8


def test_settle_rejects_non_triangles():
    """Chain topologies (e.g. H-X-H angles unconstrained) fall back to
    SHAKE: analyze_settle returns None for a 2-constraint chain."""
    from openmmtools_tpu.ops.constraints import analyze_settle
    from openmmtools_tpu.system import Constraints

    chain = Constraints(index=jnp.asarray([[0, 1], [1, 2], [2, 3]],
                                          jnp.int32),
                        distance=jnp.asarray([0.1, 0.1, 0.1]))
    assert analyze_settle(chain, jnp.asarray([16.0, 1.0, 1.0, 1.0])) is None


def test_tip5p_out_of_plane_sites():
    """5-site water: both lone pairs are out-of-plane virtual sites whose
    reconstruction reproduces the as-placed geometry for every (randomly
    rotated) molecule, carry the negative charge, and exert zero direct
    force."""
    from openmmtools_tpu.system import make_force_fn

    wb = WaterBox(box_edge=2.2, cutoff=0.9, model="tip5p")
    assert wb.system.n_particles == 5 * wb.n_waters
    assert wb.system.virtual_sites.n_sites == 2 * wb.n_waters
    masses = np.asarray(wb.system.masses).reshape(-1, 5)
    assert np.all(masses[:, 3:] == 0.0)
    # reconstruction must agree with the explicitly placed L sites across
    # random molecular orientations (validates the cross-product term)
    xr = wb.system.virtual_sites.reconstruct(wb.positions)
    assert float(jnp.max(jnp.abs(xr - wb.positions))) < 1e-5
    f = make_force_fn(wb.system)(wb.positions, wb.system.default_box, None)
    assert float(jnp.max(jnp.abs(np.asarray(f).reshape(-1, 5, 3)[:, 3:]))) \
        == 0.0
    u = float(wb.thermodynamic_state(300.0).potential_energy(
        wb.sampler_state()))
    assert np.isfinite(u)

    from openmmtools_tpu.integrators import BAOABIntegrator

    integ = BAOABIntegrator(temperature=300.0, collision_rate=5.0,
                            timestep=0.0005, neighborlist=None)
    b = integ.bind(wb.system)
    s = b.initial_state(wb.sampler_state(), jax.random.PRNGKey(0),
                        temperature=300.0)
    s = b.run(s, 20)
    assert bool(jnp.all(jnp.isfinite(s.positions)))


def test_unsupported_model():
    with pytest.raises(ValueError):
        WaterBox(model="tip42")


def test_tip4pew_virtual_sites():
    """4-site water: the virtual M site is massless, carries the charge,
    exerts zero direct force (redistributed to parents by autodiff), and the
    box integrates stably."""
    from openmmtools_tpu.system import make_force_fn

    wb = WaterBox(box_edge=2.2, cutoff=0.9, model="tip4pew")
    assert wb.system.n_particles == 4 * wb.n_waters
    assert wb.system.virtual_sites.n_sites == wb.n_waters
    masses = np.asarray(wb.system.masses)
    assert np.all(masses[3::4] == 0.0)
    f = make_force_fn(wb.system)(wb.positions, wb.system.default_box, None)
    assert float(jnp.max(jnp.abs(f[3::4]))) == 0.0
    u = float(wb.thermodynamic_state(300.0).potential_energy(
        wb.sampler_state()))
    assert np.isfinite(u)

    from openmmtools_tpu.integrators import BAOABIntegrator

    integ = BAOABIntegrator(temperature=300.0, collision_rate=5.0,
                            timestep=0.001, neighborlist=None)
    b = integ.bind(wb.system)
    s = b.initial_state(wb.sampler_state(), jax.random.PRNGKey(0),
                        temperature=300.0)
    s = b.run(s, 30)
    assert bool(jnp.all(jnp.isfinite(s.positions)))
    # M sites never move (massless, zero velocity) but energies use the
    # reconstructed positions, so the physics is 4-site
    assert float(jnp.max(jnp.abs(s.velocities[3::4]))) == 0.0


def test_water_variant_family():
    """Named water-box variants (testsystems.py:3003-3350): construction +
    finite energies + the defining property of each."""
    from openmmtools_tpu.models.water import (
        AlchemicalWaterBox,
        DischargedWaterBox,
        DischargedWaterBoxHsites,
        FlexiblePMEWaterBox,
        FlexibleReactionFieldWaterBox,
        PMEWaterBox,
    )
    from openmmtools_tpu.ops.pme import EwaldReciprocalTerm

    kw = dict(box_edge=1.9, cutoff=0.9)
    dwb = DischargedWaterBox(**kw)
    assert float(jnp.sum(jnp.abs(dwb.system.terms[0].charge))) == 0.0
    assert not any(isinstance(t, EwaldReciprocalTerm)
                   for t in dwb.system.terms)
    u = float(dwb.thermodynamic_state(300.0).potential_energy(
        dwb.sampler_state()))
    assert np.isfinite(u)

    hs = DischargedWaterBoxHsites(**kw)
    eps = np.asarray(hs.system.terms[0].epsilon)
    assert np.all(eps > 0)  # H sites got LJ cores

    rf = FlexibleReactionFieldWaterBox(**kw)
    assert rf.system.constraints.n_constraints == 0
    assert rf.system.terms[0].method == "cutoff_periodic"

    assert PMEWaterBox(**kw).system.terms[0].method == "pme"
    assert FlexiblePMEWaterBox(**kw).system.constraints.n_constraints == 0

    aw = AlchemicalWaterBox(**kw)
    ts = aw.thermodynamic_state(300.0)
    s = aw.sampler_state()
    u1 = float(ts.replace(global_params={"lambda_electrostatics": 1.0,
                                         "lambda_sterics": 1.0})
               .potential_energy(s))
    u0 = float(ts.replace(global_params={"lambda_electrostatics": 0.0,
                                         "lambda_sterics": 1.0})
               .potential_energy(s))
    assert np.isfinite(u1) and np.isfinite(u0) and u1 != u0
