"""Bounded-sweep heterogeneous nonbonded kernel (ops/sweep_nb.py):
interpret-mode validation on CPU against the dense path.

The sweep path is the production direct-space engine for DHFR-scale
systems (reference role: OpenMM neighbor-list + direct-space kernels,
SURVEY.md §2.2 row 1).  Tolerances reflect that the DENSE path subtracts
exception pairs with f32 cancellation at bonded distances while the sweep
masks them (the sweep is the more accurate of the two).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import WaterBox
from openmmtools_tpu.states import SamplerState


@pytest.fixture(scope="module")
def water():
    return WaterBox()   # 1536 atoms, TIP3P, PME, SETTLE-rigid


def _bind(water, sweep, **kw):
    integ = BAOABIntegrator(temperature=300.0, collision_rate=kw.pop(
        "collision_rate", 1.0), timestep=kw.pop("timestep", 0.002),
        sweep=sweep, neighborlist=None)
    return integ.bind(water.system)


def test_sweep_energy_force_parity(water):
    bd = _bind(water, None)
    bs = _bind(water, "interpret")
    assert bs.sweep_mode and not bd.sweep_mode
    ss = water.sampler_state()
    sd = bd.initial_state(ss, jax.random.PRNGKey(0), temperature=300.0)
    s2 = bs.initial_state(ss, jax.random.PRNGKey(0), temperature=300.0)
    u_d, u_s = float(sd.potentials[0]), float(s2.potentials[0])
    assert abs(u_d - u_s) < 2e-3 * abs(u_d)
    fd = np.asarray(sd.forces[0])
    fs = np.asarray(s2.forces[0])
    assert np.abs(fd - fs).max() < 1e-4 * np.abs(fd).max()
    assert not bool(s2.sweep_overflow)


def test_sweep_trajectory_parity(water):
    """Deterministic (gamma=0) short trajectories agree with the dense
    path to within chaotic amplification of the f32 force differences."""
    b0 = _bind(water, None, collision_rate=0.0, timestep=0.001)
    b1 = _bind(water, "interpret", collision_rate=0.0, timestep=0.001)
    ss = water.sampler_state()
    st0 = b0.initial_state(ss, jax.random.PRNGKey(1))
    st1 = b1.initial_state(ss, jax.random.PRNGKey(1))
    st0 = b0.run(st0, 10)
    st1 = b1.run(st1, 10)
    dx = np.abs(np.asarray(st0.positions) - np.asarray(st1.positions)).max()
    assert np.isfinite(dx) and dx < 1e-3
    # resort path: run through a sort boundary with a FRESH bound program
    # (mutating sweep_sort_interval on b1 would hit its _run_cache[10]
    # entry with the old interval baked in — ADVICE round-2 item 4)
    from openmmtools_tpu.integrators import BAOABIntegrator

    integ2 = BAOABIntegrator(temperature=300.0, collision_rate=0.0,
                             timestep=0.001, sweep="interpret",
                             neighborlist=None, sweep_sort_interval=5)
    b2 = integ2.bind(water.system)
    assert b2.sweep_sort_interval == 5
    st2 = b2.initial_state(ss, jax.random.PRNGKey(1))
    st2 = b2.run(st2, 10)
    dx2 = np.abs(np.asarray(st0.positions) - np.asarray(st2.positions)).max()
    assert np.isfinite(dx2) and dx2 < 1e-3


def test_sweep_mts_force_groups(water):
    """Sweep mode with numbered Vn groups (r-RESPA): the direct-space
    sweep serves its force group while other groups (reciprocal space on
    the slow timescale) evaluate normally; trajectory matches the dense
    path under the same splitting."""
    from openmmtools_tpu.integrators import LangevinIntegrator
    from openmmtools_tpu.ops.pme import EwaldReciprocalTerm

    terms = tuple(
        t.replace(force_group=1) if isinstance(t, EwaldReciprocalTerm) else t
        for t in water.system.terms)
    system = water.system.replace(terms=terms)
    splitting = "V1 V0 R O R V0 V1"   # recip on the outer timescale

    def bind(sweep):
        return LangevinIntegrator(
            temperature=300.0, collision_rate=0.0, timestep=0.001,
            splitting=splitting, sweep=sweep, neighborlist=None
        ).bind(system)

    bs = bind("interpret")
    bd = bind(None)
    assert bs.sweep_mode and bs._sweep_group == 0
    ss = water.sampler_state()
    import jax

    st_s = bs.initial_state(ss, jax.random.PRNGKey(0))
    st_d = bd.initial_state(ss, jax.random.PRNGKey(0))
    st_s = bs.run(st_s, 8)
    st_d = bd.run(st_d, 8)
    dx = np.abs(np.asarray(st_s.positions) - np.asarray(st_d.positions)).max()
    assert np.isfinite(dx) and dx < 1e-3, dx
    du = abs(float(sum(st_s.potentials)) - float(sum(st_d.potentials)))
    assert du < 2e-3 * abs(float(sum(st_d.potentials)))


def _lj_fluid_512():
    from openmmtools_tpu.models import LennardJonesFluid

    return LennardJonesFluid(nparticles=512, charge=0.2)


def test_sweep_scale_params():
    """charge_scale_param / lj_scale_param fold into the sweep kernel's
    per-particle rows (q*scale, sqrt_eps*sqrt(lj_scale)) and match the
    dense NonbondedTerm.energy semantics (round-3 coverage, VERDICT #2)."""
    from openmmtools_tpu.system import NonbondedTerm

    fluid = _lj_fluid_512()
    sys0 = fluid.system
    idx = next(i for i, t in enumerate(sys0.terms)
               if type(t) is NonbondedTerm)
    term = sys0.terms[idx].replace(charge_scale_param="q_scale",
                                   lj_scale_param="lj_scale")
    system = sys0.replace_term(idx, term)
    gp = {"q_scale": 0.6, "lj_scale": 0.3}

    def bind(sweep):
        from openmmtools_tpu.integrators import BAOABIntegrator

        return BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                               timestep=0.002, sweep=sweep,
                               neighborlist=None).bind(system)

    bd, bs = bind(None), bind("interpret")
    assert bs.sweep_mode and not bd.sweep_mode
    ss = fluid.sampler_state()
    sd = bd.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    s2 = bs.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    u_d = float(sum(sd.potentials))
    u_s = float(sum(s2.potentials))
    assert abs(u_d - u_s) < 2e-3 * max(abs(u_d), 1.0), (u_d, u_s)
    fd = np.asarray(sum(sd.forces))
    fs = np.asarray(sum(s2.forces))
    assert np.abs(fd - fs).max() < 1e-4 * max(np.abs(fd).max(), 1.0)


@pytest.mark.parametrize("treatment,lam", [
    ("direct-space", 1.0),
    ("direct-space", 0.55),
    ("direct-space", 0.0),
    ("exact", 0.55),
    ("coulomb", 0.55),
])
def test_sweep_alchemical_parity(treatment, lam):
    """Alchemical softcore sweep kernel matches the dense
    AlchemicalNonbondedTerm across lambda and PME treatments
    (VERDICT #2c: production-scale alchemical path)."""
    from openmmtools_tpu.alchemy import (
        AbsoluteAlchemicalFactory,
        AlchemicalRegion,
    )
    from openmmtools_tpu.integrators import BAOABIntegrator

    fluid = _lj_fluid_512()
    factory = AbsoluteAlchemicalFactory(alchemical_pme_treatment=treatment)
    region = AlchemicalRegion(alchemical_atoms=list(range(24)),
                              annihilate_sterics=True)
    system = factory.create_alchemical_system(fluid.system, region)
    gp = {"lambda_sterics": lam, "lambda_electrostatics": lam}

    def bind(sweep):
        return BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                               timestep=0.002, sweep=sweep,
                               neighborlist=None).bind(system)

    bd, bs = bind(None), bind("interpret")
    assert bs.sweep_mode and bs._sweep_alch is not None
    ss = fluid.sampler_state()
    sd = bd.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    s2 = bs.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    u_d = float(sum(sd.potentials))
    u_s = float(sum(s2.potentials))
    assert abs(u_d - u_s) < 2e-3 * max(abs(u_d), 1.0), (u_d, u_s)
    fd = np.asarray(sum(sd.forces))
    fs = np.asarray(sum(s2.forces))
    assert np.abs(fd - fs).max() < 2e-4 * max(np.abs(fd).max(), 1.0)


def test_sweep_overflow_raises_every_run(water):
    """A set exclusion-bitfield overflow bit raises on EVERY run() call —
    a caller that catches the first error and keeps running must not get
    silently wrong forces back (the old one-shot latch disabled the check
    after the first raise)."""
    from openmmtools_tpu.integrators.langevin import IntegratorError

    b = _bind(water, "interpret")
    st = b.initial_state(water.sampler_state(), jax.random.PRNGKey(0),
                         temperature=300.0)
    st = st.replace(sweep_overflow=jnp.asarray(True))
    for _ in range(2):
        with pytest.raises(IntegratorError):
            b.run(st, 2)


def test_alchemical_coulomb_exception_parity():
    """'coulomb' PME treatment with alchemically-involved EXCEPTION pairs:
    the dense AlchemicalNonbondedTerm must subtract the same plain-Coulomb
    kernel the standard sum added for involved pairs (a mismatched erfc
    subtract leaves a spurious qq*erf(alpha*r)/r per involved exception
    pair), and must agree with the sweep kernel whose bitfield masking is
    exact by construction."""
    from openmmtools_tpu.alchemy import (
        AbsoluteAlchemicalFactory,
        AlchemicalRegion,
    )
    from openmmtools_tpu.integrators import BAOABIntegrator
    from openmmtools_tpu.system import NonbondedTerm

    fluid = _lj_fluid_512()
    sys0 = fluid.system
    idx = next(i for i, t in enumerate(sys0.terms)
               if type(t) is NonbondedTerm)
    # exceptions spanning all three involvement classes, chosen INSIDE the
    # cutoff (an out-of-range exception pair exercises neither path's
    # subtract): nearest neighbors of an alch-alch, alch-env and env-env
    # anchor atom
    pos = np.asarray(fluid.positions)
    box = np.diag(np.asarray(sys0.default_box))

    d = pos[:, None, :] - pos[None, :, :]
    d -= box * np.round(d / box)
    r = np.linalg.norm(d, axis=-1)
    np.fill_diagonal(r, np.inf)

    def closest(mask):
        rr = np.where(mask, r, np.inf)
        return np.unravel_index(np.argmin(rr), rr.shape)

    alch = np.zeros(512, bool)
    alch[:24] = True
    pairs = np.asarray([
        closest(alch[:, None] & alch[None, :]),        # alch-alch
        closest(alch[:, None] & ~alch[None, :]),       # alch-env
        closest(~alch[:, None] & ~alch[None, :]),      # env-env
    ], np.int32)
    cutoff = float(sys0.terms[idx].cutoff)
    # the discriminating classes (involved pairs) must sit inside the
    # cutoff or neither path's subtract fires
    assert r[pairs[1, 0], pairs[1, 1]] < cutoff
    assert r[pairs[2, 0], pairs[2, 1]] < cutoff
    term = sys0.terms[idx].replace(
        exception_index=jnp.asarray(pairs),
        exception_chargeprod=jnp.asarray([0.02, -0.01, 0.015], jnp.float32),
        exception_sigma=jnp.asarray([0.3, 0.31, 0.3], jnp.float32),
        exception_epsilon=jnp.asarray([0.4, 0.2, 0.3], jnp.float32))
    system = sys0.replace_term(idx, term)

    factory = AbsoluteAlchemicalFactory(alchemical_pme_treatment="coulomb")
    region = AlchemicalRegion(alchemical_atoms=list(range(24)),
                              annihilate_sterics=True)
    alch = factory.create_alchemical_system(system, region)
    gp = {"lambda_sterics": 0.55, "lambda_electrostatics": 0.55}

    def bind(sweep):
        return BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                               timestep=0.002, sweep=sweep,
                               neighborlist=None).bind(alch)

    bd, bs = bind(None), bind("interpret")
    assert bs.sweep_mode and bs._sweep_alch is not None
    ss = fluid.sampler_state()
    sd = bd.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    s2 = bs.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    u_d = float(sum(sd.potentials))
    u_s = float(sum(s2.potentials))
    assert abs(u_d - u_s) < 2e-3 * max(abs(u_d), 1.0), (u_d, u_s)
    fd = np.asarray(sum(sd.forces))
    fs = np.asarray(sum(s2.forces))
    assert np.abs(fd - fs).max() < 2e-4 * max(np.abs(fd).max(), 1.0)


def test_sweep_alchemical_decoupled_sterics():
    """Non-annihilated sterics: intra-region pairs keep full strength at
    lambda = 0 (pair-class scalars encode the annihilate flags)."""
    from openmmtools_tpu.alchemy import (
        AbsoluteAlchemicalFactory,
        AlchemicalRegion,
    )
    from openmmtools_tpu.integrators import BAOABIntegrator

    fluid = _lj_fluid_512()
    factory = AbsoluteAlchemicalFactory()
    region = AlchemicalRegion(alchemical_atoms=list(range(24)),
                              annihilate_sterics=False)
    system = factory.create_alchemical_system(fluid.system, region)
    gp = {"lambda_sterics": 0.0, "lambda_electrostatics": 0.0}

    def bind(sweep):
        return BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                               timestep=0.002, sweep=sweep,
                               neighborlist=None).bind(system)

    bd, bs = bind(None), bind("interpret")
    ss = fluid.sampler_state()
    sd = bd.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    s2 = bs.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    u_d = float(sum(sd.potentials))
    u_s = float(sum(s2.potentials))
    assert abs(u_d - u_s) < 2e-3 * max(abs(u_d), 1.0), (u_d, u_s)


def test_exclusion_bitfield_empty_and_overflow_drop():
    """ADVICE round-2 items 1-2: zero exception pairs must not crash
    (jnp.max over an empty array), and a pair whose sorted separation
    exceeds the bitfield coverage is DROPPED (no clamped bit corrupting
    another shell) while max_sep still reports the overflow."""
    from openmmtools_tpu.ops.sweep_nb import build_exclusion_bitfield

    n_pad = 256
    inv_perm = jnp.arange(n_pad, dtype=jnp.int32)

    # empty exception list: all-zero field, max_sep 0
    field, max_sep = build_exclusion_bitfield(
        jnp.zeros((0, 2), jnp.int32), inv_perm, n_pad, mask_rows=2)
    assert field.shape == (2, n_pad)
    assert int(jnp.count_nonzero(field)) == 0
    assert int(max_sep) == 0

    # one in-range pair (sep 3) + one overflowing pair (sep 100 > 64):
    # the in-range bit is set, the overflow sets NO bit anywhere, and
    # max_sep reports 100 so the caller's overflow check fires
    pairs = jnp.asarray([[10, 13], [20, 120]], jnp.int32)
    field, max_sep = build_exclusion_bitfield(pairs, inv_perm, n_pad,
                                              mask_rows=2)
    assert int(max_sep) == 100
    f = np.array(field)
    assert f[(3 - 1) // 32, 10] == 1 << ((3 - 1) % 32)
    f[(3 - 1) // 32, 10] = 0
    assert np.count_nonzero(f) == 0


def test_exclusion_bitfield_duplicate_pairs_no_carry():
    """ADVICE round-3: a duplicate exception pair — or the same pair listed
    both (i,j) and (j,i) — must set ONE bit, not carry into a higher bit
    (which would mask the wrong shell and leave the real exception
    unmasked)."""
    from openmmtools_tpu.ops.sweep_nb import build_exclusion_bitfield

    n_pad = 256
    inv_perm = jnp.arange(n_pad, dtype=jnp.int32)
    pairs = jnp.asarray([[10, 13], [10, 13], [13, 10]], jnp.int32)
    field, max_sep = build_exclusion_bitfield(pairs, inv_perm, n_pad,
                                              mask_rows=2)
    assert int(max_sep) == 3
    f = np.array(field)
    assert f[(3 - 1) // 32, 10] == 1 << ((3 - 1) % 32)
    f[(3 - 1) // 32, 10] = 0
    assert np.count_nonzero(f) == 0


@pytest.mark.parametrize("interacting,lams", [
    (True, (0.55, 0.3)),
    (True, (1.0, 1.0)),
    (False, (0.55, 0.3)),
    (True, (0.0, 0.7)),
])
def test_sweep_multi_region_parity(interacting, lams):
    """Two-region softcore in-kernel (round-5, VERDICT r4 item 6): the
    sweep kernel's region-pair-class dispatch matches the dense
    AlchemicalNonbondedTerm — annihilated region a, decoupled region b,
    cross pairs under the lamA*lamB rule (or excluded when the region
    pair is not declared interacting)."""
    from openmmtools_tpu.alchemy import (
        AbsoluteAlchemicalFactory,
        AlchemicalRegion,
    )

    fluid = _lj_fluid_512()
    factory = AbsoluteAlchemicalFactory()
    regions = [
        AlchemicalRegion(alchemical_atoms=list(range(12)), name="a",
                         annihilate_sterics=True,
                         annihilate_electrostatics=True),
        AlchemicalRegion(alchemical_atoms=list(range(12, 24)), name="b",
                         annihilate_sterics=False,
                         annihilate_electrostatics=False),
    ]
    inter = {("a", "b")} if interacting else frozenset()
    system = factory.create_alchemical_system(
        fluid.system, regions, alchemical_region_interactions=inter)
    la, lb = lams
    gp = {"lambda_sterics_a": la, "lambda_electrostatics_a": la,
          "lambda_sterics_b": lb, "lambda_electrostatics_b": lb}

    def bind(sweep):
        return BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                               timestep=0.002, sweep=sweep,
                               neighborlist=None).bind(system)

    bd, bs = bind(None), bind("interpret")
    assert bs.sweep_mode and bs._sweep_alch is not None
    assert bs._sweep_kernel.n_regions == 2
    assert bs._sweep_kernel.n_lam == 15
    ss = fluid.sampler_state()
    sd = bd.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    s2 = bs.initial_state(ss, jax.random.PRNGKey(0), temperature=120.0,
                          global_params=gp)
    u_d = float(sum(sd.potentials))
    u_s = float(sum(s2.potentials))
    assert abs(u_d - u_s) < 2e-3 * max(abs(u_d), 1.0), (u_d, u_s)
    fd = np.asarray(sum(sd.forces))
    fs = np.asarray(sum(s2.forces))
    assert np.abs(fd - fs).max() < 2e-4 * max(np.abs(fd).max(), 1.0)
