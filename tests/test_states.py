"""State-layer contract tests (analog of reference tests/test_states.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu import (
    SamplerState,
    ThermodynamicState,
    create_thermodynamic_state_protocol,
    group_by_compatibility,
    is_state_compatible,
    reduced_potential_at_states,
    reduced_potential_matrix,
    stack_sampler_states,
    stack_thermodynamic_states,
)
from openmmtools_tpu.constants import BAR_TO_KJ_PER_MOL_NM3, kB
from openmmtools_tpu.models import HarmonicOscillator, IdealGas, LennardJonesPair
from openmmtools_tpu.states import (
    GlobalParameter,
    GlobalParameterFunction,
    GlobalParameterState,
    CompoundThermodynamicState,
)


@pytest.fixture(scope="module")
def ho():
    return HarmonicOscillator()


def test_harmonic_oscillator_energy(ho):
    """U = (K/2) r^2 at a displaced position."""
    x = jnp.asarray([[0.1, 0.2, -0.3]], dtype=jnp.float64)
    state = ho.thermodynamic_state(temperature=300.0)
    ss = SamplerState(positions=x)
    expected = 0.5 * ho.K * (0.1**2 + 0.2**2 + 0.3**2)
    assert np.isclose(float(state.potential_energy(ss)), expected, rtol=1e-6)


def test_global_parameter_override(ho):
    """Context parameters override term defaults (testsystems_HarmonicOscillator_K)."""
    x = jnp.asarray([[0.1, 0.0, 0.0]])
    state = ho.thermodynamic_state(300.0)
    state2 = state.replace(global_params={"testsystems_HarmonicOscillator_K": 2.0 * ho.K})
    ss = SamplerState(positions=x)
    u1 = float(state.potential_energy(ss))
    u2 = float(state2.potential_energy(ss))
    assert np.isclose(u2, 2.0 * u1, rtol=1e-6)


def test_reduced_potential_nvt(ho):
    state = ho.thermodynamic_state(300.0)
    ss = SamplerState(positions=jnp.asarray([[0.05, 0.0, 0.0]]))
    u = float(state.reduced_potential(ss))
    U = float(state.potential_energy(ss))
    assert np.isclose(u, U / (kB * 300.0), rtol=1e-6)


def test_reduced_potential_npt():
    gas = IdealGas(nparticles=8)
    state = gas.thermodynamic_state(298.0, pressure=1.01325)
    ss = gas.sampler_state()
    u = float(state.reduced_potential(ss))
    vol = float(ss.volume)
    expected = (0.0 + 1.01325 * BAR_TO_KJ_PER_MOL_NM3 * vol) / (kB * 298.0)
    assert np.isclose(u, expected, rtol=1e-5)


def test_compatibility(ho):
    s1 = ho.thermodynamic_state(300.0)
    s2 = ho.thermodynamic_state(400.0)
    s3 = ho.thermodynamic_state(300.0, pressure=1.0)  # NPT: different structure
    assert is_state_compatible(s1, s2)
    assert not is_state_compatible(s1, s3)
    gas = IdealGas(nparticles=8)
    s4 = gas.thermodynamic_state(300.0)
    assert not is_state_compatible(s1, s4)

    groups, indices = group_by_compatibility([s1, s4, s2, s3])
    assert [len(g) for g in groups] == [2, 1, 1]
    assert indices[0] == [0, 2]


def test_protocol_and_stacking(ho):
    ref = ho.thermodynamic_state(300.0)
    states = create_thermodynamic_state_protocol(
        ref,
        protocol={"temperature": [300.0, 310.0, 320.0],
                  "testsystems_HarmonicOscillator_K": [ho.K, 2 * ho.K, 3 * ho.K]},
    )
    assert len(states) == 3
    stacked = stack_thermodynamic_states(states)
    assert stacked.temperature.shape == (3,)

    ss = SamplerState(positions=jnp.asarray([[0.1, 0.0, 0.0]]))
    u_vmap = np.asarray(reduced_potential_at_states(ss, stacked))
    u_loop = np.asarray([float(s.reduced_potential(ss)) for s in states])
    assert np.allclose(u_vmap, u_loop, rtol=1e-6)


def test_reduced_potential_matrix(ho):
    ref = ho.thermodynamic_state(300.0)
    states = create_thermodynamic_state_protocol(
        ref, protocol={"temperature": [290.0, 300.0, 310.0, 320.0]})
    stacked = stack_thermodynamic_states(states)
    replicas = stack_sampler_states(
        [SamplerState(positions=jnp.asarray([[0.01 * i, 0.0, 0.0]]))
         for i in range(5)])
    u = np.asarray(reduced_potential_matrix(replicas, stacked))
    assert u.shape == (5, 4)
    # row n, col k must equal serial computation
    for n in range(5):
        ss = SamplerState(positions=replicas.positions[n])
        for k in range(4):
            assert np.isclose(u[n, k], float(states[k].reduced_potential(ss)),
                              rtol=1e-6)


def test_sampler_state_nan_detection():
    ss = SamplerState(positions=jnp.asarray([[jnp.nan, 0.0, 0.0]]))
    assert bool(ss.has_nan())
    ss2 = SamplerState(positions=jnp.zeros((1, 3)))
    assert not bool(ss2.has_nan())


# ---------------------------------------------------------------------------
# GlobalParameterState
# ---------------------------------------------------------------------------


class _LambdaState(GlobalParameterState):
    lambda_sterics = GlobalParameter(
        "lambda_sterics", standard_value=1.0,
        validator=lambda self, v: _validate_01(v))
    lambda_electrostatics = GlobalParameter(
        "lambda_electrostatics", standard_value=1.0,
        validator=lambda self, v: _validate_01(v))


def _validate_01(v):
    if isinstance(v, (int, float)) and not 0.0 <= v <= 1.0:
        raise ValueError("lambda out of [0,1]")
    return v


def test_global_parameter_state_basic():
    s = _LambdaState(lambda_sterics=0.5)
    assert s.lambda_sterics == 0.5
    assert s.lambda_electrostatics is None
    assert s.parameters == {"lambda_sterics": 0.5}
    with pytest.raises(ValueError):
        s.lambda_sterics = 1.5


def test_global_parameter_state_suffix():
    s = _LambdaState(parameters_name_suffix="zero", lambda_sterics=0.3)
    assert s.lambda_sterics == 0.3
    assert "lambda_sterics_zero" in s.parameters
    assert s.parameters["lambda_sterics_zero"] == 0.3


def test_global_parameter_function():
    s = _LambdaState(lambda_sterics=1.0)
    s.lambda_sterics = GlobalParameterFunction("lam**2")
    s.set_function_variable("lam", 0.5)
    assert np.isclose(float(s.lambda_sterics), 0.25)


def test_global_parameter_state_pytree_roundtrip():
    s = _LambdaState(lambda_sterics=0.5, lambda_electrostatics=0.7)
    leaves, treedef = jax.tree.flatten(s)
    s2 = jax.tree.unflatten(treedef, leaves)
    assert s2.parameters == s.parameters


def test_compound_state(ho):
    base = ho.thermodynamic_state(300.0)
    lam = _LambdaState(lambda_sterics=0.5)
    compound = CompoundThermodynamicState(base_state=base,
                                          composable_states=(lam,))
    assert compound.lambda_sterics == 0.5
    resolved = compound.resolve()
    assert resolved.global_params["lambda_sterics"] == 0.5
    assert float(compound.temperature) == 300.0


# ---------------------------------------------------------------------------
# Reference-parity depth (tests/test_states.py regimes): ensembles,
# compatibility grouping, stacking round-trips, protocol validation,
# descriptor/validator machinery
# ---------------------------------------------------------------------------


def test_reduced_potential_npgammat():
    """NPgammaT: u = beta [U + pV - gamma A], A = 2 * Lx * Ly (both
    leaflets; reference states.py:1909-1932 semantics)."""
    gas = IdealGas(nparticles=16)
    T, p, gamma = 310.0, 2.0, 5.0
    state = ThermodynamicState(system=gas.system,
                               temperature=jnp.asarray(T),
                               pressure=jnp.asarray(p),
                               surface_tension=jnp.asarray(gamma))
    ss = gas.sampler_state()
    b = np.asarray(ss.box_vectors)
    vol = float(np.linalg.det(b))
    area = 2.0 * b[0, 0] * b[1, 1]
    u = float(state.reduced_potential(ss))
    U = float(state.potential_energy(ss))
    beta = 1.0 / (kB * T)
    expected = beta * (U + p * BAR_TO_KJ_PER_MOL_NM3 * vol
                       - gamma * BAR_TO_KJ_PER_MOL_NM3 * area)
    assert np.isclose(u, expected, rtol=1e-6)


def test_reduced_potential_npt_requires_box():
    """NPT without box vectors must raise, not silently drop the pV term
    (reference raises ThermodynamicsError)."""
    ho_ = HarmonicOscillator()
    state = ho_.thermodynamic_state(300.0)
    state = state.replace(pressure=jnp.asarray(1.0))
    ss = SamplerState(positions=jnp.zeros((1, 3)))
    with pytest.raises(Exception):
        jax.block_until_ready(state.reduced_potential(ss))


def test_group_by_compatibility_mixed():
    """Same system structure with different parameter VALUES groups
    together; structurally different systems do not
    (reference states.py:186,1447-1504)."""
    ho_ = HarmonicOscillator()
    lj = LennardJonesPair()
    s1 = ho_.thermodynamic_state(300.0)
    s2 = ho_.thermodynamic_state(400.0)
    # compatibility = identical pytree structure (the vmap/stacking
    # contract): same global-parameter KEY SET with different values is
    # compatible; a different key set or a different system is not
    kname = "testsystems_HarmonicOscillator_K"
    s1k = s1.replace(global_params={kname: jnp.asarray(100.0)})
    s3 = s1.replace(global_params={kname: jnp.asarray(7.0)})
    s4 = lj.thermodynamic_state(300.0)
    groups, indices = group_by_compatibility([s1k, s4, s2, s3])
    sets = sorted(sorted(ix) for ix in indices)
    assert sets == [[0, 3], [1], [2]]
    assert is_state_compatible(s1k, s3)
    assert not is_state_compatible(s1k, s4)
    assert not is_state_compatible(s1k, s2)  # differing key sets


def test_stack_unstack_round_trip(ho):
    from openmmtools_tpu.states import unstack_thermodynamic_states

    ladder = create_thermodynamic_state_protocol(
        ho.thermodynamic_state(300.0),
        protocol={"temperature": [280.0, 300.0, 320.0],
                  "testsystems_HarmonicOscillator_K": [50.0, 100.0, 150.0]})
    stacked = stack_thermodynamic_states(ladder)
    back = unstack_thermodynamic_states(stacked)
    assert len(back) == 3
    for orig, rt in zip(ladder, back):
        assert np.isclose(float(orig.temperature), float(rt.temperature))
        assert np.isclose(
            float(orig.global_params["testsystems_HarmonicOscillator_K"]),
            float(rt.global_params["testsystems_HarmonicOscillator_K"]))


def test_protocol_validation_errors(ho):
    ref = ho.thermodynamic_state(300.0)
    with pytest.raises(ValueError):
        create_thermodynamic_state_protocol(
            ref, protocol={"temperature": [300.0, 310.0],
                           "testsystems_HarmonicOscillator_K": [1.0]})
    with pytest.raises(ValueError):
        create_thermodynamic_state_protocol(ref, protocol={"temperature": []})


def test_protocol_constants_applied(ho):
    states = create_thermodynamic_state_protocol(
        ho.thermodynamic_state(300.0),
        protocol={"temperature": [280.0, 320.0]},
        constants={"testsystems_HarmonicOscillator_K": 123.0})
    for s in states:
        assert float(s.global_params[
            "testsystems_HarmonicOscillator_K"]) == 123.0


def test_reduced_potential_at_states_matches_loop(ho):
    ladder = create_thermodynamic_state_protocol(
        ho.thermodynamic_state(300.0),
        protocol={"temperature": [250.0, 300.0, 350.0, 400.0]})
    ss = SamplerState(positions=jnp.asarray([[0.08, -0.02, 0.01]]))
    u_vec = np.asarray(reduced_potential_at_states(
        ss, stack_thermodynamic_states(ladder)))
    u_loop = np.array([float(s.reduced_potential(ss)) for s in ladder])
    np.testing.assert_allclose(u_vec, u_loop, rtol=1e-6)


def test_sampler_state_stack_index_round_trip():
    from openmmtools_tpu.states import index_sampler_state

    sss = [SamplerState(positions=jnp.full((2, 3), float(i)),
                        velocities=jnp.full((2, 3), 10.0 * i))
           for i in range(4)]
    batched = stack_sampler_states(sss)
    for i in range(4):
        one = index_sampler_state(batched, i)
        np.testing.assert_allclose(np.asarray(one.positions), float(i))
        np.testing.assert_allclose(np.asarray(one.velocities), 10.0 * i)


def test_kinetic_energy(ho):
    m = ho.mass
    v = np.array([[0.5, -0.25, 1.0]])
    ss = SamplerState(positions=jnp.zeros((1, 3)),
                      velocities=jnp.asarray(v))
    ke = float(ho.thermodynamic_state(300.0).kinetic_energy(ss))
    assert np.isclose(ke, 0.5 * m * float((v ** 2).sum()), rtol=1e-6)


class _ValidatedLambdaState(GlobalParameterState):
    lambda_sterics = GlobalParameter(
        "lambda_sterics", 1.0,
        validator=lambda self, v: _validate_01(v))


def test_global_parameter_validator_and_errors():
    # validator contract mirrors the reference: invalid values raise
    s = _ValidatedLambdaState(lambda_sterics=0.5)
    assert s.lambda_sterics == 0.5
    with pytest.raises(Exception):
        _ValidatedLambdaState(lambda_sterics=1.5)
    with pytest.raises(Exception):
        s.set_parameter("nonexistent_parameter", 1.0)


def test_global_parameter_function_variable_flow():
    """GlobalParameterFunction: a parameter enslaved to an expression of
    function variables re-evaluates when the variable is set
    (reference states.py:3341-3395)."""
    s = _ValidatedLambdaState(lambda_sterics=GlobalParameterFunction("x**2"))
    s.set_function_variable("x", 0.5)
    assert np.isclose(s.get_parameter("lambda_sterics"), 0.25)
    s.set_function_variable("x", 1.0)
    assert np.isclose(s.get_parameter("lambda_sterics"), 1.0)
    assert s.get_function_variable("x") == 1.0


def test_compound_state_unknown_attribute_raises(ho):
    comp = CompoundThermodynamicState(
        ho.thermodynamic_state(300.0), [_ValidatedLambdaState(lambda_sterics=1.0)])
    assert comp.lambda_sterics == 1.0
    with pytest.raises(AttributeError):
        comp.definitely_not_an_attribute


def test_volume_properties():
    """Reference test_property_volume: NVT state exposes the box volume;
    NPT state defers to the sampler state's box (volume None on the state)."""
    gas = IdealGas(nparticles=16)
    nvt = gas.thermodynamic_state(temperature=300.0)
    box = np.asarray(gas.system.default_box)
    assert np.isclose(float(nvt.volume), float(np.linalg.det(box)), rtol=1e-6)
    npt = nvt.replace(pressure=1.0)
    assert npt.volume is None
    ss = gas.sampler_state()
    assert np.isclose(float(ss.volume), float(np.linalg.det(box)), rtol=1e-6)
    assert SamplerState(positions=jnp.zeros((3, 3))).volume is None


def test_states_serialization_round_trip(ho):
    """Reference test_states_serialization: states survive
    serialize/deserialize with identical reduced potentials."""
    from openmmtools_tpu.utils import deserialize, serialize

    thermo = ho.thermodynamic_state(311.0)
    ss = SamplerState(positions=ho.positions)
    blob = serialize(thermo)
    thermo2 = deserialize(blob)
    assert type(thermo2) is ThermodynamicState
    assert float(thermo2.temperature) == 311.0
    assert np.isclose(float(thermo.reduced_potential(ss)),
                      float(thermo2.reduced_potential(ss)), rtol=1e-6)
    ss2 = deserialize(serialize(ss))
    assert np.allclose(np.asarray(ss2.positions), np.asarray(ss.positions))

def test_sampler_state_getitem_atom_subset():
    """Reference test_operator_getitem (test_states.py:1405): integer →
    single-atom state (1,3); slice/array → subset; box vectors carry over."""
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (8, 3))
    vel = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    box = jnp.eye(3) * 2.5
    ss = SamplerState(positions=pos, velocities=vel, box_vectors=box)

    one = ss[3]
    assert one.positions.shape == (1, 3)
    assert one.velocities.shape == (1, 3)
    assert np.allclose(np.asarray(one.positions[0]), np.asarray(pos[3]))
    assert np.allclose(np.asarray(one.box_vectors), np.asarray(box))

    last = ss[-1]
    assert last.positions.shape == (1, 3)
    assert np.allclose(np.asarray(last.positions[0]), np.asarray(pos[-1]))

    sub = ss[2:6]
    assert sub.positions.shape == (4, 3)
    assert np.allclose(np.asarray(sub.velocities), np.asarray(vel[2:6]))

    picked = ss[jnp.array([0, 5, 7])]
    assert picked.positions.shape == (3, 3)
    assert np.allclose(np.asarray(picked.positions[1]), np.asarray(pos[5]))

    # no velocities → stays None
    novel = SamplerState(positions=pos)[1:4]
    assert novel.velocities is None and novel.positions.shape == (3, 3)


def test_sampler_state_inconsistent_velocities():
    """Reference test_inconsistent_n_particles (test_states.py:1234):
    mismatched velocities raise SamplerStateError at construction."""
    from openmmtools_tpu.states import SamplerStateError

    pos = jnp.zeros((5, 3))
    with pytest.raises(SamplerStateError, match="inconsistent velocities"):
        SamplerState(positions=pos, velocities=jnp.zeros((4, 3)))
    # consistent shapes (incl. batched) construct fine
    SamplerState(positions=pos, velocities=jnp.zeros((5, 3)))
    SamplerState(positions=jnp.zeros((2, 5, 3)), velocities=jnp.zeros((2, 5, 3)))
    # pytree rebuilds with placeholder leaves must NOT validate
    s = SamplerState(positions=pos, velocities=jnp.zeros((5, 3)))
    jax.tree.map(lambda x: None, s, is_leaf=lambda x: x is None)
    leaves, treedef = jax.tree.flatten(s)
    jax.tree.unflatten(treedef, [object()] * len(leaves))


def test_global_parameter_state_equality():
    """Reference test_equality_operator (test_states.py:2125): resolved-value
    comparison, suffix/subset sensitivity, function-valued parameters."""
    s1 = _LambdaState(lambda_sterics=1.0)
    s2 = _LambdaState(lambda_sterics=1.0)
    s3 = _LambdaState(lambda_sterics=0.9)
    s4 = _LambdaState(lambda_sterics=0.9, lambda_electrostatics=1.0)
    s5 = _LambdaState(lambda_sterics=0.9, parameters_name_suffix="sfx")
    assert s1 == s2
    assert s2 != s3
    assert s3 != s4
    assert s3 != s5

    class _MoreState(_LambdaState):
        extra_parameter = GlobalParameter("extra_parameter", standard_value=1.0)

    assert _LambdaState(lambda_sterics=0.9) != _MoreState(lambda_sterics=0.9)

    # function-valued parameters compare by resolved value
    s8 = _LambdaState(lambda_sterics=1.0)
    s8.set_function_variable("lam1", 2.0)
    s8.lambda_sterics = GlobalParameterFunction("lam1 / 2")
    assert s1 == s8
    s8.set_function_variable("lam1", 1.0)
    assert s1 != s8


def test_check_system_consistency(ho):
    """Reference test_check_system_consistency (test_states.py:2209)."""
    from openmmtools_tpu.states import GlobalParameterError

    class _KState(GlobalParameterState):
        testsystems_HarmonicOscillator_K = GlobalParameter(
            "testsystems_HarmonicOscillator_K", standard_value=100.0)

    system = ho.system
    state = _KState.from_system(system)
    # a system is consistent with the state read from it
    state.check_system_consistency(system)

    # state value differing from the system default -> error
    state.testsystems_HarmonicOscillator_K = 2.0 * float(ho.K)
    with pytest.raises(GlobalParameterError, match="Consistency check failed"):
        state.check_system_consistency(system)

    # system declares a parameter the state controls but set to None -> error
    state2 = _KState.from_system(system)
    state2.testsystems_HarmonicOscillator_K = None
    with pytest.raises(GlobalParameterError, match="Consistency check failed"):
        state2.check_system_consistency(system)

    # state controls a parameter the system does not declare -> error
    lam = _LambdaState(lambda_sterics=0.5)
    with pytest.raises(GlobalParameterError, match="Consistency check failed"):
        lam.check_system_consistency(system)
