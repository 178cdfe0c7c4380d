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
