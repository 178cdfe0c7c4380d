"""ContextCache/LRUCache, parallel helpers, utils (Timer, math_eval,
serialization) tests."""
import time
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmtools_tpu.cache import (
    ContextCache,
    DummyContextCache,
    LRUCache,
    global_context_cache,
)
from openmmtools_tpu.integrators import BAOABIntegrator
from openmmtools_tpu.models import HarmonicOscillator
from openmmtools_tpu.parallel import distribute, on_single_device, replica_mesh
from openmmtools_tpu.utils import Timer, deserialize, math_eval, serialize
from openmmtools_tpu.utils.equilibration import (
    EquilibrationStage,
    run_gentle_equilibration,
)
from openmmtools_tpu.states import SamplerState


def test_lru_capacity():
    c = LRUCache(capacity=2)
    c["a"] = 1
    c["b"] = 2
    c["c"] = 3
    assert "a" not in c and "b" in c and "c" in c
    _ = c["b"]  # touch b
    c["d"] = 4  # evicts c (b was refreshed)
    assert "c" not in c and "b" in c


def test_lru_ttl():
    c = LRUCache(time_to_live=3)
    c["a"] = 1
    _ = c["a"]
    c["b"] = 2
    c["d"] = 3
    c["e"] = 4  # 'a' expired after 3 accesses without touch
    assert "a" not in c


def test_lru_capacity_setter_shrinks():
    """Shrinking capacity evicts oldest entries immediately
    (reference cache.py capacity property semantics)."""
    c = LRUCache(capacity=4)
    for i, k in enumerate("abcd"):
        c[k] = i
    _ = c["a"]  # refresh 'a' so 'b' is now the oldest
    c.capacity = 2
    assert len(c) == 2
    assert "a" in c and "d" in c and "b" not in c and "c" not in c


def test_lru_ttl_refresh_on_access():
    """Touching an entry extends its access-counted lifetime."""
    c = LRUCache(time_to_live=3)
    c["a"] = 1
    c["b"] = 2      # access 2: a expires at 1+3=4
    _ = c["a"]      # access 3: a now expires at 6
    c["c"] = 3      # access 4: a still alive (would have died untouched)
    assert "a" in c
    c["d"] = 4      # access 5
    c["e"] = 5      # access 6 -> a expires
    assert "a" not in c


def test_lru_ttl_setter_reassigns_expirations():
    """Reference cache.py ttl-setter semantics: None->ttl grants every entry
    ttl more accesses; ttl->ttl' shifts expirations by the difference;
    ttl->None removes them."""
    c = LRUCache()
    c["a"] = 1
    c["b"] = 2          # n_access = 2
    c.time_to_live = 1  # both now expire at access 3
    assert "a" in c and "b" in c
    _ = c["b"]          # access 3: 'a' expires, 'b' refreshed to 4
    assert "a" not in c and "b" in c
    c.time_to_live = 5  # 'b' expiration shifts 4 -> 8
    c["c"] = 3
    c["d"] = 4
    c["e"] = 5          # access 6: 'b' still alive under the extended ttl
    assert "b" in c
    c.time_to_live = None
    for i in range(20):
        c[f"k{i}"] = i
    assert "b" in c     # no expiration once ttl is cleared


def test_context_cache_incompatible_states_compile_separately():
    """Structurally incompatible states (different system shapes) must not
    share a binding; compatible ones must (reference cache.py:616-652)."""
    from openmmtools_tpu.models import LennardJonesPair

    cache = ContextCache()
    ho = HarmonicOscillator()
    lj = LennardJonesPair()
    integ = BAOABIntegrator(temperature=300.0)
    b_ho, _ = cache.get_context(ho.thermodynamic_state(300.0), integ)
    b_lj, _ = cache.get_context(lj.thermodynamic_state(300.0), integ)
    assert b_ho is not b_lj
    assert len(cache) == 2
    # different integrator settings also miss
    b_dt, _ = cache.get_context(ho.thermodynamic_state(300.0),
                                BAOABIntegrator(temperature=300.0,
                                                timestep=0.004))
    assert b_dt is not b_ho
    assert len(cache) == 3
    cache.empty()
    assert len(cache) == 0


def test_context_cache_default_integrator():
    """get_context with no integrator builds a Langevin binding at the
    state's temperature (reference cache.py:560)."""
    ho = HarmonicOscillator()
    cache = ContextCache()
    bound, thermo = cache.get_context(ho.thermodynamic_state(321.0))
    assert float(thermo.temperature) == 321.0
    state = bound.initial_state(ho.sampler_state(), jax.random.PRNGKey(0),
                                temperature=321.0)
    state = bound.run(state, 5)
    assert np.isfinite(float(state.positions.sum()))


def test_context_cache_reuse():
    ho = HarmonicOscillator()
    cache = ContextCache()
    s1 = ho.thermodynamic_state(300.0)
    s2 = ho.thermodynamic_state(400.0)  # compatible
    integ = BAOABIntegrator(temperature=300.0)
    b1, _ = cache.get_context(s1, integ)
    b2, _ = cache.get_context(s2, integ)
    assert b1 is b2  # compatible states share the compiled binding
    assert len(cache) == 1
    dummy = DummyContextCache()
    d1, _ = dummy.get_context(s1, BAOABIntegrator(temperature=300.0))
    assert d1 is not b1


def test_timer():
    t = Timer()
    t.start("x")
    time.sleep(0.01)
    dt = t.stop("x")
    assert dt > 0.005
    totals = t.report_timing()
    assert "x" in totals


def test_math_eval():
    assert math_eval("2*x + step(y)", {"x": 3.0, "y": -1.0}) == 6.0
    assert math_eval("min(1.0, 2.0*lam)", {"lam": 0.3}) == 0.6
    with pytest.raises(ValueError):
        math_eval("__import__('os')", {})
    # traced values stay traced
    out = jax.jit(lambda v: math_eval("sqrt(x)*2", {"x": v}))(jnp.asarray(4.0))
    assert float(out) == 4.0


def test_serialization_roundtrip():
    ho = HarmonicOscillator()
    blob = serialize(ho.system)
    system2 = deserialize(blob)
    x = jnp.asarray([[0.1, 0.0, 0.0]])
    u1 = float(ho.system.energy(x))
    u2 = float(system2.energy(x))
    assert np.isclose(u1, u2, rtol=1e-6)


def test_distribute_and_single_device():
    mesh = replica_mesh(min(8, len(jax.devices())))
    xs = jnp.arange(8.0).reshape(8, 1)
    out = distribute(lambda x: x * 2, xs, mesh=mesh)
    assert np.allclose(np.asarray(out), np.asarray(xs) * 2)

    @on_single_device
    def analyze(arr):
        assert isinstance(arr, np.ndarray)
        return arr.sum()

    assert analyze(xs) == float(np.asarray(xs).sum())


def test_gentle_equilibration():
    ho = HarmonicOscillator(K=400.0)
    stages = [
        EquilibrationStage(stage_type="minimize", n_steps=50),
        EquilibrationStage(stage_type="nvt", temperature=200.0, n_steps=50,
                           timestep=0.005),
        EquilibrationStage(stage_type="nvt", temperature=300.0, n_steps=50,
                           timestep=0.005),
    ]
    state = ho.thermodynamic_state(300.0)
    ss = SamplerState(positions=jnp.asarray([[0.5, 0.5, 0.5]]))
    out = run_gentle_equilibration(state, ss, stages)
    assert not bool(out.has_nan())
    assert float(state.potential_energy(out)) < float(
        state.potential_energy(ss))


def test_quantity_string_utils():
    """quantity_from_string / is_quantity_close / typename parity
    (reference utils.py:400-478)."""
    import pytest

    from openmmtools_tpu.utils import (
        Quantity,
        is_quantity_close,
        quantity_from_string,
        typename,
    )

    q = quantity_from_string("300.0*kelvin")
    assert q == Quantity(300.0, "kelvin")
    assert quantity_from_string("5") == Quantity(5.0, "dimensionless")
    assert quantity_from_string("2.0/picosecond").unit == "/picosecond"
    assert quantity_from_string(
        "1.5e-3 * kilojoule/(mole*nanometer**2)").value == 1.5e-3
    with pytest.raises(ValueError):
        quantity_from_string("kelvin*300")

    assert is_quantity_close(Quantity(1.0, "kelvin"),
                             Quantity(1.0 + 1e-12, "kelvin"))
    assert not is_quantity_close(Quantity(1.0, "kelvin"),
                                 Quantity(1.1, "kelvin"))
    with pytest.raises(TypeError):
        is_quantity_close(Quantity(1.0, "kelvin"), Quantity(1.0, "bar"))

    assert typename(int) == "int"
    assert typename(Quantity(1.0, "kelvin")).endswith("Quantity")


def test_temporary_directory():
    import os

    from openmmtools_tpu.utils import temporary_directory

    with temporary_directory() as d:
        assert os.path.isdir(d)
        open(os.path.join(d, "f.txt"), "w").write("x")
    assert not os.path.exists(d)


def test_find_all_subclasses_and_find_subclass():
    """Reference utils.py:735/:767 contracts: transitive subclass discovery,
    abstract filtering, and unique-name lookup errors."""
    import abc

    from openmmtools_tpu.utils import find_all_subclasses, find_subclass

    class Base:
        pass

    class Mid(Base, abc.ABC):
        @abc.abstractmethod
        def f(self):
            ...

    class Leaf(Mid):
        def f(self):
            return 1

    class Other(Base):
        pass

    all_cls = find_all_subclasses(Base)
    assert {Base, Mid, Leaf, Other} <= all_cls
    concrete = find_all_subclasses(Base, discard_abstract=True)
    assert Mid not in concrete and {Base, Leaf, Other} <= concrete
    assert find_all_subclasses(Base, include_parent=False) >= {Mid, Leaf}
    assert Base not in find_all_subclasses(Base, include_parent=False)

    assert find_subclass(Base, "Leaf") is Leaf
    with pytest.raises(ValueError):
        find_subclass(Base, "Nope")

    class Dup1:
        pass

    first = type("Same", (Dup1,), {})
    second = type("Same", (Dup1,), {})
    assert first is not second
    with pytest.raises(ValueError):
        find_subclass(Dup1, "Same")

    # a real-framework hierarchy: every MCMCMove preset is discoverable
    from openmmtools_tpu.mcmc import LangevinDynamicsMove, MCMCMove
    assert LangevinDynamicsMove in find_all_subclasses(MCMCMove)
    assert find_subclass(MCMCMove, "LangevinDynamicsMove") \
        is LangevinDynamicsMove

def test_sanitize_expression_battery():
    """Reference test_sanitize_expression (test_utils.py:76): reserved words
    are rewritten everywhere they appear as whole identifiers; names that
    merely contain the word as a prefix/suffix are untouched."""
    from openmmtools_tpu.utils.math_eval import sanitize_expression

    word, s_word = "lambda", "_sanitized__lambda"
    cases = [
        (word, s_word),
        ("(" + word + ")", "(" + s_word + ")"),
        ("( " + word + " )", "( " + s_word + " )"),
        (word + "_suffix", word + "_suffix"),
        ("prefix_" + word, "prefix_" + word),
        ("2+" + word + "-" + word + "_suffix/(" + word + " - 3)",
         "2+" + s_word + "-" + word + "_suffix/(" + s_word + " - 3)"),
    ]
    for expr, expected in cases:
        s_expr, s_vars = sanitize_expression(expr, {word: 5.0})
        assert s_expr == expected, (s_expr, expected)
        assert word not in s_vars and s_vars[s_word] == 5.0


def test_math_eval_reference_battery():
    """Reference test_math_eval cases (test_utils.py:108), including the
    bitwise-set semantics of &/or and the step conventions."""
    from openmmtools_tpu.utils.math_eval import math_eval

    cases = [
        ("1 + 3", None, 4),
        ("x + y", {"x": 1.5, "y": 2}, 3.5),
        ("(x + lambda) / z * 4", {"x": 1, "lambda": 2, "z": 3}, 4.0),
        ("-((x + y) / z * 4)**2", {"x": 1, "y": 2, "z": 3}, -16.0),
        ("ceil(0.8) + acos(x) + step(0.5 - x) + step(0.5)", {"x": 1}, 2),
        ("step_hm(x)", {"x": 0}, 0.5),
        ("sign(-0.3) + sign(0.0) + sign(8)", None, 0.0),
        ("myset & myset2", {"myset": {1, 2, 3}, "myset2": {2, 3, 4}}, {2, 3}),
        ("myset or myset2", {"myset": {1, 2, 3}, "myset2": {2, 3, 4}},
         {1, 2, 3, 4}),
        ("(myset or my2set) & myset3",
         {"myset": {1, 2}, "my2set": {3, 4}, "myset3": {2, 3}}, {2, 3}),
        ("myset and myset2", {"myset": {1, 2, 3}, "myset2": {2, 3, 4}},
         {2, 3}),
    ]
    for expr, variables, expected in cases:
        got = math_eval(expr, variables)
        if isinstance(expected, set):
            assert got == expected, (expr, got)
        else:
            assert float(got) == pytest.approx(float(expected)), (expr, got)


def test_math_eval_traced_expression():
    """Expressions stay jittable/differentiable when fed tracers — the
    property AlchemicalFunction relies on (no reference analog: Lepton
    runs on-device there, math_eval runs in-trace here)."""
    from openmmtools_tpu.utils.math_eval import math_eval

    f = jax.jit(lambda lam: math_eval(
        "step(lambda - 0.5) * sin(lambda) + atan2(lambda, 2.0)",
        {"lambda": lam}))
    x = 0.75
    expect = math.sin(x) + math.atan2(x, 2.0)
    assert float(f(x)) == pytest.approx(expect, rel=1e-6)
    g = jax.grad(lambda lam: math_eval("lambda**3", {"lambda": lam}))(2.0)
    assert float(g) == pytest.approx(12.0, rel=1e-6)
