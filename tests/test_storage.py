"""Storage layer tests (analog of tests/test_storage_iodrivers.py and
tests/test_storage_interface.py)."""
import numpy as np
import pytest

from openmmtools_tpu.storage import HDF5IODriver, StorageInterface


@pytest.mark.parametrize("value", [
    42, 3.14, True, "hello world", [1, 2, 3], (4.0, 5.0),
    ["a", "b"], {"key": 1, "other": [1, 2]},
    np.arange(12, dtype=np.float32).reshape(3, 4),
])
def test_roundtrip_types(tmp_path, value):
    d = HDF5IODriver(str(tmp_path / "t.h5"))
    d.write("x", value)
    out = d.read("x")
    if isinstance(value, np.ndarray):
        assert np.allclose(out, value)
    else:
        assert out == value
    d.close()


def test_appendable(tmp_path):
    d = HDF5IODriver(str(tmp_path / "a.h5"))
    for i in range(5):
        d.append("traj/energy", float(i) * 1.5)
    assert d.length("traj/energy") == 5
    assert d.read_appended("traj/energy", 3) == 4.5
    assert d.read_appended("traj/energy") == [0.0, 1.5, 3.0, 4.5, 6.0]
    # ndarray frames
    for i in range(3):
        d.append("traj/x", np.full((4, 3), i, dtype=np.float32))
    assert np.allclose(d.read_appended("traj/x", 2), 2.0)
    d.close()


def test_quantity_roundtrip(tmp_path):
    """Unit-tagged values round-trip with their unit string (reference
    NCQuantity codec, iodrivers.py:1401-1500)."""
    from openmmtools_tpu.storage import Quantity

    d = HDF5IODriver(str(tmp_path / "q.h5"))
    d.write("temperature", Quantity(300.0, "kelvin"))
    out = d.read("temperature")
    assert isinstance(out, Quantity)
    assert out == Quantity(300.0, "kelvin")
    assert out.unit == "kelvin" and out.value == 300.0

    # array payloads and the appendable iteration dimension
    frame = Quantity(np.arange(6, dtype=np.float64).reshape(2, 3),
                     "nanometer")
    d.write("positions", frame)
    back = d.read("positions")
    assert back.unit == "nanometer" and np.allclose(back.value, frame.value)
    for i in range(3):
        d.append("traj/x", Quantity(np.full((2, 3), float(i)), "nanometer"))
    got = d.read_appended("traj/x", 2)
    assert isinstance(got, Quantity) and np.allclose(got.value, 2.0)

    # openmm.unit.Quantity-shaped objects are duck-typed on write
    class FakeOpenMMQuantity:
        def __init__(self, value, unit):
            self._value = value
            self.unit = unit

    d.write("cutoff", FakeOpenMMQuantity(0.9, "nanometer"))
    got = d.read("cutoff")
    assert isinstance(got, Quantity)
    assert got.value == 0.9 and got.unit == "nanometer"

    # unit mismatch on append raises instead of silently re-tagging
    with pytest.raises(ValueError):
        d.append("traj/x", Quantity(np.zeros((2, 3)), "angstrom"))
    # nested quantities raise instead of losing the inner unit
    with pytest.raises(TypeError):
        d.write("bad", Quantity(Quantity(1.0, "nanometer"), "kelvin"))
    # shape-mismatched payloads compare unequal, not raise
    assert Quantity(np.zeros((5, 3)), "nm") != Quantity(np.zeros((4, 3)),
                                                        "nm")
    d.close()


def test_overwrite(tmp_path):
    d = HDF5IODriver(str(tmp_path / "o.h5"))
    d.write("v", 1)
    d.write("v", "now a string")
    assert d.read("v") == "now a string"
    d.close()


def test_storage_interface_dotted_paths(tmp_path):
    si = StorageInterface(str(tmp_path / "si.h5"))
    si.mydir.myvar.write(4)
    assert si.mydir.myvar.read() == 4
    si.stats.energies.append(1.0)
    si.stats.energies.append(2.0)
    assert si.stats.energies.read_appended() == [1.0, 2.0]
    assert si.deep.nested.directory.value.path == "deep/nested/directory/value"
    si.close()

    # reopen and read back
    si2 = StorageInterface(str(tmp_path / "si.h5"))
    assert si2.mydir.myvar.read() == 4
    si2.close()


def test_driver_introspection(tmp_path):
    d = HDF5IODriver(str(tmp_path / "i.h5"))
    d.write("grp/a", 1)
    d.write("grp/b", 2.0)
    d.write("top", "x")
    assert "grp" in d.groups("/")
    assert sorted(d.variables("grp")) == ["a", "b"]
    assert "grp/a" in d
    d.close()


def test_metadata_round_trip(tmp_path):
    """Variable/group metadata (reference iodrivers add_metadata)."""
    from openmmtools_tpu.storage import StorageInterface

    si = StorageInterface(str(tmp_path / "meta.h5"))
    si.data.myvar.write([1.0, 2.0, 3.0])
    si.data.myvar.add_metadata("units", "kJ/mol")
    si.data.add_metadata("created_by", "test")
    assert si.data.myvar.get_metadata("units") == "kJ/mol"
    assert si.data.get_metadata()["created_by"] == "test"
    si.close()
    si2 = StorageInterface(str(tmp_path / "meta.h5"))
    assert si2.data.myvar.get_metadata("units") == "kJ/mol"
    si2.close()


def test_analysis_velocities_round_trip(tmp_path):
    """Reporter stores per-iteration analysis-subset velocities when
    requested (reference velocity-storage option)."""
    import jax
    import numpy as np

    from openmmtools_tpu.mcmc import LangevinDynamicsMove
    from openmmtools_tpu.models import HarmonicOscillator
    from openmmtools_tpu.multistate import (
        MultiStateReporter,
        ReplicaExchangeSampler,
    )
    from openmmtools_tpu.states import (
        SamplerState,
        create_thermodynamic_state_protocol,
    )

    ho = HarmonicOscillator(K=100.0)
    states = create_thermodynamic_state_protocol(
        ho.thermodynamic_state(300.0),
        protocol={"testsystems_HarmonicOscillator_K": [100.0, 200.0]})
    rep = MultiStateReporter(str(tmp_path / "av.h5"), checkpoint_interval=10,
                             analysis_particle_indices=[0],
                             analysis_velocities=True)
    sampler = ReplicaExchangeSampler(
        mcmc_moves=LangevinDynamicsMove(timestep=0.002, collision_rate=5.0,
                                        n_steps=2),
        number_of_iterations=4, online_analysis_interval=None, rng_seed=3)
    sampler.create(states, SamplerState(positions=ho.positions), storage=rep)
    sampler.run()
    v = rep.read_analysis_velocities()
    assert v is not None and v.shape[0] >= 4 and v.shape[2] == 1
    assert np.all(np.isfinite(v[1:]))
    rep.close()


def test_write_at_index(tmp_path):
    """Reference test_storage_interface.py at_index semantics: overwrite one
    row of an appended series; unbound target or out-of-range index raise."""
    from openmmtools_tpu.storage import StorageInterface

    si = StorageInterface(str(tmp_path / "ai.h5"))
    # must be bound (appended to) first
    with pytest.raises(KeyError):
        si.traj.energy.write(1.0, at_index=0)
    for v in (1.0, 2.0, 3.0):
        si.traj.energy.append(v)
    si.traj.energy.write(99.0, at_index=1)
    assert si.traj.energy.read_appended() == [1.0, 99.0, 3.0]
    si.traj.energy.write(7.0, at_index=-1)   # negative indexing
    assert si.traj.energy.read_appended(index=2) == 7.0
    with pytest.raises(IndexError):
        si.traj.energy.write(0.0, at_index=3)
    # a static (non-appended) variable is not an at_index target
    si.meta.title.write("hello")
    with pytest.raises(KeyError):
        si.meta.title.write("x", at_index=0)
    si.close()

def test_read_trap(tmp_path):
    """Reference test_read_trap (test_storage_interface.py:54): reading a
    variable that was never written raises KeyError, not a silent None."""
    from openmmtools_tpu.storage import StorageInterface

    si = StorageInterface(str(tmp_path / "trap.h5"))
    with pytest.raises(KeyError):
        si.var1.read()
    with pytest.raises(KeyError):
        si.some.nested.thing.read()
    si.close()
