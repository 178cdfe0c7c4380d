"""Thermodynamic and sampler states as JAX pytrees.

TPU-native redesign of ``/root/reference/openmmtools/states.py`` (3969 LoC).
Key translations (SURVEY.md §7):

* ``ThermodynamicState`` (states.py:385) — instead of owning a mutable System
  copy with injected thermostat/barostat forces, it is a frozen pytree
  {system, temperature, pressure, surface_tension, global_params}. Ensembles
  are *fields*: pressure=None ⇒ NVT, pressure set ⇒ NPT (its pytree structure
  differs, so NVT and NPT states are "incompatible", matching the reference's
  compatibility semantics states.py:994).
* ``SamplerState`` (states.py:1933) — {positions, velocities, box_vectors};
  batching replicas = stacking a leading axis with ``jax.tree.map``.
* compatibility (states.py:1447-1504 standard-system hash) — two states are
  compatible iff their pytrees have identical treedef + leaf shapes/dtypes,
  i.e. the same jitted program applies. No context objects exist to recycle;
  XLA's compilation cache plays the role of the reference's ContextCache.
* ``reduced_potential`` u = beta (U + p V - gamma A) (states.py:837,1909).
* ``CompoundThermodynamicState``/``GlobalParameterState`` (states.py:2694,
  3100) — composable states contribute entries to the ``global_params`` dict
  consumed by System energy terms; parameter math-functions are evaluated
  with :func:`openmmtools_tpu.utils.math_eval` on traced values.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.constants import BAR_TO_KJ_PER_MOL_NM3, kB
from openmmtools_tpu.system import System, kinetic_energy, make_energy_fn, volume
from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field


class ThermodynamicsError(Exception):
    """Raised on inconsistent thermodynamic specifications
    (reference states.py:54 ThermodynamicsError)."""


class SamplerStateError(Exception):
    """Raised on inconsistent sampler-state operations (states.py:243)."""


# ---------------------------------------------------------------------------
# reduced potential
# ---------------------------------------------------------------------------


def compute_reduced_potential(potential_energy, beta, volume=None,
                              pressure=None, area=None, surface_tension=None):
    """u = beta [U + p V - gamma A].

    Mirrors ``ThermodynamicState._compute_reduced_potential``
    (states.py:1909-1932). ``pressure`` in bar, volumes in nm^3, energies in
    kJ/mol, surface tension in bar*nm (converted internally).
    """
    u = potential_energy
    if pressure is not None:
        u = u + pressure * BAR_TO_KJ_PER_MOL_NM3 * volume
    if surface_tension is not None:
        u = u - surface_tension * BAR_TO_KJ_PER_MOL_NM3 * area
    return beta * u


# ---------------------------------------------------------------------------
# SamplerState
# ---------------------------------------------------------------------------


@pytree_dataclass
class SamplerState:
    """Configurational state: positions, velocities, box vectors.

    Unlike the reference (states.py:1933) there are no cached energies or
    tracked arrays — energies are recomputed (cheap under jit and fused into
    the consuming program) and mutation is impossible on frozen pytrees.
    """

    positions: jax.Array                      # (N, 3) nm
    velocities: Optional[jax.Array] = None    # (N, 3) nm/ps
    box_vectors: Optional[jax.Array] = None   # (3, 3) nm

    def __post_init__(self):
        # Guarded construction check (reference states.py SamplerStateError
        # INCONSISTENT_VELOCITIES, tests/test_states.py:1234): only fires
        # when both leaves are real shaped arrays — jax's register_dataclass
        # may rebuild this node with placeholder leaves (None, tracers of
        # other ranks) during tree operations, which must never validate.
        p, v = self.positions, self.velocities
        if (hasattr(p, "shape") and hasattr(v, "shape")
                and len(getattr(p, "shape", ())) >= 2
                and len(getattr(v, "shape", ())) >= 2
                and p.shape[-2] != v.shape[-2]):
            raise SamplerStateError(
                f"inconsistent velocities: shape {v.shape} does not match "
                f"positions {p.shape}")

    @property
    def n_particles(self) -> int:
        return self.positions.shape[-2]

    @property
    def volume(self):
        if self.box_vectors is None:
            return None
        return volume(self.box_vectors)

    def has_nan(self) -> jax.Array:
        """True if positions (or velocities) contain NaN (states.py:2281)."""
        bad = jnp.any(~jnp.isfinite(self.positions))
        if self.velocities is not None:
            bad = bad | jnp.any(~jnp.isfinite(self.velocities))
        return bad

    def __getitem__(self, item):
        """Atom-subset selection (reference states.py:2297-2325).

        An integer returns a single-atom state with positions shape (1, 3);
        a slice or index sequence returns that subset. Box vectors carry
        over unchanged; the reference nulls its cached energies/CVs here,
        which have no analog on this frozen pytree.
        """
        if isinstance(item, int) or (
                hasattr(item, "shape") and getattr(item, "ndim", None) == 0):
            item = slice(item, item + 1) if int(item) != -1 else slice(-1, None)
        pos = self.positions[item]
        vel = None if self.velocities is None else self.velocities[item]
        return dataclasses.replace(self, positions=pos, velocities=vel)


def stack_sampler_states(states: Sequence[SamplerState]) -> SamplerState:
    """Stack replicas into a batched SamplerState with leading axis N."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def index_sampler_state(batched: SamplerState, i) -> SamplerState:
    """Extract replica ``i`` from a batched SamplerState."""
    return jax.tree.map(lambda x: x[i], batched)


# ---------------------------------------------------------------------------
# ThermodynamicState
# ---------------------------------------------------------------------------


@pytree_dataclass
class ThermodynamicState:
    """Ensemble definition: system + temperature (+ pressure, surface tension)
    + global parameters (lambdas etc.).

    NVT: pressure=None. NPT: pressure in bar. NPgammaT: + surface_tension in
    bar*nm. The reference's thermostat/barostat *forces* (states.py:385-836)
    have no analog — the ensemble is realized by integrators/moves that read
    these fields.
    """

    system: System
    temperature: jax.Array                      # K
    pressure: Optional[jax.Array] = None        # bar
    surface_tension: Optional[jax.Array] = None  # bar nm
    global_params: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def n_particles(self) -> int:
        return self.system.n_particles

    @property
    def kT(self):
        return kB * self.temperature

    @property
    def beta(self):
        return 1.0 / (kB * self.temperature)

    @property
    def is_periodic(self) -> bool:
        return self.system.periodic

    @property
    def volume(self):
        """Volume of the default box for NVT states (None under NPT, where
        volume is a property of the sampler state — states.py:640)."""
        if self.pressure is not None or self.system.default_box is None:
            return None
        return volume(self.system.default_box)

    def potential_energy(self, sampler_state: SamplerState):
        box = sampler_state.box_vectors
        if box is None:
            box = self.system.default_box
        u_fn = make_energy_fn(self.system)
        return u_fn(sampler_state.positions, box, self.global_params)

    def kinetic_energy(self, sampler_state: SamplerState):
        if sampler_state.velocities is None:
            raise SamplerStateError("sampler state has no velocities")
        return kinetic_energy(self.system.masses, sampler_state.velocities)

    def reduced_potential(self, sampler_state: SamplerState):
        """u(x) = beta [U(x) + p V(x)] (states.py:818-866)."""
        U = self.potential_energy(sampler_state)
        vol = sampler_state.volume
        area = None
        if self.surface_tension is not None and sampler_state.box_vectors is not None:
            b = sampler_state.box_vectors
            area = 2.0 * b[0, 0] * b[1, 1]  # xy area, both leaflets
        return compute_reduced_potential(
            U, self.beta, volume=vol, pressure=self.pressure, area=area,
            surface_tension=self.surface_tension,
        )


# --- compatibility (states.py:994-1092, hash-based in the reference) -------


def _abstract_signature(state: ThermodynamicState):
    leaves, treedef = jax.tree.flatten(state.system)
    shapes = tuple((l.shape, str(jnp.asarray(l).dtype)) for l in leaves)
    ensemble = (state.pressure is not None, state.surface_tension is not None,
                tuple(sorted(state.global_params.keys())))
    return (treedef, shapes, ensemble)


def is_state_compatible(state1: ThermodynamicState, state2: ThermodynamicState) -> bool:
    """True iff the same compiled program evaluates both states: identical
    system pytree structure + leaf shapes + ensemble structure. Plays the role
    of the reference's standard-system-hash compatibility (states.py:994)."""
    return _abstract_signature(state1) == _abstract_signature(state2)


def group_by_compatibility(states: Sequence[ThermodynamicState]):
    """Group states by compatibility, preserving order within groups
    (states.py:186). Returns (groups, original_indices)."""
    groups: List[List[ThermodynamicState]] = []
    indices: List[List[int]] = []
    sigs: List[Any] = []
    for i, s in enumerate(states):
        sig = _abstract_signature(s)
        for gi, known in enumerate(sigs):
            if known == sig:
                groups[gi].append(s)
                indices[gi].append(i)
                break
        else:
            sigs.append(sig)
            groups.append([s])
            indices.append([i])
    return groups, indices


# ---------------------------------------------------------------------------
# state stacks (the vmap analog of a list of compatible states)
# ---------------------------------------------------------------------------


def stack_thermodynamic_states(states: Sequence[ThermodynamicState]) -> ThermodynamicState:
    """Stack K compatible states into one state with leading axis K on the
    varying fields (temperature, pressure, global params). The system is
    shared (taken from the first state) — callers must ensure compatibility.
    """
    if not states:
        raise ValueError("empty state list")
    first = states[0]
    for s in states[1:]:
        if not is_state_compatible(first, s):
            raise ThermodynamicsError("cannot stack incompatible states")
    temperature = jnp.stack([jnp.asarray(s.temperature) for s in states])
    pressure = None
    if first.pressure is not None:
        pressure = jnp.stack([jnp.asarray(s.pressure) for s in states])
    surface_tension = None
    if first.surface_tension is not None:
        surface_tension = jnp.stack([jnp.asarray(s.surface_tension) for s in states])
    global_params = {
        k: jnp.stack([jnp.asarray(s.global_params[k]) for s in states])
        for k in first.global_params
    }
    return ThermodynamicState(
        system=first.system, temperature=temperature, pressure=pressure,
        surface_tension=surface_tension, global_params=global_params,
    )


def unstack_thermodynamic_states(stacked: ThermodynamicState) -> List[ThermodynamicState]:
    k = jnp.asarray(stacked.temperature).shape[0]
    out = []
    for i in range(k):
        out.append(ThermodynamicState(
            system=stacked.system,
            temperature=stacked.temperature[i],
            pressure=None if stacked.pressure is None else stacked.pressure[i],
            surface_tension=(None if stacked.surface_tension is None
                             else stacked.surface_tension[i]),
            global_params={k_: v[i] for k_, v in stacked.global_params.items()},
        ))
    return out


def reduced_potential_at_states(sampler_state: SamplerState,
                                stacked: ThermodynamicState):
    """u_k = reduced potential of one configuration at each of K stacked
    states — the TPU analog of ``reduced_potential_at_states`` (states.py:144,
    912): a vmap over (T_k, p_k, lambda_k) instead of serial context-parameter
    mutation + per-force-group energy queries.
    Returns shape (K,)."""
    system = stacked.system

    def u_one(temperature, pressure, surface_tension, global_params):
        st = ThermodynamicState(system=system, temperature=temperature,
                                pressure=pressure,
                                surface_tension=surface_tension,
                                global_params=global_params)
        return st.reduced_potential(sampler_state)

    in_axes = (0,
               None if stacked.pressure is None else 0,
               None if stacked.surface_tension is None else 0,
               {k: 0 for k in stacked.global_params})
    return jax.vmap(u_one, in_axes=in_axes)(
        stacked.temperature, stacked.pressure, stacked.surface_tension,
        stacked.global_params)


def reduced_potential_matrix(batched_sampler: SamplerState,
                             stacked: ThermodynamicState):
    """u[n, k] for N stacked configurations × K stacked states — the
    multistate energy matrix (SURVEY.md §3.3) as one fused program."""
    return jax.vmap(lambda ss: reduced_potential_at_states(ss, stacked))(
        batched_sampler)


# ---------------------------------------------------------------------------
# protocols (create_thermodynamic_state_protocol, states.py:39)
# ---------------------------------------------------------------------------


def create_thermodynamic_state_protocol(
    reference_state: ThermodynamicState,
    protocol: Mapping[str, Sequence],
    constants: Optional[Mapping[str, Any]] = None,
) -> List[ThermodynamicState]:
    """Build a ladder of states by varying attributes/global parameters.

    ``protocol`` maps names ('temperature', 'pressure', or any global
    parameter name) to equal-length sequences of values. ``constants`` are
    applied to every state. Mirrors reference states.py:39-143.
    """
    if isinstance(reference_state, CompoundThermodynamicState):
        # resolve composable-state parameters into plain global_params so
        # the ladder states carry them (reference builds compound states;
        # here states ARE their parameters)
        reference_state = reference_state.resolve()
    constants = dict(constants or {})
    lengths = {len(v) for v in protocol.values()}
    if len(lengths) != 1:
        raise ValueError(f"protocol sequences have different lengths: {lengths}")
    if 0 in lengths:
        raise ValueError("protocol sequences are empty")
    n_states = lengths.pop()

    states = []
    for i in range(n_states):
        values = dict(constants)
        values.update({k: v[i] for k, v in protocol.items()})
        temperature = values.pop("temperature", reference_state.temperature)
        pressure = values.pop("pressure", reference_state.pressure)
        surface_tension = values.pop("surface_tension", reference_state.surface_tension)
        gp = dict(reference_state.global_params)
        gp.update(values)
        states.append(ThermodynamicState(
            system=reference_state.system, temperature=jnp.asarray(temperature),
            pressure=None if pressure is None else jnp.asarray(pressure),
            surface_tension=(None if surface_tension is None
                             else jnp.asarray(surface_tension)),
            global_params=gp))
    return states


# ---------------------------------------------------------------------------
# GlobalParameterState / CompoundThermodynamicState
# ---------------------------------------------------------------------------


class GlobalParameterError(Exception):
    """Raised on invalid global-parameter operations (states.py:3100 region)."""


class GlobalParameterFunction:
    """A global parameter enslaved to a math expression of *function
    variables* (reference states.py:3058-3098 GlobalParameterFunction and
    AlchemicalFunction alchemy.py:65).

    >>> f = GlobalParameterFunction('lambda**2')
    """

    def __init__(self, expression: str):
        self.expression = expression

    def __call__(self, variables: Mapping[str, Any]):
        from openmmtools_tpu.utils.math_eval import math_eval

        return math_eval(self.expression, variables)

    def __repr__(self):
        return f"GlobalParameterFunction({self.expression!r})"


class GlobalParameter:
    """Descriptor declaring a controlled global parameter on a
    GlobalParameterState subclass (reference states.py:3100 docstring usage).
    """

    def __init__(self, parameter_name: str, standard_value,
                 validator: Optional[Callable] = None):
        self.parameter_name = parameter_name
        self.standard_value = standard_value
        self.validator = validator

    def __set_name__(self, owner, name):
        self.attr_name = name

    def __get__(self, instance, owner):
        if instance is None:
            return self
        return instance.get_parameter(self.parameter_name)

    def __set__(self, instance, value):
        instance.set_parameter(self.parameter_name, value)


class GlobalParameterState:
    """Composable state controlling a set of global parameters.

    Behavioral analog of reference states.py:3100: subclasses declare
    parameters with :class:`GlobalParameter` descriptors; instances hold
    values (None = parameter not controlled), support name suffixes for
    multi-region control, validators, and parameters enslaved to
    :class:`GlobalParameterFunction` expressions of user-set function
    variables.

    Instances are registered as pytrees: parameter values and function
    variables are leaves; names/suffix are structure.
    """

    _GLOBAL_PARAMETERS: Dict[str, GlobalParameter] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        params = {}
        for klass in reversed(cls.__mro__):
            for name, value in vars(klass).items():
                if isinstance(value, GlobalParameter):
                    params[value.parameter_name] = value
        cls._GLOBAL_PARAMETERS = params
        jax.tree_util.register_pytree_node(
            cls, cls._tree_flatten, cls._tree_unflatten
        )

    def __init__(self, parameters_name_suffix: Optional[str] = None, **kwargs):
        self._parameters: Dict[str, Any] = {}
        self._function_variables: Dict[str, Any] = {}
        self._suffix = parameters_name_suffix
        base = type(self)._GLOBAL_PARAMETERS
        for base_name in base:
            self._parameters[self._suffixed(base_name)] = None
        for key, value in kwargs.items():
            if key not in base:
                raise GlobalParameterError(
                    f"unknown parameter {key!r}; known: {sorted(base)}")
            self.set_parameter(self._suffixed(key), value)

    # -- naming ------------------------------------------------------------
    def _suffixed(self, base_name: str) -> str:
        if self._suffix is None:
            return base_name
        return f"{base_name}_{self._suffix}"

    def _base_name(self, name: str) -> str:
        if self._suffix is not None and name.endswith("_" + self._suffix):
            return name[: -len(self._suffix) - 1]
        return name

    @property
    def parameters_name_suffix(self):
        return self._suffix

    # -- access ------------------------------------------------------------
    def get_parameter(self, name: str):
        name = self._suffixed(name) if name in type(self)._GLOBAL_PARAMETERS else name
        value = self._parameters[name]
        if isinstance(value, GlobalParameterFunction):
            return value(self._function_variables)
        return value

    def set_parameter(self, name: str, value):
        base = type(self)._GLOBAL_PARAMETERS
        lookup = self._base_name(name) if name in self._parameters else name
        if lookup in base and name not in self._parameters:
            name = self._suffixed(lookup)
        if name not in self._parameters:
            raise GlobalParameterError(f"{name!r} is not controlled by this state")
        descriptor = base[self._base_name(name)]
        if value is not None and not isinstance(value, GlobalParameterFunction):
            if descriptor.validator is not None:
                value = descriptor.validator(self, value)
        self._parameters[name] = value

    def set_function_variable(self, name: str, value):
        """Set a variable usable inside GlobalParameterFunction expressions."""
        self._function_variables[name] = value

    def get_function_variable(self, name: str):
        return self._function_variables[name]

    @property
    def parameters(self) -> Dict[str, Any]:
        """Resolved {name: value} for controlled (non-None) parameters."""
        out = {}
        for name, value in self._parameters.items():
            if value is None:
                continue
            if isinstance(value, GlobalParameterFunction):
                value = value(self._function_variables)
            out[name] = value
        return out

    # -- composable-state protocol (states.py:2532 IComposableState) --------
    def apply_to_state(self, thermo: ThermodynamicState) -> ThermodynamicState:
        gp = dict(thermo.global_params)
        gp.update(self.parameters)
        return thermo.replace(global_params=gp)

    @staticmethod
    def _system_global_defaults(system: System) -> Dict[str, Any]:
        """{name: default value} of every global parameter a System's terms
        declare (the System carries standard values; live values are passed
        per-evaluation as the ``params`` dict)."""
        defaults: Dict[str, Any] = {}
        for term in system.terms:
            gd = getattr(term, "global_defaults", None)
            if isinstance(gd, dict):
                defaults.update(gd)
            for attr in ("charge_scale_param", "lj_scale_param"):
                pname = getattr(term, attr, None)
                if pname is not None:
                    defaults.setdefault(pname, 1.0)
        return defaults

    @classmethod
    def from_system(cls, system: System, parameters_name_suffix=None):
        """Read controlled parameter defaults out of a System's terms
        (reference states.py:3280 from_system)."""
        defaults = cls._system_global_defaults(system)
        instance = cls(parameters_name_suffix=parameters_name_suffix)
        found = False
        for name in list(instance._parameters):
            if name in defaults:
                instance.set_parameter(name, defaults[name])
                found = True
        if not found:
            raise GlobalParameterError(
                f"system defines none of the parameters {sorted(instance._parameters)}")
        return instance

    def check_system_consistency(self, system: System) -> None:
        """Raise GlobalParameterError unless the system's declared global
        parameters match this state (reference states.py
        check_system_consistency, tests/test_states.py:2209): every resolved
        parameter must exist in the system at the same value, and the system
        must not declare a parameter this state controls but has set None.
        """
        defaults = self._system_global_defaults(system)
        for name, value in self.parameters.items():
            if name not in defaults:
                raise GlobalParameterError(
                    f"Consistency check failed: could not find global "
                    f"parameter {name} in the system")
            if not np.isclose(float(defaults[name]), float(value)):
                raise GlobalParameterError(
                    f"Consistency check failed: {name} is "
                    f"{defaults[name]!r} in the system but {value!r} in "
                    f"this state")
        for name in defaults:
            if name in self._parameters and self._parameters[name] is None:
                raise GlobalParameterError(
                    f"Consistency check failed: the system parameter {name} "
                    f"is undefined (None) in this state")

    def __eq__(self, other):
        # Function-valued parameters compare by their RESOLVED values
        # (reference tests/test_states.py:2154: a state whose parameter is
        # GlobalParameterFunction('lambda1 / 2') with lambda1=2 equals a
        # plain lambda=1 state); None-controlled parameters drop out of
        # ``parameters`` so controlling different subsets compares unequal.
        return (type(self) is type(other)
                and self._suffix == other._suffix
                and set(self._parameters) == set(other._parameters)
                and self.parameters == other.parameters)

    def __repr__(self):
        vals = ", ".join(f"{k}={v!r}" for k, v in self._parameters.items())
        return f"{type(self).__name__}({vals})"

    # -- pytree ------------------------------------------------------------
    def _tree_flatten(self):
        pkeys = sorted(self._parameters)
        fkeys = sorted(self._function_variables)
        leaves = [self._parameters[k] for k in pkeys] + \
                 [self._function_variables[k] for k in fkeys]
        aux = (self._suffix, tuple(pkeys), tuple(fkeys))
        return leaves, aux

    @classmethod
    def _tree_unflatten(cls, aux, leaves):
        suffix, pkeys, fkeys = aux
        obj = cls.__new__(cls)
        obj._suffix = suffix
        obj._parameters = dict(zip(pkeys, leaves[: len(pkeys)]))
        obj._function_variables = dict(zip(fkeys, leaves[len(pkeys):]))
        return obj


@pytree_dataclass
class CompoundThermodynamicState:
    """ThermodynamicState + composable states (states.py:2694).

    Composable states contribute global parameters; ``thermodynamic_state``
    property resolves them into a plain ThermodynamicState whose
    ``global_params`` the energy terms consume. Attribute access for
    parameters is forwarded to the composable states, mirroring the
    reference's dynamic forwarding (states.py:2885-2954).
    """

    base_state: ThermodynamicState
    composable_states: Tuple[Any, ...] = ()

    def resolve(self) -> ThermodynamicState:
        state = self.base_state
        for cs in self.composable_states:
            state = cs.apply_to_state(state)
        return state

    # convenience forwarding ------------------------------------------------
    def __getattr__(self, name):
        # dataclass fields handled normally; anything else is forwarded to
        # the composable states first (reference states.py:2885-2954), then
        # to the base ThermodynamicState (so e.g. surface_tension and other
        # ensemble attributes resolve through the compound)
        if name in ("base_state", "composable_states"):
            # avoid recursion during pytree unflattening (fields may be
            # absent while the object is being reconstructed)
            raise AttributeError(name)
        for cs in self.composable_states:
            try:
                return cs.get_parameter(name)
            except (KeyError, GlobalParameterError):
                continue
            except AttributeError:
                continue
        try:
            return getattr(self.base_state, name)
        except AttributeError:
            pass
        raise AttributeError(name)

    @property
    def temperature(self):
        return self.base_state.temperature

    @property
    def pressure(self):
        return self.base_state.pressure

    @property
    def system(self):
        return self.base_state.system

    @property
    def beta(self):
        return self.base_state.beta

    @property
    def kT(self):
        return self.base_state.kT

    @property
    def global_params(self):
        return self.resolve().global_params

    def reduced_potential(self, sampler_state: SamplerState):
        return self.resolve().reduced_potential(sampler_state)

    def potential_energy(self, sampler_state: SamplerState):
        return self.resolve().potential_energy(sampler_state)
