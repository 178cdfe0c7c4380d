"""Structural (de)serialization of framework objects.

Analog of the reference ``utils.serialize``/``deserialize``
(utils/utils.py:611-691): round-trip any framework object through a plain dict
containing the fully-qualified class name plus its state. Pytree dataclasses
serialize their leaves as numpy arrays; static fields as-is.

The reference's ``RestorableOpenMMObject`` (utils/utils.py:810) solves an
OpenMM-specific problem (recovering Python interfaces from XML-serialized C++
objects); it has no analog here because framework objects never lose their
Python type.
"""
from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Dict

import numpy as np


def _encode(value: Any) -> Any:
    import jax

    if isinstance(value, (int, float, str, bool, type(None))):
        return value
    if isinstance(value, np.ndarray):
        # explicit shape: tolist() of a zero-size (0, k) array is [] and
        # would round-trip as shape (0,), silently changing the pytree
        # structure (breaks resumed-sampler program reuse)
        return {"_type": "ndarray", "data": value.tolist(),
                "dtype": str(value.dtype), "shape": list(value.shape)}
    if isinstance(value, jax.Array):
        arr = np.asarray(value)
        return {"_type": "ndarray", "data": arr.tolist(),
                "dtype": str(arr.dtype), "shape": list(arr.shape)}
    if isinstance(value, dict):
        return {"_type": "dict", "items": {k: _encode(v) for k, v in value.items()}}
    if isinstance(value, (list, tuple)):
        return {
            "_type": "tuple" if isinstance(value, tuple) else "list",
            "items": [_encode(v) for v in value],
        }
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        return serialize(value)
    if hasattr(value, "__getstate__") and not isinstance(value, type):
        # arbitrary framework objects (MCMC moves, nested containers)
        # round-trip through their __getstate__/__setstate__ like the
        # reference's utils.serialize (utils/utils.py:611-691)
        return serialize(value)
    raise TypeError(f"cannot serialize {type(value)!r}")


def _decode(value: Any) -> Any:
    if isinstance(value, dict):
        t = value.get("_type")
        if t == "ndarray":
            arr = np.asarray(value["data"], dtype=value["dtype"])
            if "shape" in value:
                arr = arr.reshape(value["shape"])
            return arr
        if t == "dict":
            return {k: _decode(v) for k, v in value["items"].items()}
        if t == "list":
            return [_decode(v) for v in value["items"]]
        if t == "tuple":
            return tuple(_decode(v) for v in value["items"])
        if "_serialized__module_name" in value:
            return deserialize(value)
    return value


def serialize(instance: Any) -> Dict[str, Any]:
    """Serialize a pytree dataclass (or any object with __getstate__) to a dict."""
    serialization: Dict[str, Any] = {
        "_serialized__module_name": type(instance).__module__,
        "_serialized__class_name": type(instance).__qualname__,
    }
    if dataclasses.is_dataclass(instance):
        for f in dataclasses.fields(instance):
            serialization[f.name] = _encode(getattr(instance, f.name))
    elif hasattr(instance, "__getstate__"):
        serialization["_state"] = _encode(instance.__getstate__())
    else:
        raise TypeError(f"cannot serialize {type(instance)!r}")
    return serialization


def deserialize(serialization: Dict[str, Any]) -> Any:
    """Inverse of :func:`serialize`."""
    data = dict(serialization)
    module_name = data.pop("_serialized__module_name")
    class_name = data.pop("_serialized__class_name")
    module = importlib.import_module(module_name)
    cls = module
    for part in class_name.split("."):
        cls = getattr(cls, part)
    if "_state" in data:
        instance = cls.__new__(cls)
        state = _decode(data["_state"])
        if hasattr(instance, "__setstate__"):
            instance.__setstate__(state)
        else:  # plain objects: object.__getstate__ returned __dict__
            instance.__dict__.update(state)
        return instance
    kwargs = {k: _decode(v) for k, v in data.items()}
    return cls(**kwargs)
