"""Frozen dataclasses registered as JAX pytrees.

Everything stateful in this framework (systems, thermodynamic states, sampler
states, integrator carries) is a frozen dataclass pytree so it can flow through
``jit`` / ``vmap`` / ``shard_map`` / ``lax.scan``. Fields that are *structural*
(shapes, method names, flags) are declared with :func:`static_field` and become
part of the treedef (recompilation key), not traced leaves.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any) -> Any:
    """A dataclass field treated as pytree *metadata* (static under jit)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls=None, **kwargs):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields created with :func:`static_field` are registered as meta fields
    (hashable, part of the structure); all other fields are data leaves.

    Also adds a ``replace`` method (alias of ``dataclasses.replace``).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )

        def _replace(self, **updates):
            return dataclasses.replace(self, **updates)

        c.replace = _replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)
