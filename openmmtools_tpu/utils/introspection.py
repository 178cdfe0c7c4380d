"""Class-hierarchy introspection helpers.

Parity with the reference's ``find_all_subclasses``/``find_subclass``
(utils/utils.py:735, :767), which back its name-based deserialization of
moves and integrators. Here structural serialization carries dotted module
paths instead, but the helpers remain part of the public utils surface.
"""
from __future__ import annotations

import inspect
from typing import Set


def find_all_subclasses(parent_cls: type, discard_abstract: bool = False,
                        include_parent: bool = True) -> Set[type]:
    """All classes inheriting (transitively) from ``parent_cls``.

    ``discard_abstract`` drops abstract classes; ``include_parent`` adds
    ``parent_cls`` itself (never when it is abstract and discarded).
    Handles diamond inheritance by returning a set.
    """
    found: Set[type] = set()
    stack = [parent_cls]
    while stack:
        cls = stack.pop()
        for sub in cls.__subclasses__():
            if sub not in found:
                stack.append(sub)
            if not (discard_abstract and inspect.isabstract(sub)):
                found.add(sub)
    if include_parent and not (discard_abstract
                               and inspect.isabstract(parent_cls)):
        if not inspect.isabstract(parent_cls):
            found.add(parent_cls)
    return found


def find_subclass(parent_cls: type, subcls_name: str) -> type:
    """The unique subclass of ``parent_cls`` named ``subcls_name``.

    Raises ``ValueError`` when no class — or more than one — with that name
    inherits from ``parent_cls`` (reference utils.py:767 contract).
    """
    matches = [cls for cls in find_all_subclasses(parent_cls)
               if cls.__name__ == subcls_name]
    if not matches:
        raise ValueError(f"Could not find class {subcls_name} inheriting "
                         f"from {parent_cls}")
    if len(matches) > 1:
        raise ValueError(f"Found multiple classes named {subcls_name} "
                         f"inheriting from {parent_cls}: {matches}")
    return matches[0]
