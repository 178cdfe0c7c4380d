"""Unit-string helpers over the storage :class:`Quantity`.

Parity layer for the reference's quantity utilities
(``/root/reference/openmmtools/utils/utils.py:400-478``:
``is_quantity_close`` and ``quantity_from_string``). The framework computes
in fixed MD units (kJ/mol, nm, ps, K), so a "quantity" here is a plain
value tagged with its unit STRING (storage.iodrivers.Quantity) rather than
an object with unit algebra — enough to round-trip configuration values
like ``"300.0*kelvin"`` through YAML/storage and compare them safely.
"""
from __future__ import annotations

import re
from contextlib import contextmanager

import numpy as np

from openmmtools_tpu.storage.iodrivers import Quantity

__all__ = ["quantity_from_string", "is_quantity_close", "typename",
           "temporary_directory", "Quantity"]

_NUMBER = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"


def quantity_from_string(expression: str) -> Quantity:
    """Parse ``"<number> * <unit expression>"`` into a :class:`Quantity`
    (reference utils.py:438). Accepts a bare number (dimensionless), a
    ``*``-attached unit (``"300*kelvin"``), or a ``/``-attached inverse unit
    (``"2.0/picosecond"`` -> unit string ``"/picosecond"``); the unit
    expression itself is kept verbatim (``"kilojoule/(mole*nanometer**2)"``).
    """
    s = expression.strip()
    try:
        return Quantity(float(s), "dimensionless")
    except ValueError:
        pass
    m = re.match(rf"^({_NUMBER})\s*([*/])\s*(.+)$", s)
    if m is None:
        raise ValueError(
            f"cannot parse quantity expression {expression!r}: expected "
            "'<number>', '<number>*<unit>' or '<number>/<unit>'")
    value, op, unit = float(m.group(1)), m.group(2), m.group(3).strip()
    if not unit:
        raise ValueError(f"empty unit in {expression!r}")
    return Quantity(value, unit if op == "*" else "/" + unit)


def is_quantity_close(quantity1, quantity2, rtol=1e-10, atol=0.0) -> bool:
    """True when two quantities agree within tolerance (reference
    utils.py:400). Unit strings must match exactly — this layer has no unit
    conversion algebra, mirroring the reference's TypeError on incompatible
    units."""
    q1 = quantity1 if isinstance(quantity1, Quantity) \
        else Quantity(quantity1, "dimensionless")
    q2 = quantity2 if isinstance(quantity2, Quantity) \
        else Quantity(quantity2, "dimensionless")
    if q1.unit != q2.unit:
        raise TypeError(
            f"cannot compare incompatible quantities {q1!r} and {q2!r}")
    return bool(np.allclose(np.asarray(q1.value), np.asarray(q2.value),
                            rtol=rtol, atol=atol))


def typename(atype) -> str:
    """Qualified name of a type or instance's type (reference
    utils.py:478)."""
    if not isinstance(atype, type):
        atype = type(atype)
    mod = atype.__module__
    if mod in (None, "builtins"):
        return atype.__qualname__
    return f"{mod}.{atype.__qualname__}"


@contextmanager
def temporary_directory():
    """Context manager yielding a self-deleting directory (reference
    utils.py:49; thin parity alias over the stdlib)."""
    import tempfile

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as path:
        yield path
