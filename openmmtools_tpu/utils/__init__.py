"""Utility layer: pytree dataclasses, timers, safe math evaluation, serialization.

TPU-native analog of ``/root/reference/openmmtools/utils/utils.py``. The
reference's RestorableOpenMMObject machinery (utils.py:810) exists to survive
OpenMM XML round-trips; here objects are plain pytree dataclasses that
serialize structurally (see :mod:`openmmtools_tpu.utils.serialization`).
"""

from openmmtools_tpu.utils.pytree import pytree_dataclass, static_field
from openmmtools_tpu.utils.timing import Timer, time_it, with_timer
from openmmtools_tpu.utils.math_eval import math_eval, sanitize_expression
from openmmtools_tpu.utils.serialization import serialize, deserialize
from openmmtools_tpu.utils.introspection import (
    find_all_subclasses,
    find_subclass,
)
from openmmtools_tpu.utils.platforms import (
    get_available_platforms,
    get_fastest_platform,
    platform_supports_precision,
    device_report,
)
from openmmtools_tpu.utils.units import (
    Quantity,
    is_quantity_close,
    quantity_from_string,
    temporary_directory,
    typename,
)

__all__ = [
    "Quantity",
    "quantity_from_string",
    "is_quantity_close",
    "typename",
    "temporary_directory",
    "pytree_dataclass",
    "static_field",
    "Timer",
    "time_it",
    "with_timer",
    "math_eval",
    "sanitize_expression",
    "serialize",
    "deserialize",
    "find_all_subclasses",
    "find_subclass",
    "get_available_platforms",
    "get_fastest_platform",
    "platform_supports_precision",
    "device_report",
]
