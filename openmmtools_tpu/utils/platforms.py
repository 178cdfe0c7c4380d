"""Device/platform introspection — the OpenMM platform-utils analog.

The reference's ``get_available_platforms`` / ``get_fastest_platform`` /
precision checks (utils/utils.py:518-610) map onto JAX backends and dtype
policy here.
"""
from __future__ import annotations

from typing import List


def get_available_platforms() -> List[str]:
    """Names of usable JAX backends, fastest first."""
    import jax

    platforms = []
    for name in ("tpu", "gpu", "cpu"):
        try:
            if jax.devices(name):
                platforms.append(name)
        except RuntimeError:
            continue
    return platforms


def get_fastest_platform() -> str:
    """Fastest available backend (reference utils/utils.py:583)."""
    platforms = get_available_platforms()
    if not platforms:
        raise RuntimeError("no JAX backend available")
    return platforms[0]


def platform_supports_precision(platform: str, precision: str) -> bool:
    """Whether a backend supports a precision mode ('single'/'double'/
    'mixed'). TPUs run f32 natively (f64 via slow emulation only when
    jax_enable_x64 is set); CPU supports both."""
    precision = precision.lower()
    if precision not in ("single", "double", "mixed"):
        raise ValueError(f"unknown precision {precision!r}")
    if platform == "cpu":
        return True
    if platform == "tpu":
        return precision in ("single", "mixed")
    return True


def device_report() -> dict:
    """Summary of devices, default backend and dtype policy."""
    import jax

    return {
        "backends": get_available_platforms(),
        "default_backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "x64_enabled": jax.config.read("jax_enable_x64"),
    }
