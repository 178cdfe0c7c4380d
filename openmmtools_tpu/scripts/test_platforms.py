"""Every-system cross-backend / cross-precision parity sweep.

Analog of the reference's ``test-openmm-platforms`` console script
(scripts/test_openmm_platforms.py:337): the reference computes potential
energy and forces of EVERY test system on every installed OpenMM platform
and flags deviations beyond ENERGY_TOLERANCE = 0.06 kcal/mol (:154),
serializing failures for reproduction (:300-335).

Here the "platforms" are this engine's compute configurations:

  * cpu/f64  — the reference configuration (error floor)
  * cpu/f32  — the production dtype on the host backend
  * tpu/f32  — the production configuration (when a TPU is attached)
  * kernel   — the integrator's Pallas kernel path (sweep/fused) vs the
               dense XLA evaluation of the same system, on whatever
               backend is active: on CPU the kernel runs in interpret
               mode, on TPU compiled — running this script on both
               backends covers interpret-vs-compiled.

Energies are compared within --tolerance (default 0.06 kcal/mol, scaled
up for |U| > 25 kcal/mol where f32 representation alone exceeds the
absolute tolerance); forces within a relative tolerance. Failures are
serialized to --failure-dir as JSON + NPZ repro files.

CI-mode (CPU, small systems): tests/test_platform_sweep.py runs this
module's sweep over a fast subset. Hardware pass: run the module on the
TPU-attached interpreter with no arguments.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ENERGY_TOLERANCE_KJ = 0.06 * 4.184  # reference: 0.06 kcal/mol
FORCE_RTOL = 5e-3

# systems needing constructor args or external data files are reported
# as skipped explicitly (parity with the reference, which constructs all)
_SLOW = {"DHFRExplicit", "DNADodecamerExplicit", "LysozymeImplicit",
         "HostGuestExplicit", "GiantWaterBox", "GiantFlexibleWaterBox",
         "GiantFlexibleDischargedWaterBox"}


def _evaluate(system, x64, backend, positions):
    """(U, F) of `system` at `positions` on `backend` in f32/f64."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices(backend)[0]
    dtype = jnp.float64 if x64 else jnp.float32

    def u_fn(x):
        return system.energy(x, system.default_box)

    x = jax.device_put(jnp.asarray(np.asarray(positions), dtype), dev)
    u, g = jax.jit(jax.value_and_grad(u_fn))(x)
    return float(u), np.asarray(jax.device_get(-g))


def _kernel_check(ts, tolerance):
    """Compare the integrator's kernel force path (sweep/fused) against the
    dense XLA evaluation. Returns (status, detail)."""
    import jax
    import numpy as np

    from openmmtools_tpu.integrators import BAOABIntegrator

    integ = BAOABIntegrator(temperature=300.0, collision_rate=1.0,
                            timestep=0.002)
    bound = integ.bind(ts.system)
    mode = ("fused" if bound._fused is not None
            else "sweep" if bound.sweep_mode else None)
    if mode is None:
        return "n/a", ""
    ss = ts.sampler_state()
    state = bound.initial_state(ss, jax.random.PRNGKey(0), temperature=300.0)
    if mode == "fused":
        # run 0 steps: the kernel evaluates U/F of the input configuration
        out = bound.run(state, 0)
        u_k = float(sum(np.asarray(p) for p in out.potentials))
    else:
        u_k = float(sum(np.asarray(p) for p in state.potentials))
    u_ref = float(ts.system.energy(ss.positions, ts.system.default_box))
    du = abs(u_k - u_ref)
    ok = du <= tolerance * max(1.0, abs(u_ref) / 100.0)
    return ("ok" if ok else "FAIL",
            f"{mode}: U_kernel={u_k:.4f} U_dense={u_ref:.4f} "
            f"|dU|={du:.2e}")


def run_sweep(names=None, tolerance=ENERGY_TOLERANCE_KJ, include_slow=False,
              failure_dir="platform-failures", check_kernels=True,
              verbose=True):
    import jax
    import numpy as np

    import openmmtools_tpu.models as models
    from openmmtools_tpu.models import get_available_testsystems

    backends = ["cpu"]
    if jax.default_backend() == "tpu":
        backends.append("tpu")

    names = names or get_available_testsystems()
    failures, results = [], []
    for name in names:
        if not include_slow and name in _SLOW:
            if verbose:
                print(f"  - {name}: skipped (slow; --include-slow)")
            continue
        cls = getattr(models, name, None) or getattr(
            models.testsystems, name, None)
        if cls is None:
            if verbose:
                print(f"  ? unknown system {name}")
            continue
        try:
            ts = cls()
        except TypeError:
            if verbose:
                print(f"  - {name}: skipped (constructor needs arguments)")
            continue
        except Exception as e:  # missing data files etc.
            if verbose:
                print(f"  - {name}: skipped ({type(e).__name__}: "
                      f"{str(e)[:80]})")
            continue
        ss = ts.sampler_state()
        row = {"system": name, "checks": {}}
        try:
            with jax.enable_x64(True):
                u_ref, f_ref = _evaluate(ts.system, True, "cpu",
                                         ss.positions)
        except Exception as e:
            row["checks"]["cpu/f64"] = f"ERROR {type(e).__name__}: {e}"
            failures.append((name, "cpu/f64", row))
            if verbose:
                print(f"  ! {name}: cpu/f64 ERROR {str(e)[:120]}")
            continue
        fscale = max(np.abs(f_ref).max(), 1.0)
        # |U| in f32 carries ~|U|*1e-7 representation error; keep the
        # reference's absolute tolerance until it would be unattainable
        tol = tolerance * max(1.0, abs(u_ref) * 1e-5 / tolerance)
        ok_all = True
        for backend in backends:
            key = f"{backend}/f32"
            try:
                u, f = _evaluate(ts.system, False, backend, ss.positions)
            except Exception as e:
                row["checks"][key] = f"ERROR {type(e).__name__}: {e}"
                ok_all = False
                failures.append((name, key, row))
                continue
            du = abs(u - u_ref)
            df = np.abs(f - f_ref).max() / fscale
            ok = du <= tol and df <= FORCE_RTOL
            row["checks"][key] = {
                "U": u, "U_ref": u_ref, "dU_kJ": du, "dF_rel": float(df),
                "ok": bool(ok)}
            if not ok:
                ok_all = False
                failures.append((name, key, row))
        if check_kernels:
            try:
                status, detail = _kernel_check(ts, tolerance)
            except Exception as e:
                status, detail = "FAIL", f"ERROR {type(e).__name__}: {e}"
            row["checks"]["kernel"] = f"{status} {detail}"
            if status == "FAIL":
                ok_all = False
                failures.append((name, "kernel", row))
        results.append(row)
        if verbose:
            mark = "ok  " if ok_all else "FAIL"
            parts = []
            for key in row["checks"]:
                v = row["checks"][key]
                if isinstance(v, dict):
                    parts.append(f"{key}: dU={v['dU_kJ']:.2e} "
                                 f"dF={v['dF_rel']:.1e}")
                elif key == "kernel":
                    parts.append(f"kernel: {v.split()[0]}")
            print(f"  {mark} {name}: U={u_ref:.3f}  " + "; ".join(parts))

    if failures:
        fdir = Path(failure_dir)
        fdir.mkdir(exist_ok=True)
        for name, key, row in failures:
            stem = f"{name}-{key.replace('/', '-')}"
            (fdir / f"{stem}.json").write_text(
                json.dumps(row, indent=2, default=str))
            try:
                cls = getattr(models, name, None) or getattr(
                    models.testsystems, name)
                np.savez(fdir / f"{stem}.npz",
                         positions=np.asarray(cls().sampler_state()
                                              .positions))
            except Exception:
                pass
        if verbose:
            print(f"{len(failures)} failing checks; repro files in "
                  f"{fdir}/")
    elif verbose:
        print(f"all {len(results)} systems consistent across "
              f"{backends} f32 vs cpu/f64 (tol {tolerance:.3f} kJ/mol)"
              + (" + kernel paths" if check_kernels else ""))
    return results, failures


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--systems", nargs="*", default=None)
    parser.add_argument("--tolerance", type=float,
                        default=ENERGY_TOLERANCE_KJ)
    parser.add_argument("--include-slow", action="store_true")
    parser.add_argument("--no-kernels", action="store_true")
    parser.add_argument("--failure-dir", default="platform-failures")
    args = parser.parse_args(argv)
    t0 = time.time()
    _, failures = run_sweep(
        names=args.systems, tolerance=args.tolerance,
        include_slow=args.include_slow, failure_dir=args.failure_dir,
        check_kernels=not args.no_kernels)
    print(f"sweep finished in {time.time() - t0:.0f} s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
