"""Driver benchmark: BAOAB MD throughput on the 2k-particle LJ fluid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 1M BAOAB steps/s per chip on this config
(BASELINE.json; the reference publishes no absolute numbers, BASELINE.md).

Runs on whatever the default JAX platform is (the TPU chip under the
driver); measures steady-state steps/s of the fused jitted BAOAB+LJ step
program, excluding compile time.

Robustness (VERDICT r3 next-round item 1): TestSystem construction is
pure-host (no device buffers, models/testsystems.py), and the device phase
is wrapped in a bounded retry — the TPU relay throws transient
UNAVAILABLE / FAILED_PRECONDITION errors during flaky windows (CLAUDE.md
rule 9); round 3's official bench crashed on exactly one such fetch.
"""
import json
import sys
import time
import traceback

# transient relay / backend error markers worth retrying (gRPC-style codes
# surfaced through jax.errors.JaxRuntimeError message text)
_TRANSIENT = ("UNAVAILABLE", "FAILED_PRECONDITION", "DEADLINE_EXCEEDED",
              "INTERNAL", "ABORTED", "connection", "Connection", "socket")

MAX_ATTEMPTS = 3
BACKOFF_S = 20.0


def measure():
    import jax

    from openmmtools_tpu.integrators import BAOABIntegrator
    from openmmtools_tpu.models import LennardJonesFluid

    n_particles = 2048
    fluid = LennardJonesFluid(nparticles=n_particles)  # pure-host
    integ = BAOABIntegrator(temperature=120.0, collision_rate=1.0,
                            timestep=0.002)
    bound = integ.bind(fluid.system)
    state = bound.initial_state(fluid.sampler_state(), jax.random.PRNGKey(0),
                                temperature=120.0)

    # large chunks amortize the ~33 ms host->TPU dispatch latency of the
    # relay (measured round 3: fixed cost is constant in chunk size, so
    # 50k steps/call cuts it from 3.3 to 0.7 us/step); the fused kernel
    # integrates the whole chunk in one program
    chunk = 50000
    # warm-up/compile
    state = jax.block_until_ready(bound.run(state, chunk))

    import numpy as np

    n_steps = 0
    chunk_times = []
    t0 = time.perf_counter()
    while True:
        tc = time.perf_counter()
        state = jax.block_until_ready(bound.run(state, chunk))
        chunk_times.append(time.perf_counter() - tc)
        n_steps += chunk
        if (time.perf_counter() - t0) > 10.0 or n_steps >= 2_000_000:
            break
    # End the timed window with a REAL host fetch: it must ride the whole
    # device stream, so even if the relay's block_until_ready returns
    # prematurely (observed once: 40 chunks "completed" in 31 ms, a 1000x
    # phantom rate), the fetch blocks until every queued chunk has actually
    # executed. Costs one relay round-trip (~30 ms) against a ~10 s window.
    positions = jax.device_get(state.positions)
    total = time.perf_counter() - t0

    if sum(chunk_times) < 0.5 * total:
        # phantom per-chunk syncs: only the aggregate (fetch-verified) wall
        # time is trustworthy
        steps_per_sec = n_steps / total
    else:
        # steady-state rate: median chunk time is robust to transient relay
        # stalls (run-to-run aggregate spread observed at +-10%)
        steps_per_sec = chunk / sorted(chunk_times)[len(chunk_times) // 2]

    if not bool(np.isfinite(positions).all()):
        steps_per_sec = 0.0
    return steps_per_sec


def main():
    last_err = None
    for attempt in range(1, MAX_ATTEMPTS + 1):
        try:
            steps_per_sec = measure()
            break
        except Exception as err:  # noqa: BLE001 — classify then re-raise
            msg = f"{type(err).__name__}: {err}"
            transient = any(tok in msg for tok in _TRANSIENT)
            print(f"bench attempt {attempt}/{MAX_ATTEMPTS} failed "
                  f"({'transient' if transient else 'permanent'}): "
                  f"{msg[:300]}", file=sys.stderr)
            if not transient or attempt == MAX_ATTEMPTS:
                traceback.print_exc(file=sys.stderr)
                raise
            last_err = err
            time.sleep(BACKOFF_S * attempt)
    else:  # pragma: no cover — loop always breaks or raises
        raise last_err

    print(json.dumps({
        "metric": "baoab_steps_per_sec_lj2048",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 1.0e6, 4),
    }))


if __name__ == "__main__":
    main()
