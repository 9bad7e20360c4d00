"""Process-level runtime setup shared by all CLIs.

Enables JAX's persistent compilation cache: in this environment TPU
compilation goes through a remote service with minutes-level latency for
medium programs (measured: the GMM-EM fit compiles in 2.5s on CPU but took
~13 min remotely), so caching compiled executables across processes is the
single biggest UX/perf win for repeated runs.
"""

import atexit
import logging
import os
import sys
import threading
import time

log = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# Phase tracking + heartbeat.
#
# The tunneled TPU backend has a documented failure mode where the first
# device->host transfer of a process wedges for minutes (measured 67-412s,
# and in degraded phases indefinitely — tools/repro_first_d2h.py). A process
# stuck inside a blocking JAX call prints nothing, so an outside observer
# (or a driver with a 30-min budget) sees only a silent tail and cannot
# tell WHERE it is stuck. BENCH_r04.json rc=124 was exactly this.
#
# Every CLI therefore (a) stamps what it is currently waiting on with
# set_phase(), and (b) runs a daemon heartbeat thread that, whenever the
# current phase has been active longer than the heartbeat interval, prints
# `waiting: <phase> <elapsed>s` to stderr. A killed run's tail then names
# the stuck phase. The heartbeat costs nothing while phases progress
# normally (fast phases never print).
# ---------------------------------------------------------------------------

_PHASE_LOCK = threading.Lock()
_PHASE = {"name": "startup", "since": time.monotonic()}
_HEARTBEAT_THREAD = None


def set_phase(name):
    """Mark the process's current phase (for the heartbeat/diagnostics)."""
    with _PHASE_LOCK:
        _PHASE["name"] = name
        _PHASE["since"] = time.monotonic()


def current_phase():
    """(phase_name, seconds_in_phase)."""
    with _PHASE_LOCK:
        return _PHASE["name"], time.monotonic() - _PHASE["since"]


def start_heartbeat(interval=None):
    """Start the daemon heartbeat (idempotent). Prints to stderr whenever
    the current phase has been active for more than `interval` seconds
    (default 30, or CPG_HEARTBEAT_S), so a wedged process always has a
    diagnostic tail naming the stuck phase."""
    global _HEARTBEAT_THREAD
    if _HEARTBEAT_THREAD is not None:
        return
    if interval is None:
        interval = float(os.environ.get("CPG_HEARTBEAT_S", "30"))

    def _beat():
        while True:
            time.sleep(interval)
            name, elapsed = current_phase()
            if elapsed >= interval:
                print(f"waiting: {name} {elapsed:.0f}s", file=sys.stderr,
                      flush=True)

    _HEARTBEAT_THREAD = threading.Thread(
        target=_beat, name="cpg-heartbeat", daemon=True)
    _HEARTBEAT_THREAD.start()

DEFAULT_CACHE_DIR = os.environ.get(
    "CPG_COMPILATION_CACHE", os.path.expanduser("~/.cache/cpg_tpu_xla"))


def setup(cache_dir=None):
    """Idempotent; call early in every CLI entry point."""
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    try:
        # CPU-only processes skip the cache: XLA:CPU serializes
        # AOT-compiled executables keyed to the COMPILE machine's CPU
        # features, and this containerized environment migrates across
        # hosts — loading a mismatched entry can SIGILL (observed as a
        # hard interpreter crash in CPU pytest runs). CPU compiles are
        # seconds anyway; the cache's whole value is the minutes-level
        # remote TPU compile service.
        if jax.default_backend() == "cpu":
            if os.environ.get("CPG_SELFTEST_WEDGE_D2H"):
                warmup_first_transfer()  # test hook: exercise the wait
            return
        if jax.config.jax_compilation_cache_dir is None:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
            log.info("persistent XLA compilation cache: %s", cache_dir)
    except Exception as e:  # never block a run on cache setup
        log.warning("compilation cache unavailable: %s", e)
    warmup_first_transfer()


_WARMUP_THREAD = None
_WARMUP_SECONDS = None


def warmup_first_transfer():
    """Start the process's first device->host transfer on a daemon thread.

    On the tunneled TPU backend the FIRST D2H transfer of a process stalls
    for minutes in degraded tunnel phases (measured 67-412s; size- and
    op-independent; every process pays it exactly once; see
    tools/repro_first_d2h.py). The stall also blocks concurrent device
    work, so starting it early only overlaps the HOST-side prefix of a run
    (imports, dataset load/generation, checkpoint read) — but it
    guarantees the tax is paid before any timed region or user-visible
    stage, where it would otherwise masquerade as a slow fit/eval (it
    surfaced as a "412s evaluate_nll" in a campaign stage timer).

    Idempotent; no-op on CPU (no tunnel). Never raises.
    """
    global _WARMUP_THREAD
    if _WARMUP_THREAD is not None:
        return

    def _pay():
        global _WARMUP_SECONDS
        try:
            t0 = time.perf_counter()
            if os.environ.get("CPG_SELFTEST_WEDGE_D2H"):
                # test hook: simulate a wedged tunnel (the documented
                # degraded phase where the first D2H never returns) so the
                # bounded-wait/heartbeat/deadline machinery is testable
                # without real hardware (tests/test_bench_degraded.py)
                time.sleep(10 ** 6)
            import numpy as np
            import jax.numpy as jnp
            np.asarray(jnp.zeros((1,), jnp.float32))
            _WARMUP_SECONDS = time.perf_counter() - t0
            lvl = logging.WARNING if _WARMUP_SECONDS > 10 else logging.INFO
            log.log(lvl, "first device->host transfer took %.1fs "
                    "(per-process tunnel setup; paid once, in background)",
                    _WARMUP_SECONDS)
        except Exception as e:  # pragma: no cover - never block a run
            log.info("first-transfer warmup skipped: %s", e)

    try:
        import jax
        if (jax.default_backend() == "cpu"
                and not os.environ.get("CPG_SELFTEST_WEDGE_D2H")):
            return
        _WARMUP_THREAD = threading.Thread(
            target=_pay, name="cpg-first-d2h-warmup", daemon=True)
        _WARMUP_THREAD.start()
        atexit.register(_drain_warmup_at_exit)
    except Exception as e:  # pragma: no cover
        log.info("first-transfer warmup not started: %s", e)


def _drain_warmup_at_exit(join_s=5.0):
    """Short-lived CLIs (api.py self-test) can reach interpreter exit
    while the warmup D2H is still in flight; CPython then kills the
    daemon thread abruptly and the tunnel transport's C++ teardown
    prints 'terminate called ... FATAL: exception not rethrown' (exit
    code unaffected — observed rc=0). Briefly join to cover
    nearly-complete transfers, then name the noise so a log tail reads
    as diagnosis, not a crash. The join is bounded: a wedged tunnel
    (13-540s+ band) must not hold the process exit hostage."""
    t = _WARMUP_THREAD
    if t is None or not t.is_alive():
        return
    t.join(join_s)
    if t.is_alive():
        print("note: exiting while the background first-D2H warmup is "
              "still in flight — any 'terminate called' transport "
              "teardown noise below is harmless (exit code unaffected; "
              "tools/repro_first_d2h.py)", file=sys.stderr, flush=True)


def wait_first_transfer(timeout=None, poll=30.0):
    """Wait (boundedly) for the first-D2H warmup (no-op if not started).

    Call this immediately before a timed region so the per-process
    transfer tax can never land inside a measurement. The wait is chunked:
    every `poll` seconds a `waiting: first-D2H ...` line goes to stderr so
    a wedged tunnel produces a diagnostic tail instead of silence, and
    `timeout` (seconds, None = unbounded) caps the total wait — on expiry
    the warmup is abandoned (the daemon thread keeps waiting in the
    background) and the caller proceeds, accepting that the stall may land
    in its next device interaction. Returns the stall duration in seconds
    (None if unknown, not applicable, or timed out).
    """
    if _WARMUP_THREAD is None:
        return _WARMUP_SECONDS
    set_phase("first-D2H warmup")
    t0 = time.monotonic()
    while _WARMUP_THREAD.is_alive():
        waited = time.monotonic() - t0
        if timeout is not None and waited >= timeout:
            print(f"waiting: first-D2H gave up after {waited:.0f}s "
                  "(tunnel wedged? see tools/repro_first_d2h.py); "
                  "proceeding without warmup", file=sys.stderr, flush=True)
            return None
        step = poll if timeout is None else min(poll, timeout - waited)
        _WARMUP_THREAD.join(step)
        if _WARMUP_THREAD.is_alive():
            print(f"waiting: first-D2H {time.monotonic() - t0:.0f}s "
                  "(known per-process tunnel stall, 67-412s band; "
                  "tools/repro_first_d2h.py)", file=sys.stderr, flush=True)
    return _WARMUP_SECONDS
