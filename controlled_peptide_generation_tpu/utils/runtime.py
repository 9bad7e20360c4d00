"""Process-level runtime setup shared by all CLIs.

Enables JAX's persistent compilation cache: in this environment TPU
compilation goes through a remote service with minutes-level latency for
medium programs (measured: the GMM-EM fit compiles in 2.5s on CPU but took
~13 min remotely), so caching compiled executables across processes is the
single biggest UX/perf win for repeated runs.
"""

import logging
import os
import threading
import time

log = logging.getLogger(__name__)

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
            import numpy as np
            import jax.numpy as jnp
            t0 = time.perf_counter()
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
        if jax.default_backend() == "cpu":
            return
        _WARMUP_THREAD = threading.Thread(
            target=_pay, name="cpg-first-d2h-warmup", daemon=True)
        _WARMUP_THREAD.start()
    except Exception as e:  # pragma: no cover
        log.info("first-transfer warmup not started: %s", e)


def wait_first_transfer():
    """Block until the first-D2H warmup completes (no-op if not started).

    Call this immediately before a timed region so the per-process
    transfer tax can never land inside a measurement. Returns the stall
    duration in seconds (None if unknown/not applicable).
    """
    if _WARMUP_THREAD is not None:
        _WARMUP_THREAD.join()
    return _WARMUP_SECONDS
