"""Process-level runtime setup shared by all CLIs.

Enables JAX's persistent compilation cache: in this environment TPU
compilation goes through a remote service with minutes-level latency for
medium programs (measured: the GMM-EM fit compiles in 2.5s on CPU but took
~13 min remotely), so caching compiled executables across processes is the
single biggest UX/perf win for repeated runs.
"""

import logging
import os

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
