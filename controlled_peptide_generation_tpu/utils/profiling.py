"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference's only instrumentation is /usr/bin/time around whole scripts
(run.sh:14-15). Here: jax.profiler traces around the hot loops (viewable in
TensorBoard / Perfetto) plus lightweight throughput counters that feed the
metric logger.
"""

import contextlib
import logging
import time

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """jax.profiler trace around a block; no-op when disabled/unavailable."""
    if not enabled or not logdir:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(logdir)
        log.info("jax.profiler trace -> %s", logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    except Exception as e:  # profiling must never take down a run
        log.warning("profiler unavailable: %s", e)
        yield


class Throughput:
    """Windowed items/sec counter; optionally mirrored into the logger."""

    def __init__(self, name, logger=None, log_every=100):
        self.name = name
        self.logger = logger
        self.log_every = log_every
        self.t0 = time.perf_counter()
        self.count = 0
        self.total = 0

    def add(self, n=1, step=None):
        self.count += n
        self.total += n
        if self.log_every and self.count >= self.log_every:
            rate = self.rate()
            if self.logger is not None and step is not None:
                self.logger.log_value(self.name + "_per_sec", rate, step)
            self.reset()
            return rate
        return None

    def rate(self):
        dt = time.perf_counter() - self.t0
        return self.count / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.perf_counter()
        self.count = 0


@contextlib.contextmanager
def annotate(name):
    """Named region in profiler traces (jax TraceAnnotation)."""
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
