"""utils/runtime: process-level setup helpers.

The first-D2H warmup exists because the tunneled TPU backend stalls a
process's first device->host transfer for minutes in degraded tunnel
phases (tools/repro_first_d2h.py). On CPU there is no tunnel, so setup()
must stay a no-op (no cache dir, no warmup thread) and
wait_first_transfer() must be callable and cheap — these tests pin that
contract so CLI startup on CPU never grows device-touching side effects.
"""

import pytest

from controlled_peptide_generation_tpu.utils import runtime

pytestmark = pytest.mark.quick


def test_setup_is_cpu_noop_and_idempotent():
    import jax
    assert jax.default_backend() == "cpu"
    runtime.setup()
    runtime.setup()  # idempotent
    # CPU processes skip the persistent compile cache (see setup docstring)
    assert jax.config.jax_compilation_cache_dir is None
    # and never start the first-D2H warmup thread (no tunnel to warm)
    assert runtime._WARMUP_THREAD is None


def test_wait_first_transfer_without_warmup():
    # callable before/without warmup: returns None, does not block
    assert runtime.wait_first_transfer() is None


def test_warmup_explicit_call_is_cpu_noop():
    runtime.warmup_first_transfer()
    assert runtime._WARMUP_THREAD is None
    assert runtime.wait_first_transfer() is None


def test_drain_warmup_at_exit(monkeypatch, capsys):
    """The atexit drain: no-op when idle, brief join + named-noise note
    when the warmup D2H is still in flight at interpreter exit."""
    import threading
    import time

    runtime._drain_warmup_at_exit()          # no thread: no-op
    assert capsys.readouterr().err == ""

    done = threading.Event()
    t = threading.Thread(target=done.wait, daemon=True)
    t.start()
    monkeypatch.setattr(runtime, "_WARMUP_THREAD", t)
    try:
        runtime._drain_warmup_at_exit(join_s=0.05)   # still alive: note
        assert "first-D2H warmup" in capsys.readouterr().err
        done.set()
        t.join(5)
        runtime._drain_warmup_at_exit()              # finished: silent
        assert capsys.readouterr().err == ""
    finally:
        done.set()
