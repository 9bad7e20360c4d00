"""bench.py must be un-hangable: under a wedged tunnel (the documented
first-D2H stall, tools/repro_first_d2h.py) or any phase that blocks
forever, the harness must still (a) print heartbeat lines naming the stuck
phase to stderr and (b) emit ONE parseable final JSON line before the
driver's budget expires, flagged degraded with per-phase status.

Round 4's official capture (BENCH_r04.json) was rc=124 with a three-line
silent tail precisely because none of this existed; these tests simulate
the hazard end-to-end in a subprocess (the deadline reaper uses os._exit).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env, timeout=240):
    env = dict(os.environ)
    env.pop("CPG_TEST_PLATFORM", None)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "bench.py", "--platform", "cpu", "--fast"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


def _final_json(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing to stdout"
    return json.loads(lines[-1])


@pytest.mark.quick
def test_wedged_phase_emits_degraded_json():
    """A phase that blocks forever -> deadline reaper emits a parseable
    degraded JSON naming the stuck phase, exit code 0, heartbeats on
    stderr."""
    # generous deadline: the phases BEFORE the wedge (jax init, device
    # discovery) must complete inside it even on a heavily loaded CPU —
    # at 6 s this flaked under full-suite machine load
    res = _run_bench({
        "CPG_BENCH_DEADLINE_S": "25",
        "CPG_HEARTBEAT_S": "2",
        "CPG_BENCH_SELFTEST_WEDGE": "build model",
    })
    assert res.returncode == 0, res.stderr[-2000:]
    payload = _final_json(res.stdout)
    assert payload["degraded"] is True
    assert payload["stuck_phase"].startswith("build model")
    assert "metric" in payload and "value" in payload
    assert "vs_baseline" in payload and "unit" in payload
    assert payload["phases"]["build model"] == "running"
    # earlier phases completed
    assert payload["phases"]["runtime.setup"] == "ok"
    # the heartbeat named the stuck phase in the stderr tail
    assert "waiting: build model" in res.stderr


def test_wedged_first_d2h_is_bounded_and_diagnosed():
    """Simulated never-returning first D2H (the real round-4 hazard):
    the bounded wait gives up with a diagnostic instead of blocking
    forever, the run proceeds, and a later wedge still yields the
    degraded JSON."""
    # deadline must cover: jax init + model build (slow under load) +
    # the bounded D2H wait (0.4x deadline) with margin left to reach
    # the wedged bench phase
    res = _run_bench({
        "CPG_BENCH_DEADLINE_S": "60",
        "CPG_HEARTBEAT_S": "2",
        "CPG_SELFTEST_WEDGE_D2H": "1",
        "CPG_BENCH_SELFTEST_WEDGE": "bench_class decode-all",
    })
    assert res.returncode == 0, res.stderr[-2000:]
    # the bounded wait (0.4 * deadline = 24s) expired and said so
    assert "first-D2H gave up" in res.stderr
    payload = _final_json(res.stdout)
    assert payload["degraded"] is True
    assert payload["stuck_phase"].startswith("bench_class decode-all")
    assert payload["phases"]["first-D2H warmup"] == (
        "timed out/not applicable")
