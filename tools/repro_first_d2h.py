#!/usr/bin/env python
"""Repro: the FIRST device->host transfer of a process stalls for minutes
on the tunneled TPU backend (axon PJRT plugin) in degraded tunnel phases.

Measured on this toolchain (2026-08-19): 67s / 221s / 389s / 412s across
four fresh processes — size-independent (a (1,) float32 pays the same as
a (2212,) array), op-independent (np.asarray, float(x.sum()), .item()
all stall identically), and paid exactly once per process; every
subsequent D2H is sub-millisecond. While the first D2H is pending, OTHER
device work is blocked too (a concurrent main-thread compute waits for
it), so it cannot be hidden behind compiles — only behind host-side work
(imports, dataset generation, checkpoint reads).

Why it matters: the stall surfaced as a "412s evaluate_nll" inside the
campaign's Q-fit stage timer — a phantom algorithmic bottleneck. The
framework now pays it eagerly on a daemon thread at CLI startup
(utils/runtime.py:warmup_first_transfer) and bench.py joins that thread
before every timed region (runtime.wait_first_transfer).

The transfer path lives in the compiled PJRT plugin (libaxon_pjrt.so) —
no Python-visible knob changes it. Healthy tunnel phases pay <1s, so
this script's output is phase-dependent; run it when diagnosing a
mysteriously slow first readback.

Usage:  timeout 600 python tools/repro_first_d2h.py
"""
import time

t0 = time.perf_counter()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
      flush=True)

# Device compute is NOT stalled: compile + execute + block completes fast.
x = jnp.arange(4096, dtype=jnp.float32)
y = jax.block_until_ready(x * 2 + 1)
print(f"[{time.perf_counter()-t0:6.1f}s] device compute ready "
      "(block_until_ready is not a D2H)", flush=True)

# The first D2H is the stall — a single float32 scalar.
t = time.perf_counter()
v = float(y[0])
print(f"[{time.perf_counter()-t0:6.1f}s] FIRST D2H (1 scalar): "
      f"{time.perf_counter()-t:.1f}s  (healthy tunnel: <1s; degraded: "
      "67-412s measured)", flush=True)

# Every later D2H, any size, is instant.
t = time.perf_counter()
arr = np.asarray(jax.block_until_ready(jnp.zeros((1 << 20,), jnp.float32)))
print(f"[{time.perf_counter()-t0:6.1f}s] second D2H (4 MB): "
      f"{time.perf_counter()-t:.3f}s", flush=True)
