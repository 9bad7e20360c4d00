#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): CLaSS accepted samples/sec — the full
phase-2 loop at reference workload shapes (rounds of 5000 latents, mogQ with
100 diag components in z_dim=100, two attribute classifiers, beam-5 decode,
until >=100 accepted), in the production accepted-only decode mode
(hw.decode_mode="accepted"; the reference-semantics decode-every-candidate
rate is recorded alongside in BENCH_DETAILS.json). The CPU baseline is
measured in the same mode, so vs_baseline is like-for-like.

Also measured (printed to stderr, recorded in BENCH_DETAILS.json):
  - WAE train steps/sec at batch 32 (phase-1 loop, reference cfg),
  - beam-decode sequences/sec (1024 x beam 5).

Baselines (two, both machine-generated — see BASELINE.md):
  - reference-style: the reference's own per-sentence-beam algorithmic
    shape on this host's CPU (tools/refstyle_baseline.py). This is the
    denominator of the printed vs_baseline, matching the ">=50x vs the
    reference CPU baseline" target (the reference's torch-0.3 stack is
    not installable here; the harness is deliberately optimistic toward
    the reference, so the ratio is conservative).
  - our-CPU: this framework driven by this script with --platform cpu in
    the same decode mode — a far stricter self-imposed bar, recorded in
    BENCH_DETAILS.json as vs_our_cpu_same_mode.
"""

import argparse
import json
import logging
import os
import re
import sys
import threading
import time

logging.basicConfig(level=logging.WARNING)

# ---------------------------------------------------------------------------
# Degraded-mode protection. The tunneled backend's first D2H transfer can
# wedge indefinitely (measured 67-412s, sometimes >10min —
# tools/repro_first_d2h.py); round 4's official capture died rc=124 with a
# silent tail because this harness had no heartbeat and no deadline. Three
# defenses, all active by default:
#   1. phase stamping + a stderr heartbeat (utils/runtime.py): any killed
#      run's tail names the stuck phase ("waiting: bench_class compile 120s");
#   2. the first-D2H wait is BOUNDED (wait_first_transfer(timeout=...));
#   3. a total deadline (CPG_BENCH_DEADLINE_S, default 1500s — safely under
#      the driver's 30-min budget) after which a reaper thread emits the
#      final JSON line from whatever phases completed, flagged
#      "degraded": true with per-phase status, and exits 0 — the driver
#      parses a record instead of recording rc=124.
# Regression-tested against a simulated wedged transfer in
# tests/test_bench_degraded.py.
# ---------------------------------------------------------------------------

DEADLINE_S = float(os.environ.get("CPG_BENCH_DEADLINE_S", "1500"))

_STATE_LOCK = threading.Lock()
_STATE = {"done": False, "phases": {}, "result": None}


_LAST_PHASE = [None]


def phase(name):
    """Stamp the current phase (heartbeat + degraded-JSON diagnostics).
    Entering a new phase marks the previous one ok unless phase_done()
    recorded a specific note for it."""
    from controlled_peptide_generation_tpu.utils import runtime
    runtime.set_phase(name)
    with _STATE_LOCK:
        prev = _LAST_PHASE[0]
        if prev is not None and _STATE["phases"].get(prev) == "running":
            _STATE["phases"][prev] = "ok"
        _STATE["phases"][name] = "running"
        _LAST_PHASE[0] = name
    if os.environ.get("CPG_BENCH_SELFTEST_WEDGE") == name:
        time.sleep(10 ** 6)  # test hook: simulate a wedge in this phase


def phase_done(name, note="ok"):
    with _STATE_LOCK:
        _STATE["phases"][name] = note


def set_partial_result(payload):
    """Record the best-so-far final JSON; the deadline reaper emits it
    (plus degraded/diagnostic fields) if a later phase wedges."""
    with _STATE_LOCK:
        _STATE["result"] = dict(payload)


def finish(payload):
    """Normal completion: print the one-line JSON and mark done."""
    with _STATE_LOCK:
        _STATE["done"] = True
    print(json.dumps(payload), flush=True)


def start_deadline(deadline_s=DEADLINE_S):
    from controlled_peptide_generation_tpu.utils import runtime

    def _reap():
        time.sleep(deadline_s)
        with _STATE_LOCK:
            if _STATE["done"]:
                return
            payload = dict(_STATE["result"] or {
                "metric": "CLaSS accepted samples/sec", "value": None,
                "unit": "accepted samples/sec", "vs_baseline": None})
            payload["phases"] = dict(_STATE["phases"])
        name, elapsed = runtime.current_phase()
        payload["degraded"] = True
        payload["stuck_phase"] = f"{name} ({elapsed:.0f}s)"
        log(f"DEADLINE: {deadline_s:.0f}s budget expired while in phase "
            f"{name!r} ({elapsed:.0f}s); emitting partial results")
        print(json.dumps(payload), flush=True)
        sys.stderr.flush()
        os._exit(0)  # main thread may be wedged in a blocking C call

    threading.Thread(target=_reap, name="bench-deadline",
                     daemon=True).start()

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "CPU_BASELINE.json")

# fallback when CPU_BASELINE.json is absent: measured via
# `python bench.py --write-baseline` on this host (1-core CPU, see
# BASELINE.md). Conservative stand-ins for the reference: this is OUR
# vectorized implementation on CPU, which is itself much faster than the
# reference's per-sentence python beam loop. The class baseline is
# like-for-like with the headline protocol (batched rounds; fp32 decode —
# the CPU's best configuration, bf16 would be emulated and unfairly slow).
CPU_BASELINE = {
    "class_accepted_samples_per_sec": 324.0,
    "wae_train_steps_per_sec": 47.9,
    "beam_decode_seqs_per_sec": 2702.0,
}


def load_baseline():
    """Baseline numbers for vs_baseline: the machine-generated file when
    present (`bench.py --write-baseline` regenerates it on this container's
    CPU), the recorded constants otherwise."""
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            data = json.load(fh)
        log(f"baseline: {BASELINE_FILE} "
            f"(measured {data.get('measured_at', '?')})")
        return data["metrics"]
    log("baseline: built-in constants (run --write-baseline to regenerate)")
    return CPU_BASELINE


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_refstyle():
    """The reference-style CPU baseline (accepted samples/sec) measured by
    tools/refstyle_baseline.py --update-baseline, or None if absent."""
    if not os.path.exists(BASELINE_FILE):
        return None
    with open(BASELINE_FILE) as fh:
        data = json.load(fh)
    val = data.get("refstyle", {}).get(
        "refstyle_class_accepted_samples_per_sec")
    return float(val) if val else None


def build(seed=0):
    import jax
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.models import build_model

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    model = build_model(cfg.model, n_vocab=26, max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(seed))
    return cfg, model, params


def bench_train(cfg, model, params, n_steps=100, batch_size=32):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu.ops import losses as L
    from controlled_peptide_generation_tpu.train.train_vae import (
        make_train_scan)

    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    unroll = 50   # production default (config.hw.unroll)
    chunk_step, opt = make_train_scan(model, cfg.vae, cfg.losses, rf,
                                      unroll, donate=True)
    # donated buffers: work on a private copy so callers keep their params
    params = jax.tree.map(jnp.copy, params)
    opt_state = opt.init(params)

    # pre-draw a pool of batch chunks; the loop still pays a fresh H2D
    # transfer per dispatch (host feed included in the measurement)
    rng = jax.random.PRNGKey(2)
    pool = jax.random.randint(
        rng, (4, unroll, batch_size, model.max_seq_len), 4, model.n_vocab,
        jnp.int32)
    pool = pool.at[..., 0].set(2)
    pool = pool.at[..., 12].set(3)
    pool_np = np.asarray(pool)

    p, o = params, opt_state
    p, o, m = chunk_step(p, o, rng, jnp.asarray(pool_np[0]),
                         jnp.asarray(0, jnp.int32))   # compile
    jax.block_until_ready(p)
    # SUSTAINED wall rate: time enough chunks that the first dispatch's
    # tunnel RTT amortizes away. The round-4 recorded 1,191 steps/s was
    # an artifact of timing TWO 50-step chunks (one ~30 ms RTT against
    # ~20 ms of device work); chained async dispatches pipeline to the
    # device rate — 5,271 wall steps/s measured at the same shape
    # (BENCH.md "the train-step wall gap was the measurement").
    n_chunks = max(n_steps // unroll, 1)
    t0 = time.perf_counter()
    p, o, m = chunk_step(p, o, rng, jnp.asarray(pool_np[0]),
                         jnp.asarray(0, jnp.int32))
    jax.block_until_ready(p)
    per_chunk = time.perf_counter() - t0
    n_chunks = max(n_chunks, min(200, int(2.0 / max(per_chunk, 1e-4))))
    t0 = time.perf_counter()
    for i in range(n_chunks):
        p, o, m = chunk_step(p, o, rng, jnp.asarray(pool_np[i % 4]),
                             jnp.asarray(i * unroll, jnp.int32))
    jax.block_until_ready(p)
    return n_chunks * unroll / (time.perf_counter() - t0)


def bench_full_train(cfg, model, params, n_steps=60, batch_size=32):
    """Phase-2 (controlled-generation) iterations/sec: 3 sub-updates per
    iteration (VAE, generator-attribute with soft-sample feedback,
    classifier), unrolled 10 per dispatch."""
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu.ops import losses as L
    from controlled_peptide_generation_tpu.train.train_full import (
        make_full_scan)

    cfg.full.update(cfg.shared)
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    unroll = 10
    chunk_step, opts = make_full_scan(model, cfg.full, cfg.losses, rf,
                                      unroll, donate=True)
    params = jax.tree.map(jnp.copy, params)
    oE, oG, oC = (o.init(params) for o in opts)

    rng = jax.random.PRNGKey(2)
    toks = jax.random.randint(
        rng, (unroll, batch_size, model.max_seq_len), 4, model.n_vocab,
        jnp.int32).at[..., 0].set(2).at[..., 12].set(3)
    lab_y = jax.random.bernoulli(rng, 0.5, (unroll, batch_size)).astype(
        jnp.int32)

    p, oE, oG, oC, _ = chunk_step(p_ := params, oE, oG, oC, rng, toks,
                                  toks, lab_y, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(p)
    n_chunks = max(n_steps // unroll, 1)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        p, oE, oG, oC, _ = chunk_step(p, oE, oG, oC, rng, toks, toks,
                                      lab_y,
                                      jnp.asarray(i * unroll, jnp.int32))
    jax.block_until_ready(p)
    return n_chunks * unroll / (time.perf_counter() - t0)


def bench_reject_1m(cfg, model, params, n_latents=1_000_000):
    """Stretch config (BASELINE.json): CLaSS rejection over 10^6 latents —
    GMM-100 draw + 2 classifier heads + accept test in ONE program,
    decode excluded (accepted-only decode happens downstream)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu.latent import density, logreg

    key = jax.random.PRNGKey(6)
    mu = 0.5 * jax.random.normal(key, (5000, model.z_dim))
    lv = jnp.full((5000, model.z_dim), -1.5)
    Q = density.mogQ(np.asarray(mu), np.asarray(lv), n_components=100,
                     z_num_samples=2, covariance_type="diag", key=key)
    w1 = jnp.zeros(model.z_dim).at[0].set(1.0)
    w2 = jnp.zeros(model.z_dim).at[1].set(-0.5)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w1, b=jnp.asarray(0.3)),
         "tox": logreg.LogRegParams(w=w2, b=jnp.asarray(-0.4))},
        {"amp": 1, "tox": 0})

    z, scores, accept = Q.rejection_sample(key, n_latents)  # compile
    jax.block_until_ready(accept)
    n_rep = 5
    t0 = time.perf_counter()
    for r in range(n_rep):
        z, scores, accept = Q.rejection_sample(
            jax.random.fold_in(key, r), n_latents)
    jax.block_until_ready(accept)
    dt = time.perf_counter() - t0
    log(f"1M-latent rejection: {n_rep}x{n_latents} in {dt:.3f}s "
        f"(accept rate {float(accept.mean()):.3f})")
    return n_rep * n_latents / dt


def bench_transformer(cfg, n_steps=60, batch_size=32, chunk=1024,
                      n_chunks=2):
    """Stretch family: transformer enc-dec phase-1 train steps/sec and
    KV-cache beam decode seqs/sec at reference dims (d_model 128)."""
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.models import build_model

    tcfg = C.default_config()
    tcfg.vae.update(tcfg.shared)
    tcfg.model.E_args.E_class = "transformer"
    tcfg.model.G_args.G_class = "transformer"
    model = build_model(tcfg.model, n_vocab=26,
                        max_seq_len=tcfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    train_rate = bench_train(tcfg, model, params, n_steps=n_steps,
                             batch_size=batch_size)
    beam_rate = bench_beam(tcfg, model, params, chunk=chunk,
                           n_chunks=n_chunks)
    return train_rate, beam_rate


def bench_beam(cfg, model, params, chunk=1024, n_chunks=4, beam_size=5,
               dtype="float32"):
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu.ops import nn
    from controlled_peptide_generation_tpu.ops.beam import beam_search

    dt = jnp.dtype(dtype)
    dec_params = params if dt == jnp.float32 else nn.cast_tree(params, dt)
    key = jax.random.PRNGKey(3)

    def decode(k1, k2):
        z = model.sample_z_prior(k1, chunk).astype(dt)
        c = model.sample_c_prior(k2, chunk).astype(dt)
        return beam_search(model, dec_params, z, c, beam_size=beam_size,
                           n_best=1)

    hyps, _ = decode(key, key)  # compile
    jax.block_until_ready(hyps)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        hyps, _ = decode(jax.random.fold_in(key, i),
                         jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(hyps)
    return (chunk * n_chunks) / (time.perf_counter() - t0)


def bench_beam_device(cfg, model, params, chunk=1024, dtype="float32",
                      fast=False):
    """Beam decode rate under the calibrated device-time protocol of
    record (calibrated_device_time); the caller sets the beam route."""
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu.ops import nn
    from controlled_peptide_generation_tpu.ops.beam import beam_search

    dt = jnp.dtype(dtype)
    dec_params = params if dt == jnp.float32 else nn.cast_tree(params, dt)

    def body(k):
        z = model.sample_z_prior(k, chunk).astype(dt)
        c = model.sample_c_prior(jax.random.fold_in(k, 1),
                                 chunk).astype(dt)
        return beam_search(model, dec_params, z, c, beam_size=5,
                           n_best=1)[0]

    dev_s = calibrated_device_time(body, target_s=0.3 if fast else 1.0)
    return chunk / dev_s


def bench_class_dp(cfg, model, params, n_devices, n_per_round=5000,
                   rounds_per_dispatch=10, n_dispatches=4,
                   capacity_frac=None):
    """CLaSS fused-round throughput sharded over an n-device mesh
    (parallel.dp_fused_round): each device owns round_size/n candidates.
    On a 1-chip/CPU host, run under
    XLA_FLAGS=--xla_force_host_platform_device_count=N to measure the
    scaling SHAPE; on a real pod the same path measures real scaling.
    capacity_frac enables the accepted-only production decode mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu import parallel
    from controlled_peptide_generation_tpu.latent import density, logreg

    key = jax.random.PRNGKey(4)
    mu = 0.5 * jax.random.normal(key, (5000, model.z_dim))
    lv = jnp.full((5000, model.z_dim), -1.5)
    Q = density.mogQ(np.asarray(mu), np.asarray(lv), n_components=100,
                     z_num_samples=2, covariance_type="diag", key=key)
    w1 = jnp.zeros(model.z_dim).at[0].set(1.0)
    w2 = jnp.zeros(model.z_dim).at[1].set(-0.5)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w1, b=jnp.asarray(0.3)),
         "tox": logreg.LogRegParams(w=w2, b=jnp.asarray(-0.4))},
        {"amp": 1, "tox": 0})

    mesh = parallel.get_mesh(n_devices)
    n = n_per_round * rounds_per_dispatch
    n += (-n) % n_devices  # round size must divide over the mesh
    cap = None
    if capacity_frac is not None:
        cap = max(int(round(n * capacity_frac)), 1)
        cap += (-cap) % n_devices

    def run_round(k):
        out = parallel.dp_fused_round(mesh, model, params, k, Q, n,
                                      capacity=cap)
        # accepted-and-decoded count: valid slots in compact mode
        return out[5] if cap is not None else out[2]

    acc = run_round(key)  # compile
    jax.block_until_ready(acc)
    outs = []
    t0 = time.perf_counter()
    for r in range(n_dispatches):
        outs.append(run_round(jax.random.fold_in(key, r + 1)))
    jax.block_until_ready(outs[-1])
    dt = time.perf_counter() - t0
    accepted = sum(int(jnp.sum(a)) for a in outs)
    log(f"CLaSS dp={n_devices}{'' if cap is None else ' (accepted-only)'}: "
        f"{accepted} accepted ({n_dispatches * n} candidates) in {dt:.2f}s")
    return accepted / dt


def bench_tp(cfg, n_total, n_steps=30, batch_size=32):
    """Transformer-family train-step sweep over (data, model) mesh shapes
    with dp*tp = n_total (parallel/tp.py). On a virtual CPU mesh the point
    is that every sharding compiles, executes, and produces the same loss
    (one physical CPU underneath — rates stay flat); on a real pod the
    identical code measures real TP/DP scaling with zero new code."""
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu import parallel
    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.ops import losses as L

    cfg.model.E_args.E_class = "transformer"
    cfg.model.G_args.G_class = "transformer"
    model = build_model(cfg.model, n_vocab=26, max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    n_heads = model.dec_tfm_args.get("n_heads", 4)

    text = jax.random.randint(jax.random.PRNGKey(2),
                              (batch_size, model.max_seq_len), 4, 26,
                              jnp.int32)
    text = text.at[:, 0].set(2).at[:, 12].set(3)

    rates, losses = {}, {}
    for tp in (1, 2, 4, 8):
        dp = n_total // tp
        if n_total % tp or n_heads % tp or batch_size % dp:
            continue
        mesh = parallel.get_mesh_2d(dp, tp)
        step, _, init_state = parallel.make_tp_train_step(
            model, cfg.vae, cfg.losses, rf, mesh, donate=False)
        p, o = init_state(params)
        t_s = parallel.shard_batch(mesh, text)
        key = jax.random.PRNGKey(3)
        p, o, m = step(p, o, key, t_s, jnp.asarray(0, jnp.int32))
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            p, o, m = step(p, o, jax.random.fold_in(key, i), t_s,
                           jnp.asarray(i, jnp.int32))
        jax.block_until_ready(p)
        dt = time.perf_counter() - t0
        tag = f"dp{dp}xtp{tp}"
        rates[tag] = n_steps / dt
        losses[tag] = float(m["L_vae"])
        log(f"tp sweep {tag}: {rates[tag]:.1f} steps/s "
            f"(loss {losses[tag]:.4f})")
    # every mesh shape computes the same math; on a single host they agree
    # to float noise, on a real pod reduction order differs per sharding
    # and can drift over 30 Adam steps — report, don't die
    vals = list(losses.values())
    if any(abs(v - vals[0]) > 1e-3 for v in vals):
        log(f"WARNING: tp-sweep losses diverge beyond 1e-3 "
            f"(reduction-order drift across shardings): {losses}")
    return rates


def bench_class(cfg, model, params, n_per_round=5000, min_accepted=100,
                n_components=100, decode_dtype=None, capacity_frac=None):
    """Full CLaSS loop at reference workload: mogQ fit excluded (setup),
    rejection + beam decode + accept bookkeeping timed.

    capacity_frac=None beam-decodes ALL candidates (the reference round
    semantics); capacity_frac=F decodes only accepted candidates into
    F*round_size fixed slots (hw.decode_mode="accepted" — identical
    accepted output set, see latent/fused.py). Only decoded accepted
    samples count toward the rate either way.

    decode_dtype defaults to the platform's best configuration — float32
    everywhere since the whole-scan Pallas beam kernel made fp32 the
    faster TPU decode too (+8-9% on the fused round, BENCH.md "gen_dtype
    flip"; bf16 was the XLA-scan-era winner), which also makes the CPU
    baseline exactly like-for-like."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu.latent import density, logreg
    from controlled_peptide_generation_tpu.ops.beam import beam_search

    if decode_dtype is None:
        decode_dtype = "float32"
    key = jax.random.PRNGKey(4)
    # synthetic latent corpus standing in for dumped encoder states
    mu = 0.5 * jax.random.normal(key, (5000, model.z_dim))
    lv = jnp.full((5000, model.z_dim), -1.5)
    Q = density.mogQ(np.asarray(mu), np.asarray(lv),
                     n_components=n_components, z_num_samples=2,
                     covariance_type="diag", key=key)
    # two latent attribute heads with a deterministic, moderate accept rate
    w1 = jnp.zeros(model.z_dim).at[0].set(1.0)
    w2 = jnp.zeros(model.z_dim).at[1].set(-0.5)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w1, b=jnp.asarray(0.3)),
         "tox": logreg.LogRegParams(w=w2, b=jnp.asarray(-0.4))},
        {"amp": 1, "tox": 0})

    from controlled_peptide_generation_tpu.latent.fused import fused_round

    def run_round(k, n):
        cap = None if capacity_frac is None else max(
            int(round(n * capacity_frac)), 1)
        out = fused_round(model, params, k, Q, n,
                          decode_dtype=decode_dtype, capacity=cap)
        # accepted-and-decoded count: valid slots in compact mode, the
        # accept mask otherwise
        return (out[5], out[3]) if cap is not None else (out[2], out[3])

    tag = ("decode-all" if capacity_frac is None
           else f"accepted-only cap={capacity_frac}")

    # compile the fused round once (excluded from timing)
    from controlled_peptide_generation_tpu.utils import runtime
    runtime.set_phase(f"bench_class compile ({tag})")
    accept, tokens = run_round(key, n_per_round)
    jax.block_until_ready(tokens)
    runtime.set_phase(f"bench_class rounds ({tag})")

    # steady-state: rounds are independent until the host-side dedup, so
    # they pipeline; the reference's >=min_accepted stop criterion is hit
    # inside round 1 at these acceptance rates — measure 10 rounds and
    # report aggregate accepted/sec
    n_rounds = 10
    outs = []
    t0 = time.perf_counter()
    for r in range(n_rounds):
        accept, tokens = run_round(jax.random.fold_in(key, r + 1),
                                   n_per_round)
        outs.append((accept, tokens))
    jax.block_until_ready(outs[-1][1])
    dt = time.perf_counter() - t0
    accepted = sum(int(jnp.sum(a)) for a, _ in outs)
    assert accepted >= min_accepted
    log(f"CLaSS ({tag}): {accepted} accepted in {n_rounds} rounds "
        f"({n_rounds * n_per_round} candidates) in {dt:.2f}s")
    rate = accepted / dt

    # same work, batched: the tunnel serializes dispatches (variable
    # ~0.1-1s RTT each), so executing many rounds as ONE program amortizes
    # the round trip; 20 rounds/dispatch is robustly device-bound
    n_batched = 2 * n_rounds
    accept, tokens = run_round(key, n_per_round * n_batched)
    jax.block_until_ready(tokens)
    t0 = time.perf_counter()
    accept, tokens = run_round(jax.random.fold_in(key, 99),
                               n_per_round * n_batched)
    jax.block_until_ready(tokens)
    dt_b = time.perf_counter() - t0
    acc_b = int(jnp.sum(accept))
    log(f"CLaSS batched ({n_batched} rounds/dispatch, {tag}): "
        f"{acc_b} accepted ({n_batched * n_per_round} candidates) "
        f"in {dt_b:.2f}s")
    return rate, acc_b / dt_b


# ---------------------------------------------------------------------------
# MFU / roofline accounting (--mfu; included in --all on TPU)
#
# Analytic FLOP counts (MAC = 2 flops; elementwise gate math excluded,
# <2% at these shapes) x measured DEVICE time -> achieved FLOP/s and % of
# chip peak per workload, at the reference shape and along a batch sweep
# to the throughput knee. Device time is measured by chaining the workload
# body N times inside ONE program (lax.scan over folded keys) and
# subtracting the measured null-dispatch RTT, so the tunnel's
# per-dispatch latency does not pollute the numbers. XLA's own
# cost_analysis is NOT used: on this backend it counts scan bodies once
# (verified: an 8-iteration scan of a 512x512 matmul reports ~1x the
# single matmul's flops), and every hot workload here is a scan.
# ---------------------------------------------------------------------------

_CHIP_PEAKS = {  # device_kind substring -> (bf16 peak FLOP/s, HBM B/s)
    "v5 lite": (197e12, 819e9),   # v5e ("How to Scale Your Model" specs)
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),
}


def chip_peaks():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for sub, peaks in _CHIP_PEAKS.items():
        if sub in kind:
            return kind, peaks
    return kind, (None, None)


def _gru_cell_flops(d_in, h):
    """One GRU cell application per sample per step:
    x@Wx [d_in,3h] + h@Wh [h,3h]."""
    return 2 * (d_in * 3 * h + h * 3 * h)


def _dims(cfg, model):
    return dict(V=model.n_vocab, T=model.max_seq_len, E=model.emb_dim,
                Z=model.z_dim, C=model.c_dim,
                He=cfg.model.E_args.get("h_dim", 80), Hd=model.h_dec,
                RF=cfg.losses.wae_mmd.rf_dim)


def flops_vae_fwd(cfg, model, B):
    """One teacher-forced forward: biGRU encoder (T steps x 2 dirs) +
    mu/logvar heads + GRU decoder (input [emb,z,c]) + vocab head +
    RF-MMD features on q and prior samples."""
    d = _dims(cfg, model)
    enc = 2 * d["T"] * _gru_cell_flops(d["E"], d["He"])
    heads = 2 * 2 * (2 * d["He"]) * d["Z"]
    dec = d["T"] * (_gru_cell_flops(d["E"] + d["Z"] + d["C"], d["Hd"])
                    + 2 * d["Hd"] * d["V"])
    rf = 2 * 2 * d["Z"] * d["RF"]
    return B * (enc + heads + dec + rf)


def _clf_flops(cfg, model, B):
    """Kim-CNN classifier: conv widths 3..5 x 100 filters over [T, E]."""
    d = _dims(cfg, model)
    widths = cfg.model.C_args.get("filter_widths", (3, 4, 5))
    n_f = cfg.model.C_args.get("n_filters", 100)
    conv = sum(2 * d["T"] * w * d["E"] * n_f for w in widths)
    return B * (conv + 2 * len(widths) * n_f * 2)


def flops_train_step(cfg, model, B):
    """Phase-1 step = forward + backward; backward ~= 2x forward (dL/dW
    and dL/dx matmul pairs). Optimizer elementwise excluded."""
    return 3 * flops_vae_fwd(cfg, model, B)


def flops_full_step(cfg, model, B):
    """Phase-2 iteration = 3 sub-updates (train/train_full.py): VAE update
    (fwd+bwd), generator update (free-running soft decode + classifier
    feedback, fwd+bwd), classifier update on real+generated batches."""
    dec_clf = (flops_vae_fwd(cfg, model, B) / 2  # decoder-side free run
               + _clf_flops(cfg, model, B))
    return (3 * flops_vae_fwd(cfg, model, B)
            + 3 * dec_clf
            + 3 * 2 * _clf_flops(cfg, model, B))


def flops_beam(cfg, model, B, K=5):
    """Batched beam: B*K lanes x T steps of the single-token decoder cell
    + vocab head (GRU family), or the KV-cache incremental transformer
    block stack (transformer family; self-attn over the cache averages
    t=T/2, cross-attn K/V precomputed once per lane)."""
    d = _dims(cfg, model)
    if getattr(model, "G_class", "gru") == "transformer":
        t = model.dec_tfm_args
        D, L = t.get("d_model", 128), t.get("n_layers", 2)
        FF = t.get("d_ff", 4 * D)
        per_tok_layer = (2 * 3 * D * D + 2 * D * D      # self qkv + out
                         + 2 * 2 * (d["T"] / 2) * D     # self attn w/ cache
                         + 2 * D * D + 2 * D * D        # cross q + out
                         + 2 * 2 * d["T"] * D           # cross attn
                         + 2 * 2 * D * FF)              # ffn
        per_lane = d["T"] * (L * per_tok_layer + 2 * D * d["V"])
        cross_kv = 2 * 2 * d["T"] * D * D * L           # once per lane
        return B * K * (per_lane + cross_kv)
    per_lane_step = (_gru_cell_flops(d["E"] + d["Z"] + d["C"], d["Hd"])
                     + 2 * d["Hd"] * d["V"])
    return B * K * d["T"] * per_lane_step


def bytes_beam(cfg, model, B, K=5, dtype_bytes=2):
    """Minimum HBM traffic of the GRU beam recurrence: per lane-step the
    loop-invariant token-table gather row [3Hd], hidden read+write [Hd],
    fp32 logits [V], plus O(K) bookkeeping. Weights (<1 MB) live in VMEM
    across the scan and are excluded."""
    d = _dims(cfg, model)
    per = (3 * d["Hd"] * dtype_bytes + 2 * d["Hd"] * dtype_bytes
           + d["V"] * 4 + 64)
    return B * K * d["T"] * per


def flops_transformer_train(cfg, model, B):
    """6 * matmul-params * tokens (fwd+bwd), plus attention score flops."""
    d = _dims(cfg, model)
    te, td = model.enc_tfm_args, model.dec_tfm_args
    De, Le = te.get("d_model", 128), te.get("n_layers", 2)
    Dd, Ld = td.get("d_model", 128), td.get("n_layers", 2)
    FFe, FFd = te.get("d_ff", 4 * De), td.get("d_ff", 4 * Dd)
    p_enc = Le * (4 * De * De + 2 * De * FFe)
    p_dec = Ld * (8 * Dd * Dd + 2 * Dd * FFd)   # self + cross
    p_head = Dd * d["V"]
    attn = (Le + 2 * Ld) * 2 * 2 * d["T"] * d["T"] * max(De, Dd)
    return B * (6 * d["T"] * (p_enc + p_dec + p_head) + 3 * attn)


def _null_rtt(n=7):
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(())
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def device_time(body, iters, key=None, reps=3):
    """Per-iteration device seconds of body(key): iters chained
    repetitions inside ONE program, minus the null-dispatch RTT, best of
    reps dispatches."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(17) if key is None else key

    def rep(k):
        def step(carry, i):
            out = body(jax.random.fold_in(k, i))
            s = jnp.float32(0)
            for leaf in jax.tree.leaves(out):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return carry + s, None
        tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(iters))
        return tot

    f = jax.jit(rep)
    jax.block_until_ready(f(key))  # compile
    rtt = _null_rtt()
    walls = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(jax.random.fold_in(key, 1000 + r)))
        walls.append(time.perf_counter() - t0)
    return max(min(walls) - rtt, 1e-9) / iters


def calibrated_device_time(body, target_s=1.0, reps=4, max_iters=512):
    """THE device-time protocol of record (BENCH.md "protocol"): iters
    sized so ONE dispatch holds ~target_s of device work (a short probe
    estimates the per-iter time first), best of reps, null-RTT
    subtracted. Short chains at small per-iter times measure the
    tunnel's tens-of-ms dispatch jitter, not the kernel — this is the
    discrepancy that produced two disagreeing beam timings in round 3
    (1.22 vs 1.48 ms for the same shape); every table now uses this one
    calibration."""
    est = device_time(body, 4, reps=2)
    iters = max(4, min(max_iters, int(target_s / max(est, 1e-5))))
    return device_time(body, iters, reps=reps)


def _mfu_row(rows, name, flop, dev_s, peak_flops, peak_bw=None,
             bytes_=None, per=None, per_unit=None, note=""):
    row = {"workload": name, "device_ms": round(dev_s * 1e3, 3),
           "gflop": round(flop / 1e9, 3),
           "tflops": round(flop / dev_s / 1e12, 4)}
    if peak_flops:
        row["mfu_pct"] = round(100 * flop / dev_s / peak_flops, 3)
    if bytes_ is not None and peak_bw:
        row["gbytes"] = round(bytes_ / 1e9, 3)
        row["gb_per_s"] = round(bytes_ / dev_s / 1e9, 1)
        row["bw_pct"] = round(100 * bytes_ / dev_s / peak_bw, 2)
    if per is not None:
        row[per_unit] = round(per, 1)
    if note:
        row["note"] = note
    rows.append(row)
    log("  " + json.dumps(row))
    return row


def bench_mfu(cfg, model, params, fast=False):
    """The roofline table: analytic FLOPs x measured device time for every
    hot workload, at reference shapes and along batch sweeps to the knee.
    Returns {chip, peaks, rows}."""
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu.ops import losses as L
    from controlled_peptide_generation_tpu.ops import nn
    from controlled_peptide_generation_tpu.ops.beam import beam_search
    from controlled_peptide_generation_tpu.train.train_vae import (
        make_train_scan)

    from controlled_peptide_generation_tpu.utils import runtime

    kind, (peak_f, peak_bw) = chip_peaks()
    log(f"MFU accounting on {kind!r}: bf16 peak "
        f"{(peak_f or 0) / 1e12:.0f} TFLOP/s, HBM {(peak_bw or 0) / 1e9:.0f} "
        f"GB/s (fp32 rows are reported against the same bf16 peak)")
    rows = []
    rtt = _null_rtt()
    log(f"null-dispatch RTT: {rtt * 1e3:.1f} ms (subtracted)")

    # --- phase-1 train step: reference batch 32 + sweep to the knee,
    # BOTH GRU-scan routes (pallas = fused whole-scan fwd+bwd kernels of
    # ops/pallas_gru.py; xla = the --hw.pallas_train off lax.scan arm) ---
    from controlled_peptide_generation_tpu.ops import gru as gru_mod
    from controlled_peptide_generation_tpu.ops import pallas_gru
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    unroll = 50
    t_applicable = pallas_gru.applicable(model.h_dec, jnp.float32)
    t_default = "pallas" if (gru_mod.pallas_train_enabled()
                             and t_applicable) else "xla"
    for tpath, B in [(tp, b)
                     for tp in (("pallas", "xla") if t_applicable
                                else ("xla",))
                     for b in ((32,) if fast else (32, 256, 1024))]:
        runtime.set_phase(f"mfu: wae_train b{B} {tpath}")
        gru_mod.set_pallas_train(tpath == "pallas")
        jax.clear_caches()
        chunk_step, opt = make_train_scan(model, cfg.vae, cfg.losses, rf,
                                          unroll, donate=True)
        p = jax.tree.map(jnp.copy, params)
        o = opt.init(p)
        text = jax.random.randint(jax.random.PRNGKey(2),
                                  (unroll, B, model.max_seq_len), 4,
                                  model.n_vocab, jnp.int32)
        text = text.at[..., 0].set(2).at[..., 12].set(3)
        p2, o2, _ = chunk_step(p, o, jax.random.PRNGKey(3), text,
                               jnp.asarray(0, jnp.int32))
        jax.block_until_ready(p2)
        # chain dispatches WITHOUT intermediate syncs (the production loop
        # syncs only at log boundaries; a per-dispatch block_until_ready
        # pays a tunnel sync the real loop never does), one block at the
        # end; the chain is calibrated to hold ~1s of device work like
        # calibrated_device_time (donated buffers keep this a manual loop)
        t0 = time.perf_counter()
        p2, o2, _ = chunk_step(p2, o2, jax.random.PRNGKey(5), text,
                               jnp.asarray(0, jnp.int32))
        jax.block_until_ready(p2)
        n_disp = max(2, min(64, int(1.0 / max(time.perf_counter() - t0,
                                              1e-4))))
        walls = []
        for rep in range(3):
            t0 = time.perf_counter()
            for r in range(n_disp):
                p2, o2, _ = chunk_step(p2, o2, jax.random.fold_in(
                    jax.random.PRNGKey(3), rep * n_disp + r), text,
                    jnp.asarray(r, jnp.int32))
            jax.block_until_ready(p2)
            walls.append(time.perf_counter() - t0)
        dev_s = max(min(walls) - rtt, 1e-9) / (n_disp * unroll)
        fl = flops_train_step(cfg, model, B)
        _mfu_row(rows, f"wae_train_step_b{B}_{tpath}", fl, dev_s, peak_f,
                 per=B / dev_s, per_unit="seqs_per_s",
                 note=("default route" if tpath == t_default
                       else "comparison arm"))
    gru_mod.set_pallas_train(None)
    jax.clear_caches()

    # --- beam decode: fp32 + bf16 along the chunk sweep, BOTH routes ---
    # every row is labeled with the beam path it measured; "default" marks
    # the arm the production policy (--hw.pallas_beam auto) would route to
    from controlled_peptide_generation_tpu.ops import beam as beam_mod
    from controlled_peptide_generation_tpu.ops import pallas_beam
    beam_shapes = [(c, d) for c in ((1024,) if fast
                                    else (1024, 4096, 16384))
                   for d in ("float32", "bfloat16")]
    for path in ("pallas", "xla"):
        beam_mod.set_pallas_beam(path == "pallas")
        jax.clear_caches()
        for chunk, dtype in beam_shapes:
            dt = jnp.dtype(dtype)
            if path == "pallas" and not pallas_beam.applicable(model, 5,
                                                               dt):
                continue
            runtime.set_phase(f"mfu: beam {chunk} {dtype} {path}")
            dec_params = (params if dt == jnp.float32
                          else nn.cast_tree(params, dt))

            def body(k, _chunk=chunk, _dt=dt, _p=dec_params):
                z = model.sample_z_prior(k, _chunk).astype(_dt)
                c = model.sample_c_prior(jax.random.fold_in(k, 1),
                                         _chunk).astype(_dt)
                return beam_search(model, _p, z, c, beam_size=5,
                                   n_best=1)[0]

            dev_s = calibrated_device_time(
                body, target_s=0.3 if fast else 1.0)
            fl = flops_beam(cfg, model, chunk)
            by = bytes_beam(cfg, model, chunk,
                            dtype_bytes=dt.itemsize)
            dname = "bf16" if dtype[0] == "b" else "fp32"
            default = path == ("pallas" if pallas_beam.applicable(
                model, 5, dt) else "xla")
            _mfu_row(rows, f"beam_{chunk}_{dname}_{path}",
                     fl, dev_s, peak_f,
                     peak_bw, bytes_=by, per=chunk / dev_s,
                     per_unit="seqs_per_s",
                     note="default route" if default else "comparison arm")
    beam_mod.set_pallas_beam(None)
    jax.clear_caches()

    # --- fused CLaSS round: decode-all + accepted-only at 50k ---
    from controlled_peptide_generation_tpu.latent import density, logreg
    from controlled_peptide_generation_tpu.latent.fused import fused_round
    import numpy as np
    key = jax.random.PRNGKey(4)
    mu = 0.5 * jax.random.normal(key, (5000, model.z_dim))
    lv = jnp.full((5000, model.z_dim), -1.5)
    Q = density.mogQ(np.asarray(mu), np.asarray(lv), n_components=100,
                     z_num_samples=2, covariance_type="diag", key=key)
    w1 = jnp.zeros(model.z_dim).at[0].set(1.0)
    w2 = jnp.zeros(model.z_dim).at[1].set(-0.5)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w1, b=jnp.asarray(0.3)),
         "tox": logreg.LogRegParams(w=w2, b=jnp.asarray(-0.4))},
        {"amp": 1, "tox": 0})
    n_round = 5_000 if fast else 50_000
    for path in ("pallas", "xla"):
        beam_mod.set_pallas_beam(path == "pallas")
        jax.clear_caches()
        for mode, cap in (("decode_all", None),
                          ("accepted_only", n_round // 2)):
            runtime.set_phase(f"mfu: fused_round {mode} {path}")
            def body(k, _cap=cap):
                out = fused_round(model, params, k, Q, n_round,
                                  capacity=_cap)
                return out[3]
            dev_s = calibrated_device_time(
                body, target_s=0.3 if fast else 1.0, reps=2)
            n_dec = n_round if cap is None else cap
            fl = flops_beam(cfg, model, n_dec)  # rejection math is <0.1%
            by = bytes_beam(cfg, model, n_dec)
            default = path == ("pallas" if pallas_beam.applicable(
                model, 5, jnp.float32) else "xla")
            _mfu_row(rows, f"fused_round_{n_round}_{mode}_{path}", fl,
                     dev_s, peak_f, peak_bw, bytes_=by,
                     per=n_round / dev_s, per_unit="candidates_per_s",
                     note="default route" if default else "comparison arm")
    beam_mod.set_pallas_beam(None)
    jax.clear_caches()

    # --- transformer family: train step + KV-cache beam ---
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.models import build_model
    runtime.set_phase("mfu: transformer train")
    tcfg = C.default_config()
    tcfg.vae.update(tcfg.shared)
    tcfg.model.E_args.E_class = "transformer"
    tcfg.model.G_args.G_class = "transformer"
    tmodel = build_model(tcfg.model, n_vocab=26,
                         max_seq_len=tcfg.max_seq_len)
    tparams = tmodel.init_params(jax.random.PRNGKey(0))
    chunk_step, opt = make_train_scan(tmodel, tcfg.vae, tcfg.losses, rf,
                                      unroll, donate=True)
    p = jax.tree.map(jnp.copy, tparams)
    o = opt.init(p)
    B = 32
    text = jax.random.randint(jax.random.PRNGKey(2),
                              (unroll, B, tmodel.max_seq_len), 4, 26,
                              jnp.int32).at[..., 0].set(2)
    p2, o2, _ = chunk_step(p, o, jax.random.PRNGKey(3), text,
                           jnp.asarray(0, jnp.int32))
    jax.block_until_ready(p2)
    t0 = time.perf_counter()
    p2, o2, _ = chunk_step(p2, o2, jax.random.PRNGKey(5), text,
                           jnp.asarray(0, jnp.int32))
    jax.block_until_ready(p2)
    n_disp = max(2, min(64, int(1.0 / max(time.perf_counter() - t0, 1e-4))))
    walls = []
    for rep in range(3):
        t0 = time.perf_counter()
        for r in range(n_disp):
            p2, o2, _ = chunk_step(p2, o2, jax.random.fold_in(
                jax.random.PRNGKey(4), rep * n_disp + r), text,
                jnp.asarray(r, jnp.int32))
        jax.block_until_ready(p2)
        walls.append(time.perf_counter() - t0)
    dev_s = max(min(walls) - rtt, 1e-9) / (n_disp * unroll)
    _mfu_row(rows, "transformer_train_step_b32",
             flops_transformer_train(tcfg, tmodel, B), dev_s, peak_f,
             per=B / dev_s, per_unit="seqs_per_s")

    from controlled_peptide_generation_tpu.ops import pallas_tfm_beam
    tdec = nn.cast_tree(tparams, jnp.bfloat16)
    t_appl = pallas_tfm_beam.applicable(tmodel, 5, jnp.bfloat16)
    for path in (("pallas", "xla") if t_appl else ("xla",)):
        runtime.set_phase(f"mfu: transformer beam {path}")
        beam_mod.set_pallas_beam(path == "pallas")
        jax.clear_caches()

        def tbody(k):
            z = tmodel.sample_z_prior(k, 1024).astype(jnp.bfloat16)
            c = tmodel.sample_c_prior(jax.random.fold_in(k, 1),
                                      1024).astype(jnp.bfloat16)
            return beam_search(tmodel, tdec, z, c, beam_size=5,
                               n_best=1)[0]

        dev_s = calibrated_device_time(tbody,
                                       target_s=0.3 if fast else 1.0,
                                       reps=2)
        _mfu_row(rows, f"transformer_beam_1024_bf16_{path}",
                 flops_beam(tcfg, tmodel, 1024), dev_s, peak_f,
                 per=1024 / dev_s, per_unit="seqs_per_s",
                 note=("default route" if path == "xla"
                       else "comparison arm (opt-in kernel, "
                            "--hw.pallas_beam on)"))
    beam_mod.set_pallas_beam(None)
    jax.clear_caches()

    return {"chip": kind, "peak_bf16_tflops": (peak_f or 0) / 1e12,
            "peak_hbm_gb_s": (peak_bw or 0) / 1e9, "null_rtt_ms":
            round(rtt * 1e3, 1), "rows": rows}


def write_baseline(cfg, model, params, fast=False):
    """Measure the three baseline metrics on THIS host's CPU and write
    CPU_BASELINE.json, so every container's vs_baseline is auditable
    against machine-generated numbers instead of hand-edited constants."""
    import datetime
    import platform as plat

    import jax

    assert jax.devices()[0].platform == "cpu", (
        "--write-baseline must run on the CPU platform "
        "(it defines the denominator); got " + jax.devices()[0].platform)
    kw = dict(n_per_round=1000, min_accepted=20) if fast else {}
    _, v_class = bench_class(cfg, model, params, **kw)
    _, v_compact = bench_class(cfg, model, params, capacity_frac=0.5, **kw)
    metrics = {
        "class_accepted_samples_per_sec": v_class,
        "class_accepted_only_samples_per_sec": v_compact,
        "wae_train_steps_per_sec": bench_train(
            cfg, model, params, n_steps=30 if fast else 100),
        "beam_decode_seqs_per_sec": bench_beam(
            cfg, model, params, n_chunks=2 if fast else 4),
    }
    payload = {
        "measured_at": datetime.datetime.now().isoformat(
            timespec="seconds"),
        "platform": "cpu",
        "host": plat.platform(),
        "protocol": "bench.py --write-baseline"
                    + (" --fast" if fast else ""),
        "metrics": metrics,
    }
    # the reference-style baseline (tools/refstyle_baseline.py) is a
    # separately measured section — carry it across rewrites
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            old = json.load(fh)
        if old.get("refstyle"):
            payload["refstyle"] = old["refstyle"]
    with open(BASELINE_FILE, "w") as fh:
        json.dump(payload, fh, indent=2)
    log(f"wrote {BASELINE_FILE}: {json.dumps(metrics)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--all", action="store_true",
                    help="run all three metrics")
    ap.add_argument("--fast", action="store_true",
                    help="smaller round sizes (CI smoke)")
    ap.add_argument("--write-baseline", action="store_true",
                    help="measure the baseline metrics on this host's CPU "
                         "and write CPU_BASELINE.json (the vs_baseline "
                         "denominator)")
    ap.add_argument("--mfu", action="store_true",
                    help="MFU/roofline accounting only: analytic FLOPs x "
                         "measured device time per workload, merged into "
                         "BENCH_DETAILS.json under 'mfu' (TPU only)")
    ap.add_argument("--dp", type=int, default=0, metavar="N",
                    help="CLaSS scaling sweep over mesh sizes 1,2,4..N "
                         "(pass --platform cpu to get an N-device virtual "
                         "CPU mesh on single-device hosts)")
    ap.add_argument("--dp-mode", default="all", choices=("all", "accepted"),
                    help="decode mode for the --dp sweep (accepted = "
                         "production accepted-only decode)")
    ap.add_argument("--tp", type=int, default=0, metavar="N",
                    help="transformer tensor-parallel sweep over (dp, tp) "
                         "mesh shapes with dp*tp = N (pass --platform cpu "
                         "to get an N-device virtual CPU mesh on "
                         "single-device hosts)")
    args = ap.parse_args()

    if args.write_baseline and not args.platform:
        args.platform = "cpu"
    if (args.dp or args.tp) and args.platform == "cpu":
        # must precede the first jax import: the CPU client reads XLA_FLAGS
        # once at initialization
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split() if f and
                 not f.startswith("--xla_force_host_platform_device_count")]
        flags.append("--xla_force_host_platform_device_count="
                     f"{args.dp or args.tp}")
        os.environ["XLA_FLAGS"] = " ".join(flags)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from controlled_peptide_generation_tpu.utils import runtime
    runtime.start_heartbeat()
    start_deadline()
    phase("runtime.setup")
    runtime.setup()

    import jax
    phase("device discovery")
    log(f"devices: {jax.devices()}")
    phase("build model")
    cfg, model, params = build()
    # The first D2H of a process stalls 67-412s in degraded tunnel phases
    # (tools/repro_first_d2h.py); runtime.setup() started paying it on a
    # background thread during build(). Join it HERE — boundedly, with
    # heartbeats — so the tax can never land inside a timed region below,
    # and a wedged tunnel can't consume the whole deadline budget.
    phase("first-D2H warmup")
    stall = runtime.wait_first_transfer(timeout=0.4 * DEADLINE_S)
    phase_done("first-D2H warmup",
               "ok" if stall is not None else "timed out/not applicable")
    if stall is not None:
        log(f"first-D2H warmup: {stall:.1f}s (excluded from all timings)")

    if args.write_baseline:
        phase("write-baseline")
        write_baseline(cfg, model, params, fast=args.fast)
        finish({"metric": "baseline written", "value": 1, "unit": "file",
                "vs_baseline": None})
        return

    if args.mfu:
        assert jax.devices()[0].platform != "cpu", (
            "MFU accounting is defined against the TPU peak; run on TPU")
        phase("mfu accounting")
        mfu = bench_mfu(cfg, model, params, fast=args.fast)
        existing = {}
        if os.path.exists("BENCH_DETAILS.json"):
            with open("BENCH_DETAILS.json") as fh:
                existing = json.load(fh)
        existing["mfu"] = mfu
        with open("BENCH_DETAILS.json", "w") as fh:
            json.dump(existing, fh, indent=2)
        best = max((r.get("mfu_pct", 0) for r in mfu["rows"]), default=0)
        finish({
            "metric": "best workload MFU",
            "value": best,
            "unit": "% of chip bf16 peak",
            "vs_baseline": None,
        })
        return

    if args.dp:
        avail = len(jax.devices())
        sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(args.dp, avail)]
        if args.dp not in sizes and args.dp <= avail:
            sizes.append(args.dp)
        kw = dict(n_per_round=1000, n_dispatches=2) if args.fast else {}
        if args.dp_mode == "accepted":
            kw["capacity_frac"] = 0.5
        rates = {}
        for n in sizes:
            phase(f"dp sweep n={n}")
            rates[n] = bench_class_dp(cfg, model, params, n, **kw)
        for n, r in rates.items():
            log(f"dp={n}: {r:.1f} accepted/s "
                f"({r / rates[sizes[0]]:.2f}x vs dp=1)")
        finish({
            "metric": "CLaSS accepted samples/sec by mesh size",
            "value": {str(n): round(r, 1) for n, r in rates.items()},
            "unit": "accepted samples/sec",
            "vs_baseline": round(rates[sizes[-1]] / rates[sizes[0]], 2),
        })
        return

    if args.tp:
        phase("tp sweep")
        rates = bench_tp(cfg, args.tp,
                         n_steps=10 if args.fast else 30)
        finish({
            "metric": "transformer TP train steps/sec by mesh shape",
            "value": {k: round(r, 1) for k, r in rates.items()},
            "unit": "train steps/sec",
            "vs_baseline": None,   # no baseline exists for this sweep
        })
        return

    baseline = load_baseline()
    # merge into the existing details so keys owned by other tools
    # (serve: tools/bench_serve.py, divergence: tools/beam_divergence.py)
    # survive an --all refresh; superseded key layouts are dropped here
    # so no stale row can contradict the fresh table (the pre-round-3
    # beam keys carried no beam-path label)
    details = {}
    if args.all and os.path.exists("BENCH_DETAILS.json"):
        with open("BENCH_DETAILS.json") as fh:
            details = json.load(fh)
        details = {k: v for k, v in details.items()
                   if not re.match(
                       r"^beam_decode_seqs_per_sec_\d+_(fp32|bf16)$", k)}
    kw = dict(n_per_round=1000, min_accepted=20) if args.fast else {}
    phase("bench_class decode-all")
    v_loop, v_class = bench_class(cfg, model, params, **kw)
    # provisional partial result: if the accepted-only phase wedges, the
    # deadline reaper still reports a real measured rate (decode-all mode,
    # compared against the decode-all baseline — like-for-like)
    set_partial_result({
        "metric": "CLaSS accepted samples/sec",
        "value": round(v_class, 3),
        "unit": "accepted samples/sec",
        "vs_baseline": round(
            v_class / baseline["class_accepted_samples_per_sec"], 2),
        "note": "provisional: decode-all mode (accepted-only phase "
                "did not complete)",
    })
    phase("bench_class accepted-only")
    # headline = the batched execution (identical candidate workload —
    # 10x5000 drawn/scored per program; the per-round dispatch loop is
    # kept in details for comparison) in accepted-only decode mode
    # (hw.decode_mode="accepted": identical accepted output set, only
    # accepted candidates occupy beam-decode slots — the production
    # configuration; the reference-semantics decode-all rate is recorded
    # alongside). vs_baseline stays like-for-like: the CPU baseline for
    # the headline is measured in the same accepted-only mode.
    _, v_compact = bench_class(cfg, model, params, capacity_frac=0.5, **kw)
    details["class_accepted_samples_per_sec"] = v_class
    details["class_accepted_samples_per_sec_round_loop"] = v_loop
    details["class_accepted_only_samples_per_sec"] = v_compact
    if "class_accepted_only_samples_per_sec" in baseline:
        headline = v_compact
        base_key = "class_accepted_only_samples_per_sec"
    else:  # stale baseline file: fall back to the decode-all comparison
        headline = v_class
        base_key = "class_accepted_samples_per_sec"
    # two denominators, both recorded (BASELINE.md):
    #  - vs_reference: the gate's stated baseline — the reference's own
    #    algorithmic shape on this host's CPU, measured by the committed
    #    tools/refstyle_baseline.py harness (deliberately optimistic
    #    toward the reference);
    #  - vs_our_cpu: this framework's own vectorized code on CPU in the
    #    same decode mode — a far stricter self-imposed bar.
    # The headline vs_baseline reports vs_reference when the harness
    # measurement exists, since that is what the >=50x target names.
    details["vs_our_cpu_same_mode"] = headline / baseline[base_key]
    refstyle = load_refstyle()
    if refstyle:
        details["vs_reference_style_cpu"] = headline / refstyle
        log(f"vs our-CPU (same mode): {details['vs_our_cpu_same_mode']:.1f}x"
            f"; vs reference-style CPU: "
            f"{details['vs_reference_style_cpu']:.1f}x")
    # the headline is now measured: make it the reaper's partial result so
    # a wedge anywhere in the --all extras still reports the real number
    ratio = (headline / refstyle if refstyle
             else headline / baseline[base_key])
    final_payload = {
        "metric": "CLaSS accepted samples/sec",
        "value": round(headline, 3),
        "unit": "accepted samples/sec",
        "vs_baseline": round(ratio, 2),
    }
    set_partial_result(final_payload)

    def flush_details():
        """Persist BENCH_DETAILS.json after every --all section so a
        wedge mid-sweep loses one section, not the whole table."""
        with open("BENCH_DETAILS.json", "w") as fh:
            json.dump(details, fh, indent=2)

    if args.all:
        flush_details()
        phase("bench_train")
        details["wae_train_steps_per_sec"] = bench_train(
            cfg, model, params, n_steps=30 if args.fast else 100)
        flush_details()
        phase("beam table")
        # beam table: chunk size x compute dtype x beam route (fp32 =
        # bit-parity path, bf16 = MXU-native production decode; every key
        # names the route it measured — "pallas" is the TPU default,
        # "xla" the oracle-exact --hw.pallas_beam off arm), all under the
        # calibrated ~1s-dispatch device-time protocol (BENCH.md)
        from controlled_peptide_generation_tpu.ops import (
            beam as beam_mod, pallas_beam)
        on_cpu = jax.devices()[0].platform == "cpu"
        for path in (("xla",) if on_cpu else ("pallas", "xla")):
            beam_mod.set_pallas_beam(path == "pallas")
            jax.clear_caches()
            for chunk in (1024, 4096):
                for dtype in ("float32", "bfloat16"):
                    tag = (f"beam_decode_seqs_per_sec_{chunk}_"
                           f"{'bf16' if dtype == 'bfloat16' else 'fp32'}"
                           f"_{path}")
                    details[tag] = bench_beam_device(
                        cfg, model, params, chunk=chunk, dtype=dtype,
                        fast=args.fast)
        beam_mod.set_pallas_beam(None)
        jax.clear_caches()
        default_path = ("xla" if on_cpu or not pallas_beam.applicable(
            model, 5, jax.numpy.float32) else "pallas")
        details["beam_decode_protocol"] = (
            "calibrated ~1s-dispatch device time, null-RTT subtracted "
            f"(bench.calibrated_device_time); default route = "
            f"{default_path}")
        details["beam_decode_seqs_per_sec"] = \
            details[f"beam_decode_seqs_per_sec_1024_fp32_{default_path}"]
        flush_details()
        # the 4096-candidates-per-round CLaSS shape (BENCH.md "next knob")
        phase("bench_class 4096-round")
        _, details["class_accepted_samples_per_sec_4096round"] = bench_class(
            cfg, model, params,
            **(dict(n_per_round=1000, min_accepted=20) if args.fast
               else dict(n_per_round=4096)))
        flush_details()
        phase("bench_full_train")
        details["full_train_steps_per_sec"] = bench_full_train(
            cfg, model, params, n_steps=20 if args.fast else 60)
        flush_details()
        phase("bench_transformer")
        tr, bm = bench_transformer(
            cfg, n_steps=20 if args.fast else 60,
            chunk=256 if args.fast else 1024)
        details["transformer_train_steps_per_sec"] = tr
        details["transformer_beam_seqs_per_sec"] = bm
        flush_details()
        phase("bench_reject_1m")
        details["reject_1m_latents_per_sec"] = bench_reject_1m(
            cfg, model, params,
            n_latents=100_000 if args.fast else 1_000_000)
        flush_details()
        if jax.devices()[0].platform != "cpu":
            phase("mfu accounting")
            details["mfu"] = bench_mfu(cfg, model, params, fast=args.fast)
        flush_details()
        log(json.dumps(details, indent=2))

    finish(final_payload)


if __name__ == "__main__":
    main()
