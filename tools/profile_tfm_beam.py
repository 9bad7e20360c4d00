"""Profile the transformer (or GRU) beam decode and print the top HLO ops.

VERDICT round-3 weak #4 / next-round #6: the transformer beam sits at
~1.2% MFU (45.5 ms / 1024 seqs, BENCH_DETAILS mfu row
``transformer_beam_1024_bf16``) and the only analysis on record is a
one-sentence "d_model=128 can't fill the MXU" claim. This tool replaces
the claim with data: it traces one warmed beam_search dispatch with
jax.profiler and aggregates device-op durations from the Chrome-trace
export, grouped by HLO op family, so the optimization target is named by
measurement rather than guessed.

Usage (on the TPU host):
    python tools/profile_tfm_beam.py --family transformer --batch 1024
    python tools/profile_tfm_beam.py --family gru --pallas off

Reference workload being analyzed: beam-5 top-1 decode of latent chunks,
/root/reference/sample_pipeline.py:129-139 (the decode stage), with the
transformer as the stretch generator family (no reference counterpart).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(family):
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.ops import nn

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    if family == "transformer":
        cfg.model.E_args.E_class = "transformer"
        cfg.model.G_args.G_class = "transformer"
    model = build_model(cfg.model, n_vocab=26, max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    dec = nn.cast_tree(params, jnp.bfloat16)
    return cfg, model, dec


def run(args):
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu.ops import beam as beam_mod
    from controlled_peptide_generation_tpu.utils import runtime

    if args.pallas != "auto":
        beam_mod.set_pallas_beam(args.pallas == "on")
    cfg, model, dec = build(args.family)
    runtime.warmup_first_transfer()
    runtime.wait_first_transfer()

    def body(k):
        z = model.sample_z_prior(k, args.batch).astype(jnp.bfloat16)
        c = model.sample_c_prior(jax.random.fold_in(k, 1),
                                 args.batch).astype(jnp.bfloat16)
        return beam_mod.beam_search(model, dec, z, c, beam_size=5, n_best=1)[0]

    jitted = jax.jit(body)
    out = jitted(jax.random.PRNGKey(1))
    jax.block_until_ready(out)          # compile + warm
    t0 = time.perf_counter()
    for i in range(args.reps):
        out = jitted(jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    print(f"warm wall for {args.reps} reps: {wall*1e3:.1f} ms "
          f"({wall/args.reps*1e3:.2f} ms/rep incl. dispatch)")

    logdir = args.logdir or tempfile.mkdtemp(prefix="tfm_beam_trace_")
    jax.profiler.start_trace(logdir)
    for i in range(args.reps):
        out = jitted(jax.random.PRNGKey(100 + i))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace ->", logdir)
    report(logdir, args.reps, args.top)


GROUPS = [
    ("dynamic-update-slice", re.compile(r"dynamic.update.slice", re.I)),
    ("gather/take", re.compile(r"gather", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("dot/matmul", re.compile(r"^(dot|convolution)|fusion.*dot", re.I)),
    ("sort/top-k", re.compile(r"sort|top-k|topk", re.I)),
    ("copy", re.compile(r"^copy", re.I)),
]


def classify(name):
    for label, pat in GROUPS:
        if pat.search(name):
            return label
    return None


def report(logdir, reps, top):
    paths = glob.glob(os.path.join(
        logdir, "plugins/profile/*/*trace.json.gz"))
    if not paths:
        print("no trace.json.gz found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device lanes: pids whose process_name metadata mentions TPU/device.
    pid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if re.search(r"tpu|device|/device:", n, re.I)
                and "host" not in n.lower()}
    if not dev_pids:          # CPU backend: fall back to all complete events
        dev_pids = set(pid_name)
    by_op = collections.Counter()
    n_ev = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0)        # microseconds
        name = ev.get("name", "?")
        by_op[name] += dur
        n_ev[name] += 1
        total += dur
    print(f"\ndevice pids: {sorted(dev_pids)} "
          f"({ {p: pid_name.get(p,'') for p in sorted(dev_pids)} })")
    print(f"total device op time: {total/1e3:.2f} ms over {reps} reps "
          f"= {total/1e3/max(reps,1):.2f} ms/rep")
    print(f"\n{'op':<72} {'ms':>9} {'%':>6} {'count':>7}")
    for name, dur in by_op.most_common(top):
        print(f"{name[:72]:<72} {dur/1e3:9.2f} {100*dur/max(total,1e-9):6.1f}"
              f" {n_ev[name]:7d}")
    grouped = collections.Counter()
    for name, dur in by_op.items():
        label = classify(name)
        if label:
            grouped[label] += dur
    print("\nby family:")
    for label, dur in grouped.most_common():
        print(f"  {label:<24} {dur/1e3:9.2f} ms "
              f"{100*dur/max(total,1e-9):5.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="transformer",
                    choices=["transformer", "gru"])
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--pallas", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--parse-only", default=None,
                    help="parse an existing trace logdir and exit")
    args = ap.parse_args()
    if args.parse_only:
        report(args.parse_only, args.reps, args.top)
        return
    run(args)


if __name__ == "__main__":
    main()
