#!/usr/bin/env python
"""Committed protocol for the Pallas-vs-XLA beam divergence table.

This is the measurement that justifies auto-routing TPU beam decodes
through the whole-scan fused Pallas kernel (ops/pallas_beam.py, default
via --hw.pallas_beam auto): on real hardware the two paths group matmul
accumulations differently, which flips near-tie beam choices. The claim
of record (BENCH.md "Equivalence") is that the matched-dtype flip rate
is well inside the fp32-vs-bf16 dtype floor the production pipeline
already accepts (cfg.hw.gen_dtype defaults to bfloat16).

Protocol: load a trained run (default flagship3), draw N z,c prior
samples from a fixed key, top-1 beam-decode them under all four
(path, dtype) combinations, and for each pair of record report

  * pct_differ      — % of sentences whose top-1 token rows differ
  * median_score_d  — median |final top-1 score delta| over differing
                      sentences (the "how near a tie" statistic)
  * max_score_d     — worst-case |score delta| (should stay near-tie
                      small relative to typical |scores| ~ tens)
  * uniq_a/uniq_b/uniq_ratio — unique-sequence yield per side and their
                      ratio: near-tie flips keep it ~1.0; a collapse is
                      the campaign-quality failure pct_differ alone
                      missed (round-4 tape scramble,
                      tools/repro_tape_scramble.py)

Defaults measure at CAMPAIGN scale (n=20000, chunk=25000 — the
production beam_chunk): the round-4 scramble was invisible at the old
n=2048 protocol and catastrophic at production batch shapes.

Pairs: xla_fp32-vs-xla_bf16 (the dtype floor), pallas_fp32-vs-xla_fp32
and pallas_bf16-vs-xla_bf16 (the kernel's matched-dtype divergence).

Run on the TPU backend — in interpret mode (CPU) the kernel is bit-exact
by construction (tests/test_pallas_beam.py) and every row reads 0.

    python tools/beam_divergence.py \
        --config_json output/flagship3/config_overrides.json \
        --n 2048 --update-details

Prints one JSON line; --update-details stores it under "divergence" in
BENCH_DETAILS.json. Reference semantics being relaxed:
/root/reference/models/Beam.py:56-122 (single exact beam), decode stage
/root/reference/sample_pipeline.py:129-139.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.api import (load_trained_model,
                                                   get_model_and_vocab_path)
from controlled_peptide_generation_tpu.data.vocab import Vocab
from controlled_peptide_generation_tpu.ops import beam as beam_mod
from controlled_peptide_generation_tpu.ops import nn
from controlled_peptide_generation_tpu.utils import runtime

PAIRS = (
    ("xla_fp32_vs_xla_bf16", ("xla", "float32"), ("xla", "bfloat16")),
    ("pallas_fp32_vs_xla_fp32", ("pallas", "float32"), ("xla", "float32")),
    ("pallas_bf16_vs_xla_bf16", ("pallas", "bfloat16"), ("xla", "bfloat16")),
)


def decode_all(model, params, z, c, beam_size, chunk):
    """Top-1 beam decode in `chunk`-sized dispatches; returns host arrays
    (tokens [N, T+1] int32, final scores [N] f32)."""
    toks, scs = [], []
    for i in range(0, z.shape[0], chunk):
        h, s = beam_mod.beam_search(model, params, z[i:i + chunk],
                                    c[i:i + chunk], beam_size=beam_size,
                                    n_best=1)
        toks.append(np.asarray(h[:, 0]))
        scs.append(np.asarray(s[:, 0], np.float32))
    return np.concatenate(toks), np.concatenate(scs)


def _uniques(tokens):
    """Unique decoded sequences under the pipeline's dedup key (stripped
    residue content, pipeline.canonical_keys)."""
    from controlled_peptide_generation_tpu.pipeline import canonical_keys
    return len(set(canonical_keys(tokens)))


def main(argv=None):
    extra = [
        ("--n", dict(type=int, default=20000,
                     help="prior samples (campaign-scale default: the "
                          "round-4 tape scramble was invisible at 2048)")),
        ("--beam_size", dict(type=int, default=5)),
        ("--chunk", dict(type=int, default=25000,
                         help="decode dispatch size (production "
                              "beam_chunk default)")),
        ("--key", dict(type=int, default=0, help="PRNG key for z,c draw")),
        ("--update-details", dict(action="store_true", default=False)),
    ]
    cfg, args, _ = C.parse_and_finalize(argv, extra_args=extra)
    runtime.setup()

    model_path, vocab_path, _ = get_model_and_vocab_path(cfg)
    vocab = Vocab.load(vocab_path)
    model, params = load_trained_model(model_path, vocab.size(), cfg)
    runtime.wait_first_transfer()

    kz, kc = jax.random.split(jax.random.PRNGKey(args.key))
    z32 = model.sample_z_prior(kz, args.n)
    c32 = model.sample_c_prior(kc, args.n)

    runs = {}
    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        p = params if dt_name == "float32" else nn.cast_tree(params, dt)
        z, c = z32.astype(dt), c32.astype(dt)
        for path, flag in (("xla", False), ("pallas", True)):
            beam_mod.set_pallas_beam(flag)
            jax.clear_caches()
            runs[(path, dt_name)] = decode_all(model, p, z, c,
                                               args.beam_size, args.chunk)
    beam_mod.set_pallas_beam(None)

    out = {
        "protocol": {
            "run": cfg.runname, "model": os.path.basename(model_path),
            "n": args.n, "beam_size": args.beam_size, "key": args.key,
            "backend": jax.default_backend(),
            "pallas_mode": ("hardware"
                            if jax.default_backend() == "tpu"
                            else "interpret (bit-exact by construction)"),
        },
    }
    for name, a, b in PAIRS:
        ta, sa = runs[a]
        tb, sb = runs[b]
        differ = (ta != tb).any(axis=1)
        d = np.abs(sa - sb)[differ]
        # uniqueness parity: near-tie flips leave the unique-sequence
        # yield ~equal; a systematic collapse (uniq_ratio well below 1)
        # is the campaign-quality failure mode pct_differ alone missed
        ua, ub = _uniques(ta), _uniques(tb)
        out[name] = {
            "pct_differ": round(100.0 * float(differ.mean()), 2),
            "median_score_d": (round(float(np.median(d)), 4)
                               if differ.any() else 0.0),
            "max_score_d": (round(float(d.max()), 4)
                            if differ.any() else 0.0),
            "uniq_a": ua, "uniq_b": ub,
            "uniq_ratio": round(ua / max(ub, 1), 4),
        }
    print(json.dumps(out), flush=True)

    if args.update_details:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_DETAILS.json")
        with open(path) as fh:
            details = json.load(fh)
        details["divergence"] = out
        with open(path, "w") as fh:
            json.dump(details, fh, indent=1)
        print(f"updated {path} [divergence]", flush=True)


if __name__ == "__main__":
    main()
