#!/usr/bin/env python
"""Batch-shape invariance guard for the fused Pallas beam (and the
committed repro protocol for the 3D-tape scramble it guards against).

THE BUG (toolchain miscompile, worked around in ops/pallas_beam.py):
with the kernel's per-step emission tapes emitted as [T, Bpad, K]
outputs (one (T, Bt, K) window per grid step), the production beam
program silently scrambled the token/backpointer tapes at specific
batch shapes — B = 6144, 12288, 20000 (block_b=128) — while being
correct at 2048..4128, 8192, 16384(+pad). Signature, measured on v5e
(2026-08-20, this protocol):

  * ~99.9% of top-1 token rows differed from the SAME inputs decoded at
    a safe batch shape, with the final scores BIT-IDENTICAL — tokens
    scrambled, score outputs intact;
  * the 2D [Bpad, K]/[Bpad, 1] outputs (scores/adv/fin) of the very
    same broken call were bit-exact;
  * a standalone jit of the identical kernel at the identical breaking
    B was bit-exact — the corruption needs the full surrounding
    program, implicating layout assignment at the pallas_call boundary,
    not the kernel;
  * downstream effect: unique-sequence yield collapsed ~3x in CLaSS
    campaigns (50k-candidate rounds decode in 25k slices — deep inside
    the broken regime), the round-4 "53% duplicates" incident.

THE FIX: ops/pallas_beam.py now emits every output 2D batch-tiled
([Bpad, T*K] tapes, lane t*K+k), the empirically safe family. The
pre-fix kernel is the parent of the commit introducing this file.

THIS TOOL asserts, on hardware, that top-1 beam outputs for the same
(z, c) are BIT-IDENTICAL when decoded at every probed batch size —
exactly the invariance the bug broke. Nonzero exit on violation.

    python tools/repro_tape_scramble.py \
        --config_json output/flagship3/config_overrides.json

Reference semantics at stake: /root/reference/models/Beam.py:56-122 via
the decode stage /root/reference/sample_pipeline.py:129-139.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import numpy as np

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.api import (load_trained_model,
                                                   get_model_and_vocab_path)
from controlled_peptide_generation_tpu.data.vocab import Vocab
from controlled_peptide_generation_tpu.ops import beam as beam_mod
from controlled_peptide_generation_tpu.utils import runtime

# breaking shapes of record plus safe anchors (block_b=128)
SIZES = (2048, 6144, 8192, 12288, 20000)


def main(argv=None):
    extra = [
        ("--beam_size", dict(type=int, default=5)),
        ("--key", dict(type=int, default=0)),
    ]
    cfg, args, _ = C.parse_and_finalize(argv, extra_args=extra)
    runtime.setup()
    model_path, vocab_path, _ = get_model_and_vocab_path(cfg)
    vocab = Vocab.load(vocab_path)
    model, params = load_trained_model(model_path, vocab.size(), cfg)
    runtime.wait_first_transfer()

    n = max(SIZES)
    kz, kc = jax.random.split(jax.random.PRNGKey(args.key))
    z = model.sample_z_prior(kz, n)
    c = model.sample_c_prior(kc, n)

    beam_mod.set_pallas_beam(True)
    try:
        outs = {}
        for B in SIZES:
            h, s = beam_mod.beam_search(model, params, z[:B], c[:B],
                                        beam_size=args.beam_size, n_best=1)
            outs[B] = (np.asarray(h[:, 0]), np.asarray(s[:, 0]))
    finally:
        beam_mod.set_pallas_beam(None)
        jax.clear_caches()

    ref_B = max(SIZES)
    ref_t, ref_s = outs[ref_B]
    report, bad = {}, False
    for B in SIZES:
        t, s = outs[B]
        tok_mismatch = int((t != ref_t[:B]).any(axis=1).sum())
        sc_mismatch = int((s != ref_s[:B]).sum())
        report[B] = {"token_rows_mismatched": tok_mismatch,
                     "score_rows_mismatched": sc_mismatch}
        bad |= bool(tok_mismatch or sc_mismatch)
    print(json.dumps({"backend": jax.default_backend(),
                      "beam_size": args.beam_size,
                      "reference_batch": ref_B, "sizes": report,
                      "ok": not bad}), flush=True)
    if bad:
        print("FAIL: beam outputs are batch-shape dependent "
              "(tape scramble regression)", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
