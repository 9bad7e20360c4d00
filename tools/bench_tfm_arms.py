#!/usr/bin/env python
"""A/B/C the transformer beam arms on hardware (VERDICT r4 item 4).

Three exact implementations of the same beam semantics:

  generic  — the shared lax.scan (ops/beam.py): per-step KV-cache beam
             reorder via take_along_axis per leaf;
  ancestry — no-reorder formulation (ops/beam._beam_search_tfm_anc):
             lanes write their own head-major [B,H,K,S,Dh] caches, a
             [B,K,S] ancestry map + joint (lane,position) softmax does
             exact ancestor selection densely;
  pallas   — whole-scan fused kernel (ops/pallas_tfm_beam.py): the
             entire T-step recurrence in one pallas_call with caches
             resident in VMEM.

All are token-exact vs each other on CPU (tests/test_pallas_tfm_beam
.py); this tool records their hardware throughput under the calibrated
device-time protocol so the default-route policy in ops/beam.py is set
by measurement, not by theory. Measured 2026-08-20 on the v5e (BENCH.md
"transformer beam arms"): all three within ~±10% of 13k seqs/s at
chunk 4096 bf16 — the workload is per-step small-op/copy latency-bound
at these dims (MXU busy 0.1%, tools/profile_tfm_beam.py), so neither
redesign's target (reorder traffic) was the binding constraint.

Usage: python tools/bench_tfm_arms.py [--fast]
"""

import argparse
import os
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))

import jax
import jax.numpy as jnp

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import beam as beam_mod
from controlled_peptide_generation_tpu.ops import nn
from controlled_peptide_generation_tpu.utils import runtime

ARMS = {
    "generic": (False, False),     # (pallas forced, ancestry)
    "ancestry": (False, True),
    "pallas": (True, None),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="chunk 1024 only")
    ap.add_argument("--beam_size", type=int, default=5)
    args = ap.parse_args()
    runtime.setup()
    runtime.start_heartbeat()
    import bench

    cfg = C.default_config()
    cfg.model.E_args.E_class = "transformer"
    cfg.model.G_args.G_class = "transformer"
    model = build_model(cfg.model, n_vocab=26, max_seq_len=25)
    params = model.init_params(jax.random.PRNGKey(0))
    tdec = nn.cast_tree(params, jnp.bfloat16)
    runtime.wait_first_transfer(timeout=900)

    for chunk in ((1024,) if args.fast else (1024, 4096)):
        for name, (pl, anc) in ARMS.items():
            beam_mod.set_pallas_beam(pl)
            beam_mod.set_tfm_anc(anc)
            jax.clear_caches()

            def body(k, _c=chunk):
                z = model.sample_z_prior(k, _c).astype(jnp.bfloat16)
                c = model.sample_c_prior(jax.random.fold_in(k, 1),
                                         _c).astype(jnp.bfloat16)
                return beam_mod.beam_search(
                    model, tdec, z, c, beam_size=args.beam_size,
                    n_best=1)[0]

            runtime.set_phase(f"{name} {chunk}")
            dev_s = bench.calibrated_device_time(body, target_s=1.0,
                                                 reps=2)
            print(f"{name:9s} chunk={chunk}: {dev_s * 1e3:8.2f} ms -> "
                  f"{chunk / dev_s:10,.0f} seqs/s", flush=True)
    beam_mod.set_pallas_beam(None)
    beam_mod.set_tfm_anc(None)


if __name__ == "__main__":
    main()
