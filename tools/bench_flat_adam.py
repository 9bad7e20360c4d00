"""A/B the flat-vector Adam (train/opt.py, --hw.flat_optimizer) against
the optax reference chain on the full phase-1 train step, with bench.py's
device-time methodology (unroll-50 chunks chained without intermediate
syncs, null-dispatch RTT subtracted).

Motivation (BENCH.md "fused Pallas train"): the b32 step is
latency-bound — the ablation puts grad+adam at ~193 us of a ~211 us
step, with adam's per-leaf optax kernels a meaningful slice. Raveling
the ~0.5M-param tree turns clip+adam into ~four large VPU ops and one
reduction. This tool measures whether that wins end-to-end.

Trajectory equivalence is asserted in tests/test_flat_opt.py (same math
up to float re-association); the post-chain loss delta printed here is
the on-hardware sanity echo of that.

Usage: python tools/bench_flat_adam.py [--fast]
"""

import argparse
import os
import sys

# repo root (package + bench.py) AND tools/ (bench_pallas_train import):
# the latter is only implicitly on sys.path when invoked as
# `python tools/bench_flat_adam.py`; inserting it explicitly keeps
# `python -m` and out-of-tree invocations working too
_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

import jax
import jax.numpy as jnp

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.train import opt as opt_mod
from controlled_peptide_generation_tpu.utils import runtime
from bench_pallas_train import time_chunks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="batch 32 only")
    args = ap.parse_args()
    runtime.setup()
    import bench  # repo-root harness: chip_peaks, flops_train_step

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    model = build_model(cfg.model, n_vocab=26, max_seq_len=25)
    params = model.init_params(jax.random.PRNGKey(42))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    runtime.wait_first_transfer()
    peak_f = bench.chip_peaks()[1][0] or 197e12
    rtt = bench._null_rtt()
    print(f"null-dispatch RTT: {rtt * 1e3:.1f} ms (subtracted)",
          flush=True)

    for B in ((32,) if args.fast else (32, 256, 1024)):
        res = {}
        for name, flag in (("optax", False), ("flat", True)):
            opt_mod.set_flat_optimizer(flag)
            jax.clear_caches()
            res[name] = time_chunks(cfg, model, params, rf, B, rtt,
                                    bench)
        opt_mod.set_flat_optimizer(None)
        (dx, lx), (df, lf) = res["optax"], res["flat"]
        fl = bench.flops_train_step(cfg, model, B)
        print(f"B={B:>5}: optax {dx*1e6:8.1f} us/step ({fl/dx/1e12:5.2f} "
              f"TF/s {100*fl/dx/peak_f:5.2f}% MFU) | flat "
              f"{df*1e6:8.1f} us/step ({fl/df/1e12:5.2f} TF/s "
              f"{100*fl/df/peak_f:5.2f}% MFU) | speedup {dx/df:5.2f}x | "
              f"loss_after_50 optax={lx:.4f} flat={lf:.4f}", flush=True)


if __name__ == "__main__":
    main()
