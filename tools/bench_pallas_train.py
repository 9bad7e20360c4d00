"""A/B the fused whole-scan Pallas GRU train path (ops/pallas_gru.py,
routed by --hw.pallas_train) against the XLA lax.scan train path at the
reference batch (32) and along the sweep to the knee, with bench.py's
device-time methodology: unroll-50 chunk steps chained WITHOUT
intermediate syncs, chain calibrated to hold ~1s of device work,
null-dispatch RTT subtracted. Workload being measured: the full phase-1
WAE train step (fwd + bwd + adam), reference train_vae.py:13-42 at
cfg.py:172-176 shapes.

Gradient equivalence between the two arms is asserted separately in
tests/test_pallas_gru.py (interpret mode bit-level on CPU) and reported
here as the post-chain loss delta (the arms re-associate float adds, so
deltas at 1e-3 scale after 50 steps are expected float noise, not
divergence).

Usage: python tools/bench_pallas_train.py [--fast] [--blocks]
  --fast    batch 32 only
  --blocks  sweep the kernel batch tile (pallas_gru.BLOCK_B) with the
            Pallas route forced on, instead of the pallas-vs-xla A/B
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import gru as gru_mod
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.ops import pallas_gru
from controlled_peptide_generation_tpu.train.train_vae import (
    make_train_scan)
from controlled_peptide_generation_tpu.utils import runtime

UNROLL = 50


def time_chunks(cfg, model, params, rf, B, rtt, bench):
    """Device seconds per TRAIN STEP (not per chunk) for the current
    gru route, bench_mfu's chained protocol."""
    chunk_step, opt = make_train_scan(model, cfg.vae, cfg.losses, rf,
                                      UNROLL, donate=True)
    p = jax.tree.map(jnp.copy, params)
    o = opt.init(p)
    text = jax.random.randint(jax.random.PRNGKey(2),
                              (UNROLL, B, model.max_seq_len), 4,
                              model.n_vocab, jnp.int32)
    text = text.at[..., 0].set(2).at[..., 12].set(3)
    p, o, aux = chunk_step(p, o, jax.random.PRNGKey(3), text,
                           jnp.asarray(0, jnp.int32))
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    p, o, aux = chunk_step(p, o, jax.random.PRNGKey(5), text,
                           jnp.asarray(0, jnp.int32))
    jax.block_until_ready(p)
    n_disp = max(2, min(64, int(1.0 / max(time.perf_counter() - t0,
                                          1e-4))))
    walls = []
    for rep in range(3):
        t0 = time.perf_counter()
        for r in range(n_disp):
            p, o, aux = chunk_step(p, o, jax.random.fold_in(
                jax.random.PRNGKey(3), rep * n_disp + r), text,
                jnp.asarray(r, jnp.int32))
        jax.block_until_ready(p)
        walls.append(time.perf_counter() - t0)
    probe = aux.get("loss", jax.tree.leaves(aux)[0]) if isinstance(
        aux, dict) else jax.tree.leaves(aux)[0]
    loss = float(np.asarray(probe).ravel()[-1])
    return max(min(walls) - rtt, 1e-9) / (n_disp * UNROLL), loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="batch 32 only")
    ap.add_argument("--blocks", action="store_true",
                    help="sweep pallas_gru.BLOCK_B (pallas forced on)")
    args = ap.parse_args()
    runtime.setup()
    import bench  # repo-root harness: chip_peaks, flops_train_step

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)  # finalize's shared->vae injection
    model = build_model(cfg.model, n_vocab=26, max_seq_len=25)
    params = model.init_params(jax.random.PRNGKey(42))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    runtime.wait_first_transfer()
    peak_f = bench.chip_peaks()[1][0] or 197e12
    rtt = bench._null_rtt()
    print(f"null-dispatch RTT: {rtt * 1e3:.1f} ms (subtracted)",
          flush=True)

    if not pallas_gru.applicable(model.h_dec, jnp.float32):
        print(f"pallas_gru not applicable at h_dec={model.h_dec}; "
              "nothing to A/B")
        return

    batches = (32,) if args.fast else (32, 256, 1024)

    if args.blocks:
        gru_mod.set_pallas_train(True)
        for B in batches:
            for blk in (16, 32, 64, 128, 256):
                if blk > -(-B // 16) * 16:
                    continue
                jax.clear_caches()
                pallas_gru.set_block_b(blk)
                try:
                    dev_s, _ = time_chunks(cfg, model, params, rf, B,
                                           rtt, bench)
                except Exception as e:  # noqa: BLE001 — report, keep sweeping
                    print(f"B={B:>5} blk={blk:>4}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    continue
                fl = bench.flops_train_step(cfg, model, B)
                print(f"B={B:>5} blk={blk:>4}: {dev_s*1e6:8.1f} us/step "
                      f"({fl/dev_s/1e12:5.2f} TF/s "
                      f"{100*fl/dev_s/peak_f:5.2f}% MFU, "
                      f"{B/dev_s:9.0f} seqs/s)", flush=True)
        pallas_gru.set_block_b(64)
        gru_mod.set_pallas_train(None)
        return

    for B in batches:
        res = {}
        for name, flag in (("xla", False), ("pallas", True)):
            gru_mod.set_pallas_train(flag)
            jax.clear_caches()
            res[name] = time_chunks(cfg, model, params, rf, B, rtt,
                                    bench)
        gru_mod.set_pallas_train(None)
        (dx, lx), (dp, lp) = res["xla"], res["pallas"]
        fl = bench.flops_train_step(cfg, model, B)
        print(f"B={B:>5}: xla {dx*1e6:8.1f} us/step ({fl/dx/1e12:5.2f} "
              f"TF/s {100*fl/dx/peak_f:5.2f}% MFU) | pallas "
              f"{dp*1e6:8.1f} us/step ({fl/dp/1e12:5.2f} TF/s "
              f"{100*fl/dp/peak_f:5.2f}% MFU) | speedup {dx/dp:5.2f}x | "
              f"loss_after_50 xla={lx:.4f} pallas={lp:.4f}", flush=True)


if __name__ == "__main__":
    main()
