"""A/B the whole-scan fused Pallas beam (ops/pallas_beam.py) against the
XLA lax.scan beam at production shapes, with bench.py's device-time
methodology (iters chained inside ONE program, null-dispatch RTT
subtracted) so the tunnel's per-dispatch latency is out of the numbers.

Also REPORTS token equality between the two paths on-device (it does not
assert: on hardware the two paths legitimately differ on near-tie
sentences — tools/beam_divergence.py is the committed protocol that
quantifies that divergence, and tests/test_pallas_beam.py carries the
bit-exactness assertions where they are expected to hold).

Usage: python tools/bench_pallas_beam.py [--fast]
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
from controlled_peptide_generation_tpu.ops import beam as beam_mod
from controlled_peptide_generation_tpu.ops import nn
from controlled_peptide_generation_tpu.utils import runtime


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="one shape (1024/bf16) only")
    ap.add_argument("--blocks", action="store_true",
                    help="sweep the kernel batch tile (BLOCK_B) instead "
                         "of the pallas-vs-xla A/B")
    args = ap.parse_args()
    runtime.setup()
    import bench  # repo-root harness: device_time, flops_beam

    cfg = C.default_config()
    model = build_model(cfg.model, n_vocab=26, max_seq_len=25)
    params = model.init_params(jax.random.PRNGKey(42))
    runtime.wait_first_transfer()

    shapes = [(1024, jnp.bfloat16)] if args.fast else [
        (1024, jnp.bfloat16), (1024, jnp.float32),
        (4096, jnp.bfloat16), (4096, jnp.float32),
        (16384, jnp.bfloat16),
    ]
    peak_f = bench.chip_peaks()[1][0] or 197e12

    if args.blocks:
        from controlled_peptide_generation_tpu.ops import pallas_beam
        for B, dt in ((4096, jnp.bfloat16), (16384, jnp.bfloat16)):
            p = nn.cast_tree(params, dt)

            def body(k, _p=p, _dt=dt, _B=B):
                zz = model.sample_z_prior(k, _B).astype(_dt)
                cc = model.sample_c_prior(jax.random.fold_in(k, 1),
                                          _B).astype(_dt)
                return beam_mod.beam_search(model, _p, zz, cc, beam_size=5,
                                            n_best=1)[0]

            beam_mod.set_pallas_beam(True)
            for blk in (128, 256, 512, 1024):
                jax.clear_caches()
                pallas_beam.set_block_b(blk)
                try:
                    est = bench.device_time(body, 4, reps=2)
                    iters = max(4, min(512, int(1.0 / max(est, 1e-5))))
                    dev_s = bench.device_time(body, iters, reps=4)
                except Exception as e:  # noqa: BLE001 — report and keep sweeping
                    print(f"B={B:>5} blk={blk:>4}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    continue
                fl = bench.flops_beam(cfg, model, B)
                print(f"B={B:>5} blk={blk:>4}: {dev_s*1e3:7.2f} ms "
                      f"({fl/dev_s/1e12:5.1f} TF/s "
                      f"{100*fl/dev_s/peak_f:4.1f}% MFU)", flush=True)
            pallas_beam.set_block_b(128)
            beam_mod.set_pallas_beam(None)
        return

    for B, dt in shapes:
        p = params if dt == jnp.float32 else nn.cast_tree(params, dt)
        kz, kc = jax.random.split(jax.random.PRNGKey(0))
        z = model.sample_z_prior(kz, B).astype(dt)
        c = model.sample_c_prior(kc, B).astype(dt)

        def body(k, _p=p, _dt=dt, _B=B):
            zz = model.sample_z_prior(k, _B).astype(_dt)
            cc = model.sample_c_prior(jax.random.fold_in(k, 1),
                                      _B).astype(_dt)
            return beam_mod.beam_search(model, _p, zz, cc, beam_size=5,
                                        n_best=1)[0]

        res = {}
        for name, flag in (("xla", False), ("pallas", True)):
            jax.clear_caches()
            beam_mod.set_pallas_beam(flag)
            h, s = beam_mod.beam_search(model, p, z, c, beam_size=5,
                                        n_best=1)
            jax.block_until_ready((h, s))
            # calibrate iters so one dispatch holds ~1s of device work —
            # per-dispatch tunnel RTT jitter is tens of ms, so a 2-iter
            # chain at B>=4096 (10-60 ms) measures the tunnel, not the
            # kernel
            est = bench.device_time(body, 4, reps=2)
            iters = max(4, min(512, int(1.0 / max(est, 1e-5))))
            dev_s = bench.device_time(body, iters, reps=4)
            res[name] = (dev_s, np.asarray(h), np.asarray(s))
        beam_mod.set_pallas_beam(None)
        (dx, hx, sx), (dp, hp, sp) = res["xla"], res["pallas"]
        fl = bench.flops_beam(cfg, model, B)
        dtn = np.dtype(dt).name
        print(f"B={B:>5} {dtn:<8}: xla {dx*1e3:7.2f} ms ({fl/dx/1e12:5.1f} "
              f"TF/s {100*fl/dx/peak_f:4.1f}% MFU) | pallas {dp*1e3:7.2f} ms "
              f"({fl/dp/1e12:5.1f} TF/s {100*fl/dp/peak_f:4.1f}% MFU) | "
              f"speedup {dx/dp:4.2f}x | tokens_equal="
              f"{np.array_equal(hx, hp)} score_maxdiff="
              f"{np.abs(sx - sp).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
