#!/usr/bin/env python
"""Reproduce the >25k-sentence beam-kernel TPU backend fault.

On this toolchain (jax on the experimental ``axon`` TPU v5e platform), a
single batched beam-search program over more than ~25k sentences fails at
RUN time with a deterministic "TPU device error" (the compile succeeds).
The production CLaSS pipeline sidesteps it by decoding in
``<=beam_chunk``-sentence slices inside one program
(controlled_peptide_generation_tpu/latent/fused.py, default 25,000); the
sliced branch is covered by tests/test_fusion.py::
test_beam_chunk_slicing_is_bit_exact.

Usage (defaults reproduce the fault on one v5e chip):

    python tools/repro_beam_fault.py              # 30,000 sentences: FAULTS
    python tools/repro_beam_fault.py --n 25000    # at the chunk bound: OK
    python tools/repro_beam_fault.py --n 30000 --chunk 25000   # sliced: OK

The workload is exactly the pipeline's decode stage: the reference-shape
GRU decoder (z=100, emb=150, dec h=102, vocab 26, T=25; reference
cfg.py:258-300) under beam_size=5 — i.e. 5*n active lanes. Exit status 0
means every requested shape ran; the fault surfaces as a RuntimeError/
XlaRuntimeError whose message is printed and re-raised.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from controlled_peptide_generation_tpu import config as C     # noqa: E402
from controlled_peptide_generation_tpu.models import build_model  # noqa: E402
from controlled_peptide_generation_tpu.ops.beam import beam_search  # noqa: E402


def run(n, chunk, beam_size, dtype):
    cfg = C.default_config()
    model = build_model(cfg.model, n_vocab=26, max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    if dtype != "float32":
        from controlled_peptide_generation_tpu.ops import nn
        params = nn.cast_tree(params, jnp.dtype(dtype))

    @jax.jit
    def program(key):
        z = jax.random.normal(key, (n, model.z_dim), jnp.dtype(dtype))
        c = model.sample_c_prior(jax.random.fold_in(key, 1), n).astype(
            jnp.dtype(dtype))
        if chunk and n > chunk:
            parts = [beam_search(model, params, z[s:s + chunk],
                                 c[s:s + chunk], beam_size=beam_size,
                                 n_best=1)
                     for s in range(0, n, chunk)]
            return jnp.concatenate([p[0] for p in parts])
        return beam_search(model, params, z, c, beam_size=beam_size,
                           n_best=1)[0]

    print(f"devices: {jax.devices()}")
    print(f"beam program: n={n} sentences x beam {beam_size} "
          f"({n * beam_size} lanes), dtype={dtype}, "
          f"chunk={chunk or 'none (single kernel)'}")
    t0 = time.time()
    try:
        out = jax.block_until_ready(program(jax.random.PRNGKey(7)))
    except Exception as e:  # noqa: BLE001 — the fault class varies
        print(f"FAULT after {time.time() - t0:.1f}s: "
              f"{type(e).__name__}: {str(e)[:500]}")
        raise
    print(f"OK: tokens {out.shape} in {time.time() - t0:.1f}s "
          f"(includes compile)")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=30000,
                    help="sentences in ONE beam program (default 30000, "
                         "which faults on this toolchain)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="slice the decode into <=chunk-sentence "
                         "beam_search calls inside the same program "
                         "(0 = single kernel, the faulting configuration)")
    ap.add_argument("--beam_size", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()
    run(args.n, args.chunk, args.beam_size, args.dtype)


if __name__ == "__main__":
    main()
