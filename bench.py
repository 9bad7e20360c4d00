#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): CLaSS accepted samples/sec — the full
phase-2 loop at reference workload shapes (rounds of 5000 latents, mogQ with
100 diag components in z_dim=100, two attribute classifiers, beam-5 decode
of every candidate in 1024-chunks, until >=100 accepted).

Also measured (printed to stderr, recorded in BENCH_DETAILS.json):
  - WAE train steps/sec at batch 32 (phase-1 loop, reference cfg),
  - beam-decode sequences/sec (1024 x beam 5).

Baselines: measured on this container's host CPU via the same workload
driven by this script with --platform cpu (the reference's own torch-0.3
stack is not installable here; our CPU path is strictly faster than the
reference's per-sentence python beam loop, so vs_baseline is conservative).
See BASELINE.md for the recorded numbers.
"""

import argparse
import json
import logging
import sys
import time

logging.basicConfig(level=logging.WARNING)

# measured via `python bench.py --platform cpu --all` on this host
# (1-core CPU, see BASELINE.md). Conservative stand-ins for the reference.
CPU_BASELINE = {
    "class_accepted_samples_per_sec": 2.02,
    "wae_train_steps_per_sec": 8.93,
    "beam_decode_seqs_per_sec": 347.0,
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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
    from controlled_peptide_generation_tpu.ops import losses as L
    from controlled_peptide_generation_tpu.train import make_train_step

    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    step, opt = make_train_step(model, cfg.vae, cfg.losses, rf, donate=True)
    opt_state = opt.init(params)

    # pre-draw a pool of batches (host batch assembly is a fancy-index
    # gather; the loop still pays a fresh H2D transfer per step)
    rng = jax.random.PRNGKey(2)
    pool = jax.random.randint(rng, (16, batch_size, model.max_seq_len),
                              4, model.n_vocab, jnp.int32)
    pool = pool.at[:, :, 0].set(2)
    pool = pool.at[:, :, 12].set(3)
    import numpy as np
    pool_np = np.asarray(pool)

    p, o = params, opt_state
    for i in range(3):  # warmup/compile
        p, o, m = step(p, o, jax.random.fold_in(rng, i),
                       jnp.asarray(pool_np[0]), jnp.asarray(i, jnp.int32))
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for i in range(n_steps):
        p, o, m = step(p, o, jax.random.fold_in(rng, 100 + i),
                       jnp.asarray(pool_np[i % 16]),
                       jnp.asarray(i, jnp.int32))
    jax.block_until_ready(p)
    return n_steps / (time.perf_counter() - t0)


def bench_beam(cfg, model, params, chunk=1024, n_chunks=4, beam_size=5):
    import jax
    from controlled_peptide_generation_tpu.ops.beam import beam_search

    key = jax.random.PRNGKey(3)
    z = model.sample_z_prior(key, chunk)
    c = model.sample_c_prior(key, chunk)
    hyps, _ = beam_search(model, params, z, c, beam_size=beam_size,
                          n_best=1)  # compile
    jax.block_until_ready(hyps)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        z = model.sample_z_prior(jax.random.fold_in(key, i), chunk)
        c = model.sample_c_prior(jax.random.fold_in(key, 100 + i), chunk)
        hyps, _ = beam_search(model, params, z, c, beam_size=beam_size,
                              n_best=1)
    jax.block_until_ready(hyps)
    return (chunk * n_chunks) / (time.perf_counter() - t0)


def bench_class(cfg, model, params, n_per_round=5000, min_accepted=100,
                n_components=100):
    """Full CLaSS loop at reference workload: mogQ fit excluded (setup),
    rejection + beam decode of ALL candidates + accept bookkeeping timed."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu.latent import density, logreg
    from controlled_peptide_generation_tpu.ops.beam import beam_search

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

    # compile both stages once (excluded from timing)
    z, _, acc = Q.rejection_sample(key, n_per_round)
    zc = z[:1024]
    hyps, _ = beam_search(model, params, zc,
                          model.sample_c_prior(key, 1024), beam_size=5,
                          n_best=1)
    jax.block_until_ready(hyps)

    accepted = 0
    rounds = 0
    t0 = time.perf_counter()
    while accepted < min_accepted:
        rounds += 1
        kr = jax.random.fold_in(key, rounds)
        z, scores, accept = Q.rejection_sample(kr, n_per_round)
        # decode ALL candidates in fixed 1024 chunks (reference semantics)
        for s in range(0, n_per_round, 1024):
            zc = z[s:s + 1024]
            pad = 1024 - zc.shape[0]
            if pad:
                zc = jnp.pad(zc, ((0, pad), (0, 0)))
            c = model.sample_c_prior(jax.random.fold_in(kr, s), 1024)
            hyps, _ = beam_search(model, params, zc, c, beam_size=5,
                                  n_best=1)
        hyps.block_until_ready()
        accepted += int(jnp.sum(accept))
    dt = time.perf_counter() - t0
    log(f"CLaSS: {accepted} accepted in {rounds} rounds "
        f"({rounds * n_per_round} decoded) in {dt:.2f}s")
    return accepted / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--all", action="store_true",
                    help="run all three metrics")
    ap.add_argument("--fast", action="store_true",
                    help="smaller round sizes (CI smoke)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    log(f"devices: {jax.devices()}")
    cfg, model, params = build()

    details = {}
    kw = dict(n_per_round=1000, min_accepted=20) if args.fast else {}
    v_class = bench_class(cfg, model, params, **kw)
    details["class_accepted_samples_per_sec"] = v_class
    if args.all:
        details["wae_train_steps_per_sec"] = bench_train(
            cfg, model, params, n_steps=30 if args.fast else 100)
        details["beam_decode_seqs_per_sec"] = bench_beam(
            cfg, model, params, n_chunks=2 if args.fast else 4)
        with open("BENCH_DETAILS.json", "w") as fh:
            json.dump(details, fh, indent=2)
        log(json.dumps(details, indent=2))

    print(json.dumps({
        "metric": "CLaSS accepted samples/sec",
        "value": round(v_class, 3),
        "unit": "accepted samples/sec",
        "vs_baseline": round(
            v_class / CPU_BASELINE["class_accepted_samples_per_sec"], 2),
    }))


if __name__ == "__main__":
    main()
