#!/usr/bin/env python
"""Phase-1 driver (reference: main.py): config parse/save, seeding, data,
model init/load, WAE/VAE training, final prior sampling, result.json export.

Usage mirrors the reference:
    python main.py --tiny 1 --phase 1
    python main.py --phase 1 --vae.batch_size 64 --runname myrun
"""

import logging
import os
import sys
from os.path import join as pjoin

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

from controlled_peptide_generation_tpu import config as C  # noqa: E402
from controlled_peptide_generation_tpu.utils import runtime as _rt  # noqa: E402
_rt.setup()
from controlled_peptide_generation_tpu.data import AttributeDataLoader  # noqa: E402
from controlled_peptide_generation_tpu.data import synthetic  # noqa: E402
from controlled_peptide_generation_tpu.models import build_model  # noqa: E402
from controlled_peptide_generation_tpu.train import train_vae, checkpoints  # noqa: E402
from controlled_peptide_generation_tpu.train.train_full import train_full  # noqa: E402
from controlled_peptide_generation_tpu.generation import generate_sentences  # noqa: E402
from controlled_peptide_generation_tpu.utils import logging as tblog  # noqa: E402
from controlled_peptide_generation_tpu.utils.io import (  # noqa: E402
    write_gen_samples, write_fasta)
from controlled_peptide_generation_tpu.api import (  # noqa: E402
    generate_interpolated_samples)

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(levelname)s(%(name)s): %(message)s")
log = logging.getLogger("main")


def load_dataset(cfg):
    spec = C.dataset_spec(cfg)
    gen_kwargs = spec.pop("synthetic", None)
    if gen_kwargs:
        synthetic.ensure(spec["data_path"], **gen_kwargs)
    return AttributeDataLoader(mbsize=cfg.vae.batch_size,
                               max_seq_len=cfg.max_seq_len, **spec)


def write_phase2_artifacts(cfg, model, params, dataset, n=32):
    """Controlled-generation artifact battery at the cfg.full result paths
    (the reference defines these filenames, cfg.py:130-134, but its released
    code never reaches phase 2 to write them):

    * samez: the SAME latent decoded under c=0 vs c=1 — attribute control;
    * posz: decodes of encoder means of amp-positive training rows;
    * interp: tanh interpolation between two prior latents;
    * fasta for the generated and positive-conditioned samples.
    """
    import jax.numpy as jnp
    key = jax.random.PRNGKey(cfg.seed + 3)

    # same z, both attribute codes
    z = model.sample_z_prior(jax.random.fold_in(key, 0), n)
    lines = []
    for c_val in (0, 1):
        c = np.zeros((n, model.c_dim), np.float32)
        c[:, c_val] = 1.0
        seqs, _, _ = generate_sentences(model, params,
                                        jax.random.fold_in(key, 1 + c_val),
                                        n, z=z, c=jnp.asarray(c),
                                        sample_mode="greedy")
        sents = dataset.idx2sentences(np.asarray(seqs), False)
        lines.extend(f"c={c_val}: {s}" for s in sents)
    write_gen_samples(lines, cfg.full.samez_samples_path)

    # decodes of amp-positive encoder means
    pos_ix = dataset.get_subset_indices("amp=amp_posc,amp_posnc")
    if len(pos_ix):
        batch = dataset._make_batch(pos_ix[:n])
        mu, _ = model.encode(params, jnp.asarray(batch.text))
        seqs, _, _ = generate_sentences(model, params,
                                        jax.random.fold_in(key, 5),
                                        mu.shape[0], z=mu,
                                        sample_mode="greedy")
        sents = dataset.idx2sentences(np.asarray(seqs), False)
        write_gen_samples(sents, cfg.full.posz_samples_path)
        write_fasta(sents, cfg.full.fasta_pos_samples_path)

    # interpolation between two prior latents (via the inference API's
    # interpolation path so CLI artifacts and API can't drift apart)
    za = model.sample_z_prior(jax.random.fold_in(key, 6), 1)
    zb = model.sample_z_prior(jax.random.fold_in(key, 7), 1)
    res = generate_interpolated_samples(
        model, params, dataset.vocab, za, zb,
        interpolation_method="tanh", interpolation_samples=9,
        key=jax.random.fold_in(key, 8), sample_mode="greedy",
        print_special_tokens=False)
    write_gen_samples(
        [f"w={w:.2f}: {' '.join(p[0])}"
         for w, p in zip(res["interpolation"], res["predictions"])],
        cfg.full.interp_samples_path)

    gen_sents = None
    if os.path.exists(cfg.full.gen_samples_path):
        with open(cfg.full.gen_samples_path) as fh:
            gen_sents = [ln for ln in fh.read().splitlines()
                         if not ln.startswith("label:")]
        write_fasta(gen_sents, cfg.full.fasta_gen_samples_path)
    log.info("phase-2 artifacts written under %s", cfg.savepath)


def main(argv=None):
    cfg, args, overrides = C.parse_and_finalize(argv)
    C.save_config(overrides, cfg, cfg.savepath)
    C.pretty_print(cfg)

    log.info("JAX devices: %s", jax.devices())
    log.info("Random seed: %s", cfg.seed)
    np.random.seed(cfg.seed)

    result_json = (pjoin(cfg.savepath, "result.json")
                   if cfg.resume_result_json else None)
    tblog.reset()
    logger = tblog.configure(cfg.tbpath, result_json)

    dataset = load_dataset(cfg)
    dataset.print_stats(out=log.info)
    dataset.vocab.save(cfg.vocab_path)

    model = build_model(cfg.model, n_vocab=dataset.n_vocab,
                        max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(cfg.seed))
    log.info("Model: %s", model)

    if cfg.phase in (1, -1):
        params, _, steps_per_sec = train_vae(cfg, model, dataset, params,
                                             logger)
        log.info("train throughput: %.2f steps/sec", steps_per_sec)

        log.info("Evaluating base vae...")
        samples, _, _ = generate_sentences(
            model, params, jax.random.PRNGKey(cfg.seed + 1),
            cfg.evals.sample_size, sample_mode="categorical")
        sents = dataset.idx2sentences(np.asarray(samples), False)
        write_gen_samples(sents, cfg.vae.gen_samples_path)
        write_fasta(sents, cfg.vae.fasta_gen_samples_path)

    if cfg.phase in (2, -1):
        # phase-2 controlled-generation training. When running phase 2
        # standalone, finalize() resolved loadpath to the phase-1
        # checkpoint; with phase=-1 the trained params carry over directly
        if cfg.phase == -1:
            cfg.loadpath = ""
        params, steps_per_sec = train_full(cfg, model, dataset, params,
                                           logger)
        log.info("full-phase throughput: %.2f steps/sec", steps_per_sec)
        samples, _, c_ix = generate_sentences(
            model, params, jax.random.PRNGKey(cfg.seed + 2),
            cfg.evals.sample_size, sample_mode="categorical")
        write_gen_samples(
            dataset.idx2sentences(np.asarray(samples), False),
            cfg.full.gen_samples_path, c_lab=np.asarray(c_ix))
        write_phase2_artifacts(cfg, model, params, dataset)

    log.info("saving result.json and vae_result.json at %s", cfg.savepath)
    logger.export_to_json(pjoin(cfg.savepath, "result.json"))
    logger.export_to_json(pjoin(cfg.savepath, "vae_result.json"),
                          it_filter=lambda k, v: k <= cfg.vae.n_iter)
    return cfg


if __name__ == "__main__":
    main()
