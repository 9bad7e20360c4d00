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
from controlled_peptide_generation_tpu.utils.io import write_gen_samples  # noqa: E402

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(levelname)s(%(name)s): %(message)s")
log = logging.getLogger("main")


def load_dataset(cfg):
    spec = C.dataset_spec(cfg)
    if spec.pop("synthetic", False):
        synthetic.ensure(spec["data_path"])
    return AttributeDataLoader(mbsize=cfg.vae.batch_size,
                               max_seq_len=cfg.max_seq_len, **spec)


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
        write_gen_samples(
            dataset.idx2sentences(np.asarray(samples), False),
            cfg.vae.gen_samples_path)

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

    log.info("saving result.json and vae_result.json at %s", cfg.savepath)
    logger.export_to_json(pjoin(cfg.savepath, "result.json"))
    logger.export_to_json(pjoin(cfg.savepath, "vae_result.json"),
                          it_filter=lambda k, v: k <= cfg.vae.n_iter)
    return cfg


if __name__ == "__main__":
    main()
