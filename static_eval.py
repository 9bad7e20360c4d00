#!/usr/bin/env python
"""Static evaluation harness (reference: static_eval.py).

Manual eval battery on a trained model: interpolations (linear/tanh/slerp),
sampling-mode sweep, reconstruction (incl. beam 15 with 4 z-samples), and
reconstruction-interpolation. --long additionally dumps latent states and
runs the t-SNE / latent-discriminator analysis.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from controlled_peptide_generation_tpu import config as C  # noqa: E402
from controlled_peptide_generation_tpu.utils import runtime as _rt  # noqa: E402
_rt.setup()
from controlled_peptide_generation_tpu.api import (  # noqa: E402
    load_trained_model, load_vocab, generate_interpolated_samples,
    interpolate_peptides, recon_sequence, sample_from_model,
    pretty_print_samples, get_model_and_vocab_path, get_result_for_model)
from controlled_peptide_generation_tpu.data import (  # noqa: E402
    AttributeDataLoader)
from controlled_peptide_generation_tpu.vis import build_index  # noqa: E402

logging.basicConfig(
    format="%(asctime)s %(message)s",
    datefmt="%m/%d/%Y %I:%M:%S %p",
    level=logging.INFO)
LOG = logging.getLogger("GenerationAPI")

DEFAULT_SEQS = ("M T G E I D T A M L I G G I E F F L K "
                "F A I Y Y F H E R A W Q L I R, M D K L "
                "I V L K M L N S K L P Y G Q R K P F S L R")


def test_interpolated_peptides(model, params, vocab):
    for interpolation_method in ["linear", "tanh", "slerp"]:
        LOG.info("INTERPOLATING WITH %s METHOD", interpolation_method)
        peps = interpolate_peptides(
            model, params, vocab,
            "M L L L L L A L A L L A L L L A L L L",
            "M S S S S S L A A A L L",
            interpolation_kwargs={
                "c": None, "interpolation_method": interpolation_method,
                "interpolation_samples": 9},
            mb_sample_kwargs={"sample_mode": "greedy"})
        for w, p in zip(peps["interpolation"], peps["predictions"]):
            print(f"{w:.2f}", " ".join(p[0]))


def test_interpolated_z(model, params, vocab):
    key = jax.random.PRNGKey(1)
    z_start = model.sample_z_prior(jax.random.fold_in(key, 0), 1)
    z_end = model.sample_z_prior(jax.random.fold_in(key, 1), 1)
    print("# interpolate between z1, z2 sampled from prior. vary sampling")
    for kwargs in [{"sample_mode": "greedy"},
                   {"sample_mode": "beam", "beam_size": 5, "n_best": 3}]:
        print("### interpolate z1 z2 from prior: ", kwargs)
        samples = generate_interpolated_samples(
            model, params, vocab, z_start, z_end, c=None,
            interpolation_method="tanh", interpolation_samples=11, **kwargs)
        for w, p in zip(samples["interpolation"], samples["predictions"]):
            print("prior_zs - {:6s} - w={:.2f} - {}".format(
                kwargs["sample_mode"], w, " ".join(p[0])))


def test_sampling(model, params, vocab, n_samples=4):
    key = jax.random.PRNGKey(2)
    z_fix = model.sample_z_prior(jax.random.fold_in(key, 0), n_samples)
    c_fix = model.sample_c_prior(jax.random.fold_in(key, 1), n_samples)
    print("# sampled z from prior, varying sample_mode")
    for kwargs in [{"sample_mode": "greedy"},
                   {"sample_mode": "categorical", "temp": 1.0},
                   {"sample_mode": "categorical", "temp": 0.3},
                   {"sample_mode": "beam", "beam_size": 5, "n_best": 3}]:
        payload = sample_from_model(model, params, vocab, z=z_fix, c=c_fix,
                                    n_samples=n_samples, **kwargs)
        print("### prior: ", kwargs)
        print(pretty_print_samples(payload["predictions"]))


def test_reconstruction(model, params, vocab, seqs_arg):
    seqs = [s.strip().split() for s in seqs_arg.split(",")]
    for seq in seqs:
        print("#### reco of", " ".join(seq), "  -- z = mu = max_z q(z|x) ")
        for kw in [{"sample_mode": "greedy"},
                   {"sample_mode": "categorical", "temp": 1.0},
                   {"sample_mode": "categorical", "temp": 0.3},
                   {"sample_mode": "beam", "beam_size": 5, "n_best": 3}]:
            recos = recon_sequence(model, params, vocab, seq,
                                   sample_q="max", c=None, **kw)
            print(pretty_print_samples(recos["predictions"],
                                       print_all_hypotheses=False),
                  kw["sample_mode"])
        print("#### reco  of", " ".join(seq),
              "  -- beam 15, z = 4x sampled q(z|x) ")
        recos = recon_sequence(model, params, vocab, seq, sample_q=4,
                               c=None, sample_mode="beam", beam_size=15,
                               n_best=3)
        print(pretty_print_samples(recos["predictions"],
                                   print_all_hypotheses=False))


def test_reconstruction_interpol(model, params, vocab, seqs_arg):
    seqs = [s.strip().split() for s in seqs_arg.split(",")]
    for seq1, seq2 in zip(seqs[:-1], seqs[1:]):
        print("#### reco interpol start source: ", " ".join(seq1),
              "  -- z = mu = max_z q(z|x), beam 15")
        samples = interpolate_peptides(
            model, params, vocab, seq1, seq2,
            interpolation_kwargs={"c": None, "interpolation_method": "tanh",
                                  "interpolation_samples": 9},
            mb_sample_kwargs={"sample_mode": "beam", "beam_size": 15,
                              "n_best": 3})
        for w, p in zip(samples["interpolation"], samples["predictions"]):
            print(f"recon interpol - w={w:.2f} - {' '.join(p[0])}")
        print("#### reco interpol end source:   ", " ".join(seq2))


def run_long_analysis(cfg, model, params, vocab, base, with_covar=True,
                      with_kde=True):
    fnames = {split: build_index.states_path(base, split, cfg.vae.n_iter)
              for split in ["train", "val", "test"]}
    for k, v in fnames.items():
        LOG.info("Analyzing %s at %s", k, v)
    if not all(os.path.exists(f) for f in fnames.values()):
        LOG.info("Extracting states.")
        spec = C.dataset_spec(cfg)
        spec.pop("synthetic", None)
        dataset = AttributeDataLoader(mbsize=cfg.vae.batch_size,
                                      max_seq_len=cfg.max_seq_len, **spec)
        build_index.extract_from_dataset(model, params, vocab, cfg, dataset,
                                         base, cfg.vae.n_iter,
                                         max_examples=10000)
    else:
        LOG.info("States have already been extracted.")
    # persist the latent index artifact (the reference writes
    # index_{iter}.faiss here, vis/scripts/build_index.py:174-176; this
    # framework's exact-MIPS equivalent is an npz — MIGRATING.md)
    idx_path = build_index.index_path(base, cfg.vae.n_iter)
    if not os.path.exists(idx_path):
        build_index.LatentIndex.from_states(fnames["train"]).save(idx_path)
    import matplotlib
    matplotlib.use("agg")
    from controlled_peptide_generation_tpu.vis import tsne
    attributes = C.dataset_spec(cfg)["attributes"]
    tsne.eval(fnames, attributes)
    # covariance-vs-prior + per-point density diagnostics: the reference
    # shipped these only as commented-out calls (static_eval.py:195);
    # here they are part of the battery (--covar/--kde 0 to skip)
    if with_covar:
        from controlled_peptide_generation_tpu.vis import covar
        frob_pos, frob_unl = covar.eval(fnames)
        LOG.info("Frobenius(Cov_q(z), I): positive %.3f, unlabeled %.3f",
                 frob_pos, frob_unl)
    if with_kde:
        from controlled_peptide_generation_tpu.vis import kde
        kde_fracs = kde.eval(fnames, attributes)
        LOG.info("kde nonzero-density fractions: %s", kde_fracs)


def main(argv=None):
    extra = [
        ("--seqs", dict(default=DEFAULT_SEQS,
                        help="comma separated seqs to reconstruct between")),
        ("--long", dict(action="store_true", default=False,
                        help="state dump + t-SNE/latent discriminator"
                             " + covar/kde diagnostics")),
        ("--covar", dict(type=int, default=1,
                         help="with --long: Cov_q(z)-vs-identity plots")),
        ("--kde", dict(type=int, default=1,
                       help="with --long: per-point density diagnostics")),
    ]
    cfg, args, _ = C.parse_and_finalize(argv, extra_args=extra)
    model_path, vocab_path, base = get_model_and_vocab_path(cfg)
    vocab = load_vocab(vocab_path)
    model, params = load_trained_model(model_path, vocab.size(), cfg)
    np.random.seed(cfg.seed)

    try:
        get_result_for_model(model_path, print_results=True)
    except FileNotFoundError:
        LOG.info("no result.json for this run")

    if args.long:
        run_long_analysis(cfg, model, params, vocab, base,
                          with_covar=bool(args.covar),
                          with_kde=bool(args.kde))

    test_interpolated_peptides(model, params, vocab)
    test_sampling(model, params, vocab, n_samples=4)
    test_interpolated_z(model, params, vocab)
    test_reconstruction(model, params, vocab, args.seqs)
    test_reconstruction_interpol(model, params, vocab, args.seqs)


if __name__ == "__main__":
    LOG.info("Running static eval.")
    main()
