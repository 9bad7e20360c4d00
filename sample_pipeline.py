#!/usr/bin/env python
"""CLaSS sampling CLI (reference: sample_pipeline.py __main__).

Fit Q_xi(z), fit latent attribute classifiers, rejection-sample and
beam-decode until --n_samples_acc accepted peptides exist.

    python sample_pipeline.py --runname myrun --Q_select_amppos 0 \
        --n_samples_per_round 5000 --n_samples_acc 100
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from controlled_peptide_generation_tpu import config as C  # noqa: E402
from controlled_peptide_generation_tpu.utils import runtime as _rt  # noqa: E402
_rt.setup()
from controlled_peptide_generation_tpu import pipeline  # noqa: E402

logging.basicConfig(
    format="%(asctime)s %(message)s",
    datefmt="%m/%d/%Y %I:%M:%S %p",
    level=logging.INFO)

EXTRA_ARGS = [
    ("--QClass", dict(default="mogQ")),
    ("--Q_n_components", dict(type=int, default=100,
                              help="mog num components for Q model")),
    ("--Q_covariance_type", dict(default="diag",
                                 help="mog Q covariance type full|tied|diag")),
    ("--n_samples_per_round", dict(type=int, default=5000,
                                   help="samples per rejection round")),
    ("--n_samples_acc", dict(type=int, default=100,
                             help="accepted samples to stop at")),
    ("--samples_outfn_prefix", dict(default="samples",
                                    help="output filename prefix")),
    ("--Q_select_amppos", dict(type=int, default=0,
                               help="fit Q_xi on amp-positive selection")),
    ("--Q_from_full_dataloader", dict(action="store_true", default=False,
                                      help="fit Q_z from the dataloader")),
]


def main(argv=None):
    cfg, args, _ = C.parse_and_finalize(argv, extra_args=EXTRA_ARGS)
    C.pretty_print(cfg)
    return pipeline.run(cfg, args)


if __name__ == "__main__":
    logging.getLogger("GenerationAPI").info(
        "Sample pipeline. Fit Q_xi(z), Sample from it, score samples.")
    main()
