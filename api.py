#!/usr/bin/env python
"""API self-test CLI (reference: api.py __main__, api.py:337-361).

Loads the newest trained checkpoint + vocab for the configured run and
greets; the library API itself lives in controlled_peptide_generation_tpu/
api.py. For the full eval battery run static_eval.py.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from controlled_peptide_generation_tpu import config as C  # noqa: E402
from controlled_peptide_generation_tpu.utils import runtime as _rt  # noqa: E402
_rt.setup()
from controlled_peptide_generation_tpu.api import (  # noqa: E402
    load_trained_model, load_vocab, get_model_and_vocab_path)

logging.basicConfig(
    format="%(asctime)s %(message)s",
    datefmt="%m/%d/%Y %I:%M:%S %p",
    level=logging.INFO)
LOG = logging.getLogger("GenerationAPI")

DEFAULT_SEQS = ("M T G E I D T A M L I G G I E F F L K "
                "F A I Y Y F H E R A W Q L I R, M D K L "
                "I V L K M L N S K L P Y G Q R K P F S L R")


def main(argv=None):
    extra = [("--seqs", dict(default=DEFAULT_SEQS,
                             help="comma separated seqs (self-test arg)"))]
    cfg, args, _ = C.parse_and_finalize(argv, extra_args=extra)
    model_path, vocab_path, _ = get_model_and_vocab_path(cfg)
    vocab = load_vocab(vocab_path)
    load_trained_model(model_path, vocab.size(), cfg)
    LOG.info("loaded successfully. For more tests, run static_eval.py")


if __name__ == "__main__":
    LOG.info("Running API test.")
    main()
