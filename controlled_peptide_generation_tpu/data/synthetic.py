"""Synthetic peptide corpus generator for smoke tests and benchmarks.

Writes csv files with the exact schema produced by the reference's offline
curation step (data_processing/create_datasets.py:566-617: columns
``text`` plus one attribute column per labeled file), so the loader and the
whole pipeline run self-contained without the proprietary corpora.

Sequences are random amino-acid strings whose composition is biased by the
attribute label, so latent classifiers have real signal to find.
"""

import os
import random

AA = list("ACDEFGHIKLMNPQRSTVWY")
# crude composition biases: AMP-positive -> cationic/hydrophobic-rich,
# tox-positive -> cysteine/aromatic-rich
_POS_BIAS = {"K": 4.0, "R": 4.0, "L": 3.0, "I": 2.0, "W": 2.0}
_TOX_BIAS = {"C": 4.0, "W": 3.0, "F": 2.0, "Y": 2.0}


def _weights(bias):
    return [bias.get(a, 1.0) for a in AA]


def _seq(rng, min_len, max_len, bias=None):
    n = rng.randint(min_len, max_len)
    w = _weights(bias or {})
    return " ".join(rng.choices(AA, weights=w, k=n))


def generate(data_path, n_unlab=600, n_amp=200, n_tox=200, seed=7734,
             min_len=5, max_len=23):
    """Write unlab.csv / amp_lab.csv / tox_lab.csv under data_path."""
    rng = random.Random(seed)
    os.makedirs(data_path, exist_ok=True)
    seen = set()

    def fresh(bias=None):
        for _ in range(1000):
            s = _seq(rng, min_len, max_len, bias)
            if s not in seen:
                seen.add(s)
                return s
        raise RuntimeError("could not generate a fresh sequence")

    with open(os.path.join(data_path, "unlab.csv"), "w") as f:
        f.write("text\n")
        for _ in range(n_unlab):
            f.write(fresh() + "\n")

    with open(os.path.join(data_path, "amp_lab.csv"), "w") as f:
        f.write("text,amp\n")
        for i in range(n_amp):
            if i % 2 == 0:
                f.write(f"{fresh(_POS_BIAS)},amp_posc\n")
            else:
                f.write(f"{fresh()},amp_negc\n")

    with open(os.path.join(data_path, "tox_lab.csv"), "w") as f:
        f.write("text,tox\n")
        for i in range(n_tox):
            if i % 2 == 0:
                f.write(f"{fresh(_TOX_BIAS)},tox_posc\n")
            else:
                f.write(f"{fresh()},tox_negc\n")
    return data_path


def ensure(data_path, **kw):
    """Generate the corpus only if it is not already present."""
    marker = os.path.join(data_path, "unlab.csv")
    if not os.path.exists(marker):
        generate(data_path, **kw)
    return data_path
