"""Per-point latent density diagnostics (reference: vis/scripts/kde.py).

The reference's kde.eval crashes at import-time configuration (it passes
logging.info, a function, as a logging level — kde.py:16) and is commented
out at its only call site; this implementation works and is exercised by
tests (documented fix, SURVEY.md §2 quirk list).

For each attribute subset: per-point Gaussian density of z under the fitted
gaussianQ, and the fraction of near-zero-density points — a cheap mode-
collapse / coverage diagnostic.
"""

import logging

import numpy as np

from ..latent import density
from . import build_index

LOG = logging.getLogger("GenerationAPI")


def density_stats(mu, logvar, eval_mu, threshold=1e-8):
    """Fit gaussianQ on (mu, logvar), return per-point densities of eval_mu
    and the non-near-zero fraction."""
    q = density.gaussianQ(np.asarray(mu, np.float32),
                          np.asarray(logvar, np.float32))
    logp = np.asarray(q.logpdf(np.asarray(eval_mu, np.float32)))
    p = np.exp(logp)
    nonzero_frac = float((p > threshold).mean())
    return p, nonzero_frac


def eval(fnames, label_dict=()):  # noqa: A001 - reference API name
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    fname = fnames["train"]
    states = build_index.read_states(fname)
    results = {}
    lab = states["label"]
    for attr_ix, (attr_name, _) in enumerate(label_dict):
        for target, tag in [(1, "pos"), (0, "neg"), (-1, "unl")]:
            sel = np.flatnonzero(lab[:, attr_ix] == target)[:500]
            if len(sel) < 10:
                continue
            mu = states["mu"][sel]
            logvar = states["logvar"][sel]
            p, frac = density_stats(mu, logvar, mu)
            results[f"{attr_name}_{tag}"] = frac
            plt.figure(figsize=(8, 4))
            plt.hist(np.log10(np.maximum(p, 1e-300)), bins=50)
            plt.title(f"log10 density, {attr_name}={tag} "
                      f"(nonzero frac {frac:.3f})")
            plt.savefig(fname[:-3] + f"_kde_{attr_name}_{tag}.png", dpi=120)
            plt.close()
            LOG.info("kde %s=%s: nonzero fraction %.4f",
                     attr_name, tag, frac)
    return results
