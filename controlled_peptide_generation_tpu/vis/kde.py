"""Per-point latent density diagnostics (reference: vis/scripts/kde.py).

The reference builds one Gaussian per TRAINING point — scipy
``multivariate_normal(mean=mu_i, cov=diag(sqrt(exp(logvar_i))))``, note the
``to_var`` quirk of using the std as the covariance (kde.py:91-92) — then,
for each evaluated latent z, reports the fraction of those Gaussians whose
pdf does not underflow to 0.0 in float64 plus the mean density
(kde.py:95-96): a posterior-overlap / coverage diagnostic.

The reference implementation crashes before any of that (it passes
``logging.info``, a function, as a logging level — kde.py:16) and is
commented out at its only call site; this one works, keeps the formula
(including the to_var quirk, so numbers are comparable to what the authors'
internal runs would have produced), and computes the whole [n_eval, n_train]
density matrix as one vectorized broadcast instead of a python double loop.
"""

import logging

import numpy as np

from . import build_index

LOG = logging.getLogger("GenerationAPI")

LOG2PI = float(np.log(2.0 * np.pi))


def density_stats(mu, logvar, eval_z):
    """Coverage of eval_z under the per-point posteriors N(mu_i, to_var_i).

    Returns (nonzero_ratios [n_eval], mean_densities [n_eval]): per
    evaluated point, the fraction of the n_train Gaussians assigning it
    non-underflowed (float64) density, and its mean density
    (reference kde.py:91-96, vectorized).
    """
    mu = np.asarray(mu, np.float64)
    cov = np.sqrt(np.exp(np.asarray(logvar, np.float64)))  # to_var quirk
    z = np.atleast_2d(np.asarray(eval_z, np.float64))
    D = mu.shape[1]
    logdet = np.log(cov).sum(axis=1)                            # [n_train]
    prec = 1.0 / cov
    quad = (z ** 2 @ prec.T
            - 2.0 * (z @ (mu * prec).T)
            + np.sum(mu ** 2 * prec, axis=1)[None, :])          # [n_eval,n_train]
    logp = -0.5 * (D * LOG2PI + logdet[None, :] + quad)
    dens = np.exp(logp)      # float64 underflow to 0.0 == reference "zero"
    return (dens > 0).mean(axis=1), dens.mean(axis=1)


def eval(fnames, label_dict=()):  # noqa: A001 - reference API name
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    fname = fnames["train"]
    states = build_index.read_states(fname)
    mu_all = states["mu"]
    logvar_all = states["logvar"]
    lab = states["label"]
    max_evaluated = 500

    results = {}
    lines = []
    for attr_ix, (attr_name, _) in enumerate(label_dict):
        for target, tag in [(1, "pos"), (0, "neg"), (-1, "unl")]:
            sel = np.flatnonzero(lab[:, attr_ix] == target)[:max_evaluated]
            if len(sel) < 10:
                continue
            ratios, dens = density_stats(mu_all, logvar_all,
                                         states["z"][sel])
            frac = float(ratios.mean())
            results[f"{attr_name}_{tag}"] = frac
            lines.append(f"{attr_name}={tag}: {frac * 100:.2f}% Non-zero, "
                         f"{dens.mean():.3e} Avg density")
            plt.figure(figsize=(8, 4))
            plt.hist(ratios, bins=40, alpha=0.8)
            plt.title(f"Fraction of Gaussians with non-zero density, "
                      f"{attr_name}={tag}")
            plt.savefig(fname[:-3] + f"_kde_{attr_name}_{tag}.png", dpi=120)
            plt.close()
            LOG.info("kde %s=%s: nonzero fraction %.4f, avg density %.3e",
                     attr_name, tag, frac, float(dens.mean()))
    with open(fname[:-3] + "_kde.txt", "w") as g:
        g.write("\n".join(lines))
    return results
