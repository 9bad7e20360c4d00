"""Latent covariance diagnostics (reference: vis/scripts/covar.py).

Cov_q(z) = E_p[Sigma] + Cov_p[mu] (Kumar et al. 2018); to match the prior it
should be I. The statistic doubles as a training health metric; the matrix
assembly is pure jnp, plots are host-side matplotlib.
"""

import logging

import numpy as np

from . import build_index
from ..latent.density import empirical_covar as _empirical_covar

LOG = logging.getLogger("GenerationAPI")


def empirical_covar(X):
    """float64 host-side view of the shared centered-covariance formula
    (latent/density.py — one definition, two call sites)."""
    return _empirical_covar(np.asarray(X, np.float64))


def cov_q(mus, logvars):
    """Returns (Cov_q, diag E_p[Sigma], diag Cov_p[mu])."""
    Ep_Covq = np.diag(np.exp(np.asarray(logvars, np.float64)).mean(0))
    Covp_Eq = empirical_covar(mus)
    return (Ep_Covq + Covp_Eq, np.diagonal(Ep_Covq), np.diagonal(Covp_Eq))


def sorted_cov_diagonals(mus, logvars, sortix=None):
    """Mean encoder variance and activity Cov_p[mu], sorted by activity."""
    _, ep_var, activity = cov_q(mus, logvars)
    if sortix is None:
        sortix = np.argsort(-activity)
    return ep_var[sortix], activity[sortix], sortix


def frobenius_to_identity(C):
    C = np.asarray(C)
    return float(((C - np.eye(C.shape[0])) ** 2).sum())


def get_enc(states, target, max_eval=500):
    lab = states["label"][:, 0] if states["label"].ndim > 1 \
        else states["label"]
    sel = np.flatnonzero(lab == target)[:max_eval]
    return (states["mu"][sel].astype(np.float32),
            states["logvar"][sel].astype(np.float32))


def analyze_one_set(C, d1, d2, label_type, fname):
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 10))
    plt.matshow(np.minimum(C, 3), fignum=1)
    plt.colorbar(fraction=0.046, pad=0.04)
    plt.title(r"Cov$_{q_\phi}(z)$ for " + label_type, pad=18, fontsize=18)
    plt.savefig(fname[:-3] + "_" + label_type + "_q_phi_z.png",
                dpi=150, format="png")
    plt.close()

    plt.figure(figsize=(10, 5))
    plt.plot(d1, label=r"diag $\mathbb{E}_p\ \sigma$")
    plt.plot(d2, label=r"diag $Cov_p\ \mu$")
    plt.plot(C.mean(0), label=r"means")
    plt.legend()
    plt.title(f"Diagonal of covariance for {label_type}", fontsize=18)
    plt.savefig(fname[:-3] + "_" + label_type + "_covar_diag.png",
                dpi=150, format="png")
    plt.close()

    plt.figure(figsize=(10, 5))
    # strictly above the diagonal (deviation: reference covar.py:90 uses
    # triu without k=1, mixing the ~1.0 diagonal into the off-diagonal
    # histogram as a spurious correlation mode)
    offdia = C[np.triu(np.ones_like(C), k=1) == 1]
    plt.hist(offdia, bins=100)
    plt.title(f"Histogram of off-diagonals for {label_type}", fontsize=18)
    plt.savefig(fname[:-3] + "_" + label_type + "_covar_offdiag.png",
                dpi=150, format="png")
    plt.close()

    frob = frobenius_to_identity(C)
    LOG.info("Frobenius distance to identity for %s: %s.", label_type, frob)
    return frob


def build_covar(states, fname, max_evaluated=500):
    unl_mu, unl_logvar = get_enc(states, -1, max_evaluated)
    pos_mu, pos_logvar = get_enc(states, 1, max_evaluated)
    C_pos, d1_pos, d2_pos = cov_q(pos_mu, pos_logvar)
    C_unl, d1_unl, d2_unl = cov_q(unl_mu, unl_logvar)
    frob_pos = analyze_one_set(C_pos, d1_pos, d2_pos, "pos", fname)
    frob_unl = analyze_one_set(C_unl, d1_unl, d2_unl, "unl", fname)
    with open(fname[:-3] + "_frob_dist.txt", "w") as g:
        g.write(f"Frobenius from identity for positive: {frob_pos}\n")
        g.write(f"Frobenius from identity for unlabeled: {frob_unl}\n")
    return frob_pos, frob_unl


def eval(fnames):  # noqa: A001 - reference API name
    fname = fnames["train"]
    states = build_index.read_states(fname)
    return build_covar(states, fname)
