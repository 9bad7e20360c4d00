"""t-SNE scatter + latent discriminators (reference: vis/scripts/tsne.py).

Per attribute: a 2-D t-SNE of the dumped z states colored by label, and
logistic-regression latent discriminators reporting (a) labeled-vs-unlabeled
AUC and (b) between-label accuracy on val/test, saved as a json report.

Deviation from the reference (documented): tsne.py:218 stored `lab_auc`
under the between-label key — here each metric is stored under its own key.
The discriminators are fit with the on-device Newton solver (latent.logreg).
"""

import json
import logging
from collections import defaultdict

import numpy as np
import jax.numpy as jnp
from sklearn import metrics as skmetrics
from sklearn.manifold import TSNE

from ..latent import logreg
from . import build_index

LOG = logging.getLogger("GenerationAPI")


def compute_tsne_embeddings(states, max_points=2000, seed=0):
    z = states["z"][:max_points].astype(np.float32)
    return TSNE(n_components=2, random_state=seed,
                init="pca").fit_transform(z)


def build_tsne(states, fname, label_dict):
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    tsne = compute_tsne_embeddings(states)
    color_cycle = ["#000000", "#FF6859", "#1EB980", "#72DEFF", "#FFCF44"]
    all_labels = states["label"][:len(tsne)]
    for attr_ix, (attr_name, value_key) in enumerate(label_dict):
        legend = defaultdict(str)
        for label_name, label_int in value_key.items():
            if legend[label_int]:
                legend[label_int] += "/"
            legend[label_int] += label_name
        data_points = defaultdict(list)
        for i in range(len(tsne)):
            data_points[legend[all_labels[i][attr_ix]]].append(tsne[i])
        plt.figure(figsize=(10, 10))
        for ix, (lab, dat) in enumerate(data_points.items()):
            d = np.stack(dat)
            plt.scatter(d[:, 0], d[:, 1],
                        color=color_cycle[ix % len(color_cycle)],
                        alpha=0.5, label=lab)
        plt.legend()
        plt.title(f"t-SNE of z, colored by {attr_name}")
        plt.savefig(fname[:-3] + f"_tsne_{attr_name}.png", dpi=150)
        plt.close()
        LOG.info("Saved t-SNE for %s", attr_name)


def _fit_and_auc(X_tr, y_tr, X_te, y_te):
    clf, _ = logreg.fit(jnp.asarray(X_tr), jnp.asarray(y_tr))
    p = np.asarray(logreg.predict_proba(clf, jnp.asarray(X_te)))[:, 1]
    auc = skmetrics.roc_auc_score(y_te, p)
    acc = ((p > 0.5) == (y_te > 0.5)).mean()
    return float(auc), float(acc)


def build_latent_discriminator(states, fname, label_dict, val_data,
                               test_data):
    """For each attribute: labeled-vs-unlabeled AUC and pos-vs-neg accuracy,
    train on train states, evaluate on val/test states."""
    report = {}
    for attr_ix, (attr_name, _) in enumerate(label_dict):
        def xy(st, mode):
            lab = st["label"][:, attr_ix]
            mu = st["mu"].astype(np.float32)
            if mode == "lab_vs_unl":
                y = (lab != -1).astype(np.float32)
                return mu, y
            sel = lab != -1
            return mu[sel], (lab[sel] == 1).astype(np.float32)

        entry = {}
        X_tr, y_tr = xy(states, "lab_vs_unl")
        X_te, y_te = xy(val_data, "lab_vs_unl")
        if len(np.unique(y_tr)) == 2 and len(np.unique(y_te)) == 2:
            auc, acc = _fit_and_auc(X_tr, y_tr, X_te, y_te)
            entry["lab_auc"] = auc
            entry["lab_acc"] = acc
        X_tr, y_tr = xy(states, "between")
        X_te, y_te = xy(test_data, "between")
        if (len(y_tr) and len(y_te) and len(np.unique(y_tr)) == 2
                and len(np.unique(y_te)) == 2):
            auc, acc = _fit_and_auc(X_tr, y_tr, X_te, y_te)
            entry["between_auc"] = auc
            entry["between_acc"] = acc   # ref stored lab_auc here (bug)
        report[attr_name] = entry
        LOG.info("latent discriminator %s: %s", attr_name, entry)
    out = fname[:-3] + "_latent_discriminator.json"
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    return report


def eval(fnames, label_dict=()):  # noqa: A001 - reference API name
    fname = fnames["train"]
    states = build_index.read_states(fname)
    LOG.info("Starting with TSNE now.")
    build_tsne(states, fname, label_dict)
    LOG.info("Running latent discriminator now.")
    val_states = build_index.read_states(fnames["val"])
    test_states = build_index.read_states(fnames["test"])
    return build_latent_discriminator(states, fname, label_dict,
                                      val_states, test_states)
