"""Latent density models Q(z) for CLaSS (reference: density_modeling.py).

Three estimators over encoder outputs (mu, logvar), all device-backed:

* mogQ      — GMM over reparameterized samples, fit by on-device EM
              (reference: sklearn GaussianMixture on host, :63-80);
* fullQ     — exact mixture of N diagonal Gaussians, one per data point
              (:17-35), expressed as a GMM with uniform weights;
* gaussianQ — single Gaussian with covar = Cov(mu) + diag(E[var]) (:83-96).

Plus prior_logpdf and evaluate_nll, keeping the reference's quirk of adding
the SAME scalar noise to every z dimension per evaluation point (:105).
"""

import math

import jax
import jax.numpy as jnp

from . import gmm as gmm_mod
from . import class_sampler

TAU = 2.0 * math.pi


def prior_logpdf(z):
    """log N(z; 0, I) — supports [D] or [N, D]."""
    z = jnp.atleast_2d(z)
    D = z.shape[1]
    return -0.5 * D * jnp.log(TAU) - 0.5 * jnp.sum(z ** 2, axis=1)


def empirical_covar(X):
    Xc = X - X.mean(0, keepdims=True)
    return (Xc.T @ Xc) / X.shape[0]


class RejSampleMixin:
    """Attribute-classifier plumbing shared by the Q models
    (reference: RejSampleBase, density_modeling.py:38-60)."""

    def init_attr_classifiers(self, attr_clfs, clf_targets):
        self.attr_clfs = dict(attr_clfs)       # name -> LogRegParams
        self.clf_targets = dict(clf_targets)   # name -> target column {0,1}

    def rejection_sample(self, key, n_samples, prefix="clfZ", oversample=1):
        """One fused device program: sample z ~ Q, score all classifier
        heads, accept where U < prod(p). Returns (z, scores dict, accept)."""
        names = sorted(self.attr_clfs)
        clf_w = jnp.stack([self.attr_clfs[a].w for a in names])
        clf_b = jnp.stack([self.attr_clfs[a].b for a in names])
        targets = jnp.array([self.clf_targets[a] for a in names])
        z, probs, accum, accept = class_sampler.rejection_round(
            key, self._sampler(), clf_w, clf_b, targets,
            n_samples * oversample)
        scores = {f"{prefix}_prob_accum": accum}
        for i, a in enumerate(names):
            scores[f"{prefix}_{a}={self.clf_targets[a]}"] = probs[:, i]
        return z, scores, accept

    def _sampler(self):
        """Return (kind, params) consumed by class_sampler.rejection_round."""
        raise NotImplementedError


class mogQ(RejSampleMixin):
    """GMM fit to z_num_samples reparameterized draws per encoder output."""

    def __init__(self, mu, logvar, n_components=100, z_num_samples=10,
                 covariance_type="diag", key=None, max_iter=100, tol=1e-3,
                 reg_covar=1e-6, **_unused):
        key = key if key is not None else jax.random.PRNGKey(0)
        mu = jnp.asarray(mu, jnp.float32)
        logvar = jnp.asarray(logvar, jnp.float32)
        k_draw, k_fit = jax.random.split(key)
        eps = jax.random.normal(k_draw, (z_num_samples,) + mu.shape)
        z = (mu[None] + jnp.exp(0.5 * logvar)[None] * eps).reshape(
            -1, mu.shape[1])
        self.covariance_type = covariance_type
        self.params, self.info = gmm_mod.fit(
            k_fit, z, n_components, covariance_type=covariance_type,
            max_iter=max_iter, tol=tol, reg_covar=reg_covar)
        self.n_components = n_components

    def logpdf(self, x):
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        return gmm_mod.score_samples(self.params, x, self.covariance_type)

    def sample(self, key, n_samples):
        return gmm_mod.sample(key, self.params, n_samples,
                              self.covariance_type)

    def _sampler(self):
        return ("gmm_" + self.covariance_type, self.params)


class fullQ(RejSampleMixin):
    """Exact mixture of N diagonal Gaussians (one per training point)."""

    def __init__(self, mu, logvar):
        mu = jnp.asarray(mu, jnp.float32)
        logvar = jnp.asarray(logvar, jnp.float32)
        n = mu.shape[0]
        self.params = gmm_mod.GMMParams(
            weights=jnp.full((n,), 1.0 / n),
            means=mu,
            covars=jnp.exp(logvar))
        self.covariance_type = "diag"

    def logpdf(self, x):
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        return gmm_mod.score_samples(self.params, x, "diag")

    def sample(self, key, n_samples):
        return gmm_mod.sample(key, self.params, n_samples, "diag")

    def _sampler(self):
        return ("gmm_diag", self.params)


class gaussianQ(RejSampleMixin):
    """Single Gaussian: mean(mu), covar = Cov(mu) (+ diag mean enc var)."""

    def __init__(self, mu, logvar, covar_add_encoder_vars=True):
        mu = jnp.asarray(mu, jnp.float32)
        logvar = jnp.asarray(logvar, jnp.float32)
        covar = empirical_covar(mu)
        if covar_add_encoder_vars:
            covar = covar + jnp.diag(jnp.exp(logvar).mean(0))
        self.params = gmm_mod.GMMParams(
            weights=jnp.ones((1,)),
            means=mu.mean(0, keepdims=True),
            covars=covar[None])
        self.covariance_type = "full"

    def logpdf(self, x):
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        return gmm_mod.score_samples(self.params, x, "full")

    def sample(self, key, n_samples):
        return gmm_mod.sample(key, self.params, n_samples, "full")

    def _sampler(self):
        return ("gmm_full", self.params)


def evaluate_nll(q, points, key):
    """NLL of heldout encoder outputs under Q(z) and under the prior.

    points: (mu [N,D], logvar [N,D]). Reference quirk preserved: the
    reparameterization noise is a single scalar per point, broadcast over
    all z dims (density_modeling.py:105).
    """
    mu, lv = points
    mu = jnp.asarray(mu, jnp.float32)
    lv = jnp.asarray(lv, jnp.float32)
    eps = jax.random.normal(key, (mu.shape[0], 1))
    z = mu + jnp.exp(0.5 * lv) * eps
    nll_q = -jnp.mean(q.logpdf(z))
    nll_p = -jnp.mean(prior_logpdf(z))
    return float(nll_q), float(nll_p)
