"""Batched Gaussian-mixture EM entirely on device.

Replaces the reference's sklearn GaussianMixture fit (density_modeling.py:
63-80, host EM — the hot spot of CLaSS setup) with a jitted EM whose E-step
is two [N,K] matmul-shaped contractions (MXU work) plus a logsumexp, and
whose M-step is resp.T @ X moment matmuls. Supports 'diag', 'tied' and
'full' covariances (sklearn GaussianMixture covariance_type, used by the
reference at density_modeling.py:68-73), kmeans++ initialization
(+ optional Lloyd refinement), sklearn's
reg_covar jitter and |Δ mean-log-likelihood| < tol stopping rule, so fitted
NLLs are directly comparable to the reference pipeline's.

All functions are pure; fitted models are GMMParams pytrees that can be
donated into downstream jitted samplers.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

LOG2PI = 1.8378770664093453


class GMMParams(NamedTuple):
    weights: jnp.ndarray   # [K]
    means: jnp.ndarray     # [K, D]
    covars: jnp.ndarray    # diag: [K, D]; tied: [D, D]; full: [K, D, D]


class GMMFitInfo(NamedTuple):
    converged: jnp.ndarray
    n_iter: jnp.ndarray
    lower_bound: jnp.ndarray


# ---------------------------------------------------------------------------
# log densities
# ---------------------------------------------------------------------------

def _log_prob_diag(X, means, covars):
    """[N,D],[K,D],[K,D] -> [N,K] component log densities."""
    prec = 1.0 / covars
    logdet = jnp.sum(jnp.log(covars), axis=1)                     # [K]
    quad = (X ** 2 @ prec.T
            - 2.0 * (X @ (means * prec).T)
            + jnp.sum(means ** 2 * prec, axis=1)[None, :])
    D = X.shape[1]
    return -0.5 * (D * LOG2PI + logdet[None, :] + quad)


def _log_prob_full(X, means, covars):
    """[N,D],[K,D],[K,D,D] -> [N,K]."""
    chol = jnp.linalg.cholesky(covars)                            # [K,D,D]

    def per_comp(mu, L):
        diff = X - mu[None, :]
        y = jax.scipy.linalg.solve_triangular(L, diff.T, lower=True)
        quad = jnp.sum(y ** 2, axis=0)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return -0.5 * (X.shape[1] * LOG2PI + logdet + quad)

    return jax.vmap(per_comp)(means, chol).T


def _log_prob_tied(X, means, covar):
    """[N,D],[K,D],[D,D] -> [N,K] — one shared covariance, one Cholesky."""
    L = jnp.linalg.cholesky(covar)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    # whiten once: quad_nk = ||L^-1 (x_n - mu_k)||^2
    Xw = jax.scipy.linalg.solve_triangular(L, X.T, lower=True).T    # [N,D]
    Mw = jax.scipy.linalg.solve_triangular(L, means.T, lower=True).T
    quad = (jnp.sum(Xw ** 2, 1)[:, None] - 2.0 * Xw @ Mw.T
            + jnp.sum(Mw ** 2, 1)[None, :])
    return -0.5 * (X.shape[1] * LOG2PI + logdet + quad)


_LOG_PROB = {"diag": _log_prob_diag, "tied": _log_prob_tied,
             "full": _log_prob_full}


def log_prob_components(params, X, covariance_type):
    try:
        fn = _LOG_PROB[covariance_type]
    except KeyError:
        raise ValueError(
            f"unknown covariance_type {covariance_type!r}; "
            f"expected one of {sorted(_LOG_PROB)}") from None
    return fn(X, params.means, params.covars)


def score_samples(params, X, covariance_type="diag"):
    """Per-sample log p(x) under the mixture (sklearn score_samples)."""
    lp = log_prob_components(params, X, covariance_type)
    return jax.scipy.special.logsumexp(
        lp + jnp.log(params.weights)[None, :], axis=1)


def score(params, X, covariance_type="diag"):
    """Mean log-likelihood (sklearn GaussianMixture.score)."""
    return jnp.mean(score_samples(params, X, covariance_type))


# ---------------------------------------------------------------------------
# init: kmeans++ seeding (+ Lloyd refinement)
# ---------------------------------------------------------------------------

def _kmeanspp(key, X, K):
    N = X.shape[0]
    k0, key = jax.random.split(key)
    first = X[jax.random.randint(k0, (), 0, N)]
    means0 = jnp.zeros((K, X.shape[1]), X.dtype).at[0].set(first)
    d0 = jnp.sum((X - first[None, :]) ** 2, axis=1)

    def body(i, carry):
        means, dist, key = carry
        key, kc = jax.random.split(key)
        logits = jnp.log(jnp.maximum(dist, 1e-30))
        idx = jax.random.categorical(kc, logits)
        newm = X[idx]
        means = means.at[i].set(newm)
        dist = jnp.minimum(dist, jnp.sum((X - newm[None, :]) ** 2, axis=1))
        return means, dist, key

    means, _, _ = jax.lax.fori_loop(1, K, body, (means0, d0, key))
    return means


def _lloyd(X, means, n_iter):
    K = means.shape[0]

    def body(_, means):
        d = (jnp.sum(X ** 2, 1)[:, None] - 2 * X @ means.T
             + jnp.sum(means ** 2, 1)[None, :])
        assign = jnp.argmin(d, axis=1)
        A = jax.nn.one_hot(assign, K, dtype=X.dtype)              # [N,K]
        counts = A.sum(0)
        sums = A.T @ X
        return jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts, 1.0)[:, None], means)

    return jax.lax.fori_loop(0, n_iter, body, means)


# ---------------------------------------------------------------------------
# EM
# ---------------------------------------------------------------------------

def _m_step_diag(X, log_resp, reg_covar):
    resp = jnp.exp(log_resp)                                       # [N,K]
    nk = resp.sum(0) + 10 * jnp.finfo(X.dtype).eps
    means = (resp.T @ X) / nk[:, None]
    ex2 = (resp.T @ (X ** 2)) / nk[:, None]
    covars = ex2 - means ** 2 + reg_covar
    weights = nk / X.shape[0]
    return GMMParams(weights, means, jnp.maximum(covars, reg_covar))


def _m_step_tied(X, log_resp, reg_covar):
    """One shared [D,D] M-step: pooled weighted scatter (sklearn
    _estimate_gaussian_covariances_tied)."""
    resp = jnp.exp(log_resp)
    nk = resp.sum(0) + 10 * jnp.finfo(X.dtype).eps
    means = (resp.T @ X) / nk[:, None]
    avg_X2 = X.T @ X
    avg_means2 = (means * nk[:, None]).T @ means
    covar = (avg_X2 - avg_means2) / nk.sum()
    covar = covar + reg_covar * jnp.eye(X.shape[1], dtype=X.dtype)
    return GMMParams(nk / X.shape[0], means, covar)


def _m_step_full(X, log_resp, reg_covar):
    resp = jnp.exp(log_resp)
    nk = resp.sum(0) + 10 * jnp.finfo(X.dtype).eps
    means = (resp.T @ X) / nk[:, None]

    def cov_k(mu, r, n):
        diff = X - mu[None, :]
        c = (diff * r[:, None]).T @ diff / n
        return c + reg_covar * jnp.eye(X.shape[1], dtype=X.dtype)

    covars = jax.vmap(cov_k)(means, resp.T, nk)
    return GMMParams(nk / X.shape[0], means, covars)


@partial(jax.jit, static_argnames=("n_components", "covariance_type",
                                   "max_iter", "kmeans_iters"))
def fit(key, X, n_components, covariance_type="diag", max_iter=100,
        tol=1e-3, reg_covar=1e-6, kmeans_iters=10):
    """Fit by EM. Returns (GMMParams, GMMFitInfo)."""
    with jax.default_matmul_precision("highest"):
        return _fit(key, X, n_components, covariance_type, max_iter, tol,
                    reg_covar, kmeans_iters)


def _fit(key, X, n_components, covariance_type, max_iter, tol, reg_covar,
         kmeans_iters):
    # full-fp32 contractions: TPU default precision (bf16-mantissa MXU
    # passes on fp32 arrays) visibly degrades the E-step quadratics and
    # M-step moments; the EM is setup-time work, accuracy wins
    K = n_components
    means = _kmeanspp(key, X, K)
    if kmeans_iters:
        means = _lloyd(X, means, kmeans_iters)
    var0 = jnp.var(X, axis=0) + reg_covar
    if covariance_type == "diag":
        covars = jnp.tile(var0[None, :], (K, 1))
    elif covariance_type == "tied":
        covars = jnp.diag(var0)
    elif covariance_type == "full":
        covars = jnp.tile(jnp.diag(var0)[None], (K, 1, 1))
    else:
        raise ValueError(f"unknown covariance_type {covariance_type!r}")
    params = GMMParams(jnp.full((K,), 1.0 / K, X.dtype), means, covars)
    m_step = {"diag": _m_step_diag, "tied": _m_step_tied,
              "full": _m_step_full}[covariance_type]

    def e_step(params):
        wlp = (log_prob_components(params, X, covariance_type)
               + jnp.log(params.weights)[None, :])
        norm = jax.scipy.special.logsumexp(wlp, axis=1, keepdims=True)
        return wlp - norm, jnp.mean(norm)

    def cond(state):
        _, _, it, converged = state
        return (~converged) & (it < max_iter)

    def body(state):
        params, lb_prev, it, _ = state
        log_resp, lb = e_step(params)
        params = m_step(X, log_resp, reg_covar)
        converged = jnp.abs(lb - lb_prev) < tol
        return params, lb, it + 1, converged

    params, lb, n_iter, converged = jax.lax.while_loop(
        cond, body, (params, jnp.array(-jnp.inf, X.dtype),
                     jnp.array(0, jnp.int32), jnp.array(False)))
    return params, GMMFitInfo(converged, n_iter, lb)


@partial(jax.jit, static_argnames=("n", "covariance_type"))
def sample(key, params, n, covariance_type="diag"):
    """Draw n samples on device: categorical component + gaussian."""
    kc, ke = jax.random.split(key)
    comp = jax.random.categorical(kc, jnp.log(params.weights), shape=(n,))
    D = params.means.shape[1]
    eps = jax.random.normal(ke, (n, D), params.means.dtype)
    mu = params.means[comp]
    if covariance_type == "diag":
        return mu + jnp.sqrt(params.covars[comp]) * eps
    if covariance_type == "tied":
        chol = jnp.linalg.cholesky(params.covars)                  # [D,D]
        return mu + eps @ chol.T
    chol = jnp.linalg.cholesky(params.covars)[comp]                # [n,D,D]
    return mu + jnp.einsum("nij,nj->ni", chol, eps)
