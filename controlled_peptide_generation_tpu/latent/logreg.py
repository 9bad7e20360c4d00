"""L2-regularized logistic regression fit by Newton's method, on device.

Replaces sklearn LogisticRegression(solver='lbfgs') for the latent attribute
classifiers (reference sample_pipeline.py:169-192). Objective matches
sklearn's primal form:  0.5*||w||^2 + C * sum_i log(1 + exp(-y_i f(x_i))),
intercept unpenalized, C=1.0 default. At z_dim=100 the Newton system is a
101x101 solve — a handful of MXU matmuls per iteration, converging in <10
iterations, so the classifier heads can be (re)fit inside the same XLA
program that consumes them.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LogRegParams(NamedTuple):
    w: jnp.ndarray   # [D]
    b: jnp.ndarray   # []


@partial(jax.jit, static_argnames=("max_iter",))
def fit(X, y, C=1.0, tol=1e-4, max_iter=200):
    """X: [N, D] float, y: [N] in {0, 1}. Returns (LogRegParams, n_iter)."""
    X = X.astype(jnp.float32)
    y = y.astype(jnp.float32)
    N, D = X.shape
    Xb = jnp.concatenate([X, jnp.ones((N, 1), X.dtype)], axis=1)   # [N,D+1]
    reg = jnp.concatenate([jnp.ones(D), jnp.zeros(1)])             # no b pen

    def grad_hess(theta):
        p = jax.nn.sigmoid(Xb @ theta)
        g = C * (Xb.T @ (p - y)) + reg * theta
        s = p * (1.0 - p)
        H = C * (Xb.T * s[None, :]) @ Xb + jnp.diag(reg)
        return g, H

    def cond(state):
        theta, it, gnorm = state
        return (gnorm > tol) & (it < max_iter)

    def body(state):
        theta, it, _ = state
        g, H = grad_hess(theta)
        step = jax.scipy.linalg.solve(H, g, assume_a="pos")
        theta = theta - step
        g_new, _ = grad_hess(theta)
        return theta, it + 1, jnp.max(jnp.abs(g_new))

    theta0 = jnp.zeros(D + 1, X.dtype)
    g0, _ = grad_hess(theta0)
    theta, n_iter, _ = jax.lax.while_loop(
        cond, body, (theta0, jnp.array(0, jnp.int32),
                     jnp.max(jnp.abs(g0))))
    return LogRegParams(theta[:D], theta[D]), n_iter


def predict_proba(params, X):
    """[N, D] -> [N, 2] class probabilities (sklearn column order)."""
    p1 = jax.nn.sigmoid(X @ params.w + params.b)
    return jnp.stack([1.0 - p1, p1], axis=1)


def decision(params, X):
    return X @ params.w + params.b


def accuracy(params, X, y):
    pred = (decision(params, X) > 0).astype(y.dtype)
    return jnp.mean((pred == y).astype(jnp.float32))
