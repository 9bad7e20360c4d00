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
    with jax.default_matmul_precision("highest"):
        return _fit(X, y, C, tol, max_iter)


def _fit(X, y, C, tol, max_iter):
    # full-fp32 matmuls: on TPU the default precision runs fp32 arrays
    # through bf16-mantissa MXU passes, which corrupts the Newton Hessian
    # enough to break its Cholesky on ill-conditioned (near-separable)
    # fits; this solve is microscopic, accuracy is all that matters
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

    def loss(theta):
        m = Xb @ theta
        return (C * jnp.sum(jax.nn.softplus(m) - y * m)
                + 0.5 * jnp.sum(reg * theta ** 2))

    # tiny Tikhonov damping: on linearly separable inputs the sigmoids
    # saturate and the unpenalized-intercept row of H vanishes, making the
    # plain solve singular (NaN params); the damping keeps it finite and
    # is orders of magnitude below sklearn-parity tolerances otherwise
    damp = 1e-7 * jnp.eye(D + 1, dtype=X.dtype)

    def cond(state):
        theta, it, gnorm = state
        return (gnorm > tol) & (it < max_iter)

    def body(state):
        theta, it, _ = state
        g, H = grad_hess(theta)
        step = jax.scipy.linalg.solve(H + damp, g, assume_a="pos")

        # backtracking line search: the full Newton step overshoots on
        # near-separable data; halve until the objective decreases
        # (full step accepted immediately in the well-conditioned case)
        l0 = loss(theta)

        def bt_cond(s):
            t, k = s
            l1 = loss(theta - t * step)
            return (~(l1 <= l0) | ~jnp.isfinite(l1)) & (k < 30)

        def bt_body(s):
            t, k = s
            return t * 0.5, k + 1

        t, _ = jax.lax.while_loop(
            bt_cond, bt_body, (jnp.asarray(1.0, X.dtype),
                               jnp.array(0, jnp.int32)))
        theta = theta - t * step
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
