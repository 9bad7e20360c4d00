"""Loss library: reconstruction CE, Gaussian KLs, WAE-MMD (full + RF).

Formula-level parity with the reference (losses.py), including its quirks:

* ``mmd_full_kernel`` subtracts the *diagonal vector row-broadcast* from H,
  not a zeroed diagonal — exactly reproducing losses.py:54 (the logged
  ``L_wae_mmd`` metric depends on it);
* recon targets are the inputs shifted left with a PAD column appended and
  PAD positions excluded from the mean (losses.py:18-31);
* the RF-MMD random-feature basis is explicit state passed by the caller
  (the reference caches it in a module-global dict, losses.py:63-82).

Everything is pure jnp and jit/vmap/grad-safe. At the reference batch size
(32x100) these are single-fusion XLA programs; no Pallas needed to be
HBM-bound-optimal (verified against a Pallas variant, see BENCH.md).
"""

import math

import jax
import jax.numpy as jnp

from ..data.vocab import PAD_IDX


def recon_dec(sequences, logits):
    """NLL of next-token predictions, ignoring PAD targets.

    sequences: [B, T] int; logits: [B, T, V].
    dec_inputs '<start> A C ... <eos>' predict targets 'A C ... <eos> <pad>'.
    """
    pad_col = jnp.full((sequences.shape[0], 1), PAD_IDX, sequences.dtype)
    targets = jnp.concatenate([sequences[:, 1:], pad_col], axis=1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != PAD_IDX).astype(logits.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def kl_gaussianprior(mu, logvar):
    """KL( N(mu, sigma) || N(0, I) ), mean over batch (losses.py:8-10)."""
    return jnp.mean(0.5 * jnp.sum(
        jnp.exp(logvar) + mu ** 2 - 1.0 - logvar, axis=1))


def kl_gaussian_sharedmu(mu, logvar):
    """KL( N(mu, sigma) || N(mu, I) ): penalizes logvar only."""
    del mu
    return jnp.mean(0.5 * jnp.sum(jnp.exp(logvar) - 1.0 - logvar, axis=1))


# ---------------------------------------------------------------------------
# MMD
# ---------------------------------------------------------------------------

def compute_mmd_kernel(x, y, sigma, kernel):
    """x: [N, d], y: [M, d] -> [N, M] kernel matrix."""
    xmy = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=2)
    if kernel == "gaussian":
        return jnp.exp(-xmy / sigma ** 2)
    if kernel == "laplace":
        return jnp.exp(-jnp.sqrt(xmy + sigma ** 2))
    if kernel == "energy":
        return jnp.power(xmy + sigma ** 2, -0.25)
    raise ValueError(f"unknown kernel {kernel}")


def mmd_full_kernel(z1, z2, sigma, kernel="gaussian"):
    K11 = compute_mmd_kernel(z1, z1, sigma, kernel)
    K22 = compute_mmd_kernel(z2, z2, sigma, kernel)
    K12 = compute_mmd_kernel(z1, z2, sigma, kernel)
    n = z1.shape[0]
    H = K11 + K22 - 2.0 * K12
    # reference quirk (losses.py:54): subtract diag(H) broadcast across ROWS,
    # not zero the diagonal — preserved for logged-metric parity
    H = H - jnp.diagonal(H)[None, :]
    return jnp.sum(H) / (n * (n - 1))


def init_rf_basis(key, z_dim, rf_dim, dtype=jnp.float32):
    """Random-feature basis for the gaussian-kernel MMD estimator."""
    kw, kb = jax.random.split(key)
    rf_w = jax.random.normal(kw, (z_dim, rf_dim), dtype)
    rf_b = 2.0 * math.pi * jax.random.uniform(kb, (rf_dim,), dtype)
    return rf_w, rf_b


def _rf_embed(z, rf_w, rf_b, sigma):
    rf_dim = rf_w.shape[1]
    z_emb = (z @ rf_w) / sigma + rf_b
    return jnp.cos(z_emb) * (2.0 / rf_dim) ** 0.5


def mmd_rf(z1, z2, rf_w, rf_b, sigma):
    mu1 = jnp.mean(_rf_embed(z1, rf_w, rf_b, sigma), axis=0)
    mu2 = jnp.mean(_rf_embed(z2, rf_w, rf_b, sigma), axis=0)
    return jnp.sum((mu1 - mu2) ** 2)


def wae_mmd_gaussianprior_full(key, z, sigma, kernel="gaussian"):
    """MMD(q(z), N(0,I)) with fresh prior samples (losses.py:34-44)."""
    z_prior = jax.random.normal(key, z.shape, z.dtype)
    return mmd_full_kernel(z, z_prior, sigma, kernel)


def wae_mmd_gaussianprior_rf(key, z, rf_w, rf_b, sigma):
    z_prior = jax.random.normal(key, z.shape, z.dtype)
    return mmd_rf(z, z_prior, rf_w, rf_b, sigma)


def kl_flow_mc(mu, logvar, z0, z_k, logdet):
    """Single-sample MC estimate of the flow-posterior KL term
    (Rezende & Mohamed 2015): E_q[log q0(z0|x) - sum log|det J| - log p(z_K)]
    with p = N(0, I). No reference counterpart — the reference's flow
    training path was never released (its forward() raises, model.py:173-177);
    this is the standard objective its logdet accumulation was built for."""
    log2pi = math.log(2.0 * math.pi)
    eps2 = (z0 - mu) ** 2 / jnp.exp(logvar)
    log_q0 = -0.5 * jnp.sum(log2pi + logvar + eps2, axis=1)
    log_p = -0.5 * jnp.sum(log2pi + z_k ** 2, axis=1)
    return jnp.mean(log_q0 - logdet - log_p)
