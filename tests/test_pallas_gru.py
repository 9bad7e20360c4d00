"""Fused whole-scan Pallas GRU (ops/pallas_gru.py) vs the XLA lax.scan.

Interpret mode executes the kernels as plain jnp on CPU, so these run
everywhere; on the TPU backend the same dispatch compiles to Mosaic.
Unlike the beam kernel, the fused path re-associates the bias additions
(bi + bh fold into the hoisted input projection), so forward values and
gradients match to float-accumulation tolerance rather than bit-exactly.
Reference workload being accelerated: train_vae.py:13-42 via
models/{encoder.py,decoder.py}'s gru_scan calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlled_peptide_generation_tpu.ops import gru as gru_mod

pytestmark = pytest.mark.quick


def _tpu():
    return jax.default_backend() == "tpu"


# Interpret mode (CPU) runs both paths as plain fp32 jnp, so only the
# documented bias-fold reassociation separates them — tight tolerances.
# On real TPU the MXU executes fp32 matmuls as bf16 passes and the two
# paths associate the 13-25-step recurrence differently, so the honest
# bound is accumulation noise, measured 2026-08-20 on v5e: forward max
# abs 7.2e-4, gradients max abs 2.8e-2 (relative error is meaningless on
# near-zero grad elements — atol dominates).
def _fwd_tols():
    return dict(rtol=5e-3, atol=3e-3) if _tpu() else dict(rtol=2e-5,
                                                          atol=2e-5)


def _grad_tols():
    return dict(rtol=5e-2, atol=8e-2) if _tpu() else dict(rtol=1e-4,
                                                          atol=1e-5)


def _params(key, in_dim, h):
    return gru_mod.init_gru_params(key, in_dim, h)


def _both(params, xs, h0, reverse=False):
    gru_mod.set_pallas_train(False)
    try:
        ref = gru_mod.gru_scan(params, xs, h0, reverse=reverse)
        ref = jax.tree.map(np.asarray, ref)
    finally:
        gru_mod.set_pallas_train(None)
    jax.clear_caches()
    gru_mod.set_pallas_train(True)
    try:
        got = gru_mod.gru_scan(params, xs, h0, reverse=reverse)
        got = jax.tree.map(np.asarray, got)
    finally:
        gru_mod.set_pallas_train(None)
        jax.clear_caches()
    return ref, got


@pytest.mark.parametrize("B,T,in_dim,h,reverse", [
    (4, 7, 9, 5, False),
    (4, 7, 9, 5, True),
    (37, 25, 150, 102, False),   # decoder shape, crosses the batch tile
    (16, 25, 150, 80, True),     # encoder backward direction
])
def test_forward_matches_scan(B, T, in_dim, h, reverse):
    params = _params(jax.random.PRNGKey(0), in_dim, h)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, in_dim))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, h))
    (hs_r, hl_r), (hs_p, hl_p) = _both(params, xs, h0, reverse)
    np.testing.assert_allclose(hs_p, hs_r, **_fwd_tols())
    np.testing.assert_allclose(hl_p, hl_r, **_fwd_tols())


def test_gradients_match_scan():
    """jax.grad through the fused path (custom-VJP backward kernel) must
    match jax.grad through the XLA scan for every input: wh, bh (folded
    into the tape), wi, bi, xs, h0."""
    B, T, in_dim, h = 21, 13, 11, 6
    params = _params(jax.random.PRNGKey(3), in_dim, h)
    xs = jax.random.normal(jax.random.PRNGKey(4), (B, T, in_dim))
    h0 = jax.random.normal(jax.random.PRNGKey(5), (B, h))
    w_hs = jax.random.normal(jax.random.PRNGKey(6), (B, T, h))
    w_hl = jax.random.normal(jax.random.PRNGKey(7), (B, h))

    def loss(params, xs, h0):
        hs, h_last = gru_mod.gru_scan(params, xs, h0)
        return jnp.sum(hs * w_hs) + jnp.sum(jnp.tanh(h_last) * w_hl)

    grad = jax.grad(loss, argnums=(0, 1, 2))
    gru_mod.set_pallas_train(False)
    try:
        g_ref = jax.tree.map(np.asarray, grad(params, xs, h0))
    finally:
        gru_mod.set_pallas_train(None)
    jax.clear_caches()
    gru_mod.set_pallas_train(True)
    try:
        g_pl = jax.tree.map(np.asarray, grad(params, xs, h0))
    finally:
        gru_mod.set_pallas_train(None)
        jax.clear_caches()
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, **_grad_tols()),
        g_ref, g_pl)


def test_gradients_match_reverse():
    B, T, in_dim, h = 8, 9, 7, 5
    params = _params(jax.random.PRNGKey(8), in_dim, h)
    xs = jax.random.normal(jax.random.PRNGKey(9), (B, T, in_dim))
    h0 = jnp.zeros((B, h))
    w_hs = jax.random.normal(jax.random.PRNGKey(10), (B, T, h))

    def loss(params, xs):
        hs, _ = gru_mod.gru_scan(params, xs, h0, reverse=True)
        return jnp.sum(hs * w_hs)

    grad = jax.grad(loss, argnums=(0, 1))
    gru_mod.set_pallas_train(False)
    try:
        g_ref = jax.tree.map(np.asarray, grad(params, xs))
    finally:
        gru_mod.set_pallas_train(None)
    jax.clear_caches()
    gru_mod.set_pallas_train(True)
    try:
        g_pl = jax.tree.map(np.asarray, grad(params, xs))
    finally:
        gru_mod.set_pallas_train(None)
        jax.clear_caches()
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, **_grad_tols()),
        g_ref, g_pl)


def test_train_step_trajectory():
    """One full phase-1 train step (forward + all losses + grads + Adam)
    routed through the fused kernels lands on the XLA step's params to
    accumulation tolerance — the end-to-end contract behind
    --hw.pallas_train."""
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.ops import losses as L
    from controlled_peptide_generation_tpu.train.train_vae import (
        make_train_step)

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    model = build_model(cfg.model, n_vocab=26, max_seq_len=12)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    text = jax.random.randint(jax.random.PRNGKey(2), (8, 12), 4, 26,
                              jnp.int32).at[:, 0].set(2).at[:, 7].set(3)

    outs = {}
    for mode in (False, True):
        gru_mod.set_pallas_train(mode)
        try:
            jax.clear_caches()
            step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                        donate=False)
            p2, _, metrics = step(params, opt.init(params),
                                  jax.random.PRNGKey(3), text,
                                  jnp.asarray(0, jnp.int32))
            outs[mode] = (jax.tree.map(np.asarray, p2),
                          float(metrics["L_vae"]))
        finally:
            gru_mod.set_pallas_train(None)
            jax.clear_caches()
    (p_ref, l_ref), (p_pl, l_pl) = outs[False], outs[True]
    # On TPU, MXU accumulation noise in the grads passes through Adam's
    # sqrt(v) normalization: where a grad element is near zero its
    # update direction can flip, bounding the param delta by ~lr — so
    # atol there is a couple of lr (1e-3), not float noise.
    assert abs(l_ref - l_pl) < (5e-3 if _tpu() else 1e-4)
    p_tols = (dict(rtol=1e-2, atol=2e-3) if _tpu()
              else dict(rtol=5e-3, atol=5e-5))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, **p_tols),
        p_ref, p_pl)
