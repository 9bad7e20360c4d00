"""Dispatch-fusion equivalence: unrolled train scan == sequential steps;
fused CLaSS round == its composed stages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.ops.beam import beam_search
from controlled_peptide_generation_tpu.train.train_vae import (
    make_train_step, make_train_scan)
from controlled_peptide_generation_tpu.latent import density, logreg
from controlled_peptide_generation_tpu.latent.fused import _fused_round


@pytest.fixture(scope="module")
def setup():
    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=14, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    return cfg, model, params, rf


def test_train_scan_equals_sequential_steps(setup):
    cfg, model, params, rf = setup
    U, B = 5, 6
    key = jax.random.PRNGKey(7)
    texts = jax.random.randint(key, (U, B, 10), 4, 14).astype(jnp.int32)
    texts = texts.at[..., 0].set(2).at[..., 8].set(3)

    step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                donate=False)
    p1, o1 = params, opt.init(params)
    for i in range(U):
        p1, o1, m1 = step(p1, o1, jax.random.fold_in(key, i), texts[i],
                          jnp.asarray(i, jnp.int32))

    chunk, opt2 = make_train_scan(model, cfg.vae, cfg.losses, rf, U,
                                  donate=False)
    p2, o2, m2 = chunk(params, opt2.init(params), key, texts,
                       jnp.asarray(0, jnp.int32))

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # last-step metrics match too
    assert abs(float(m1["L_vae"]) - float(m2["L_vae"])) < 1e-5


def test_fused_round_equals_composed_stages(setup):
    cfg, model, params, rf = setup
    from controlled_peptide_generation_tpu.latent import gmm

    D = model.z_dim
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(200, D)).astype(np.float32)
    lv = np.full((200, D), -1.0, np.float32)
    Q = density.mogQ(mu, lv, n_components=4, z_num_samples=2,
                     key=jax.random.PRNGKey(0))
    w = jnp.zeros(D).at[0].set(1.0)
    clf_w = jnp.stack([w, -w])
    clf_b = jnp.array([0.2, -0.1])
    targets = jnp.array([1, 0])

    key = jax.random.PRNGKey(9)
    n = 64
    z, c, probs, accum, accept, tokens = _fused_round(
        model, params, key, "gmm_diag", Q.params, clf_w, clf_b, targets, n)

    # recompute every stage from the same subkeys
    kz, ku, kc = jax.random.split(key, 3)
    z_ref = gmm.sample(kz, Q.params, n, "diag")
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-6)
    p1 = jax.nn.sigmoid(z_ref @ clf_w.T + clf_b[None, :])
    probs_ref = jnp.where(targets[None, :] == 1, p1, 1.0 - p1)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref),
                               atol=1e-6)
    accept_ref = jax.random.uniform(ku, (n,)) < jnp.prod(probs_ref, axis=1)
    np.testing.assert_array_equal(np.asarray(accept),
                                  np.asarray(accept_ref))
    c_ref = model.sample_c_prior(kc, n)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref))
    hyps, _ = beam_search(model, params, z_ref, c_ref, beam_size=5,
                          n_best=1)
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(hyps[:, 0, :]))
