"""Transformer enc-dec family (stretch component, no reference counterpart).

The critical property is cache/teacher-forced consistency: the free-running
KV-cache step path must produce EXACTLY the logits of the one-pass causal
teacher-forced decode, position by position — that is what guarantees the
sampling/beam engines see the same model as the training loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.data.vocab import PAD_IDX
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import beam as beam_mod
from controlled_peptide_generation_tpu.ops import sampling

V, T = 14, 10


def tfm_model(E_class="transformer", G_class="transformer"):
    cfg = C.default_config()
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 16
    cfg.model.E_args.E_class = E_class
    cfg.model.E_args.T_args.update(d_model=32, n_layers=2, d_ff=64,
                                   n_heads=2)
    cfg.model.G_args.G_class = G_class
    cfg.model.G_args.T_args.update(d_model=32, n_layers=2, d_ff=64,
                                   n_heads=2)
    model = build_model(cfg.model, n_vocab=V, max_seq_len=T)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def rand_tokens(key, B):
    toks = jax.random.randint(key, (B, T), 4, V)
    return toks.at[:, 0].set(2).astype(jnp.int32)


def test_step_matches_teacher_forced_logits():
    """Replaying a token sequence through the KV cache reproduces the
    causal one-pass logits exactly (train=False: no dropout)."""
    _, model, params = tfm_model()
    B = 3
    key = jax.random.PRNGKey(1)
    toks = rand_tokens(key, B)
    z = model.sample_z_prior(jax.random.fold_in(key, 1), B)
    c = model.sample_c_prior(jax.random.fold_in(key, 2), B)

    tf_logits = model.decode_train(params, jax.random.PRNGKey(9), toks,
                                   z, c, train=False)     # [B, T, V]

    h = model.init_decoder_hidden(params, z, c)
    step_logits = []
    for t in range(T):
        lg, h = model.decode_step(params, toks[:, t], None, z, c, h)
        step_logits.append(lg)
    step_logits = jnp.stack(step_logits, axis=1)

    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(tf_logits), rtol=2e-5, atol=2e-5)


def test_encoder_ignores_pad_positions():
    _, model, params = tfm_model()
    key = jax.random.PRNGKey(3)
    toks = rand_tokens(key, 2)
    toks = toks.at[:, 6:].set(PAD_IDX)
    mu1, lv1 = model.encode(params, toks)
    # the attention mask must silence PAD positions: replacing the PAD
    # tail with garbage tokens while keeping the mask's view of "real"
    # positions... is impossible through encode(), so instead check via
    # apply_encoder directly with a fixed pad_mask and differing tails
    from controlled_peptide_generation_tpu.models import transformer as tfm
    from controlled_peptide_generation_tpu.ops import nn as nn_ops
    pad_mask = jnp.asarray(np.asarray(toks != PAD_IDX))
    emb1 = nn_ops.embed(params["emb"], toks)
    garbage = toks.at[:, 6:].set(7)
    emb2 = nn_ops.embed(params["emb"], garbage)
    m1 = tfm.apply_encoder(params["enc"], emb1, pad_mask, n_heads=2)
    m2 = tfm.apply_encoder(params["enc"], emb2, pad_mask, n_heads=2)
    np.testing.assert_allclose(np.asarray(m1[0]), np.asarray(m2[0]),
                               atol=1e-5)
    mu2, lv2 = model.encode(params, toks)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-6)
    # and a DIFFERENT real prefix must change it
    toks3 = toks.at[:, 2].set(jnp.where(toks[:, 2] == 4, 5, 4))
    mu3, _ = model.encode(params, toks3)
    assert float(jnp.abs(mu1 - mu3).max()) > 1e-6


def test_sampling_engine_runs_all_modes():
    _, model, params = tfm_model()
    B = 4
    key = jax.random.PRNGKey(4)
    z = model.sample_z_prior(key, B)
    c = model.sample_c_prior(key, B)
    for mode in ("greedy", "categorical"):
        seq = sampling.sample_sentences(model, params, key, z, c,
                                        sample_mode=mode)
        assert seq.shape == (B, T + 1)
    seq, soft = sampling.sample_sentences(model, params, key, z, c,
                                          sample_mode="greedy_softmax")
    assert soft.shape == (B, T + 1, V)


def test_beam_search_with_kv_cache():
    """Beam over the pytree cache: top-1 score must equal the sum of
    per-step log-probs of the returned hypothesis under teacher forcing."""
    _, model, params = tfm_model()
    B, K, n_best = 3, 4, 2
    key = jax.random.PRNGKey(5)
    z = model.sample_z_prior(key, B)
    c = model.sample_c_prior(key, B)
    hyps, scores = beam_mod.beam_search(model, params, z, c, beam_size=K,
                                        n_best=n_best)
    assert hyps.shape == (B, n_best, T + 1)
    assert bool(jnp.all(scores[:, 0] >= scores[:, 1]))

    # rescore hypothesis 0 of each sentence by teacher-forced replay
    toks = hyps[:, 0, :]                                   # [B, T+1]
    tf_logits = model.decode_train(params, jax.random.PRNGKey(0),
                                   toks[:, :-1], z, c, train=False)
    logp = jax.nn.log_softmax(tf_logits, axis=-1)
    targets = toks[:, 1:]
    picked = jnp.take_along_axis(logp, targets[:, :, None], axis=2)[..., 0]
    from controlled_peptide_generation_tpu.data.vocab import EOS_IDX
    for b in range(B):
        tgt = np.asarray(targets[b])
        end = np.flatnonzero(tgt == EOS_IDX)
        L = (end[0] + 1) if len(end) else len(tgt)
        # PAD tail contributes nothing to the beam score
        want = float(np.asarray(picked[b][:L]).sum())
        np.testing.assert_allclose(float(scores[b, 0]), want, rtol=1e-4,
                                   atol=1e-4)


@pytest.mark.parametrize("E_class,G_class", [
    ("transformer", "transformer"),
    ("gru", "transformer"),
    ("transformer", "gru"),
])
def test_forward_and_train_step_learn(E_class, G_class):
    from controlled_peptide_generation_tpu.ops import losses as L
    from controlled_peptide_generation_tpu.train.train_vae import (
        make_train_step)
    cfg, model, params = tfm_model(E_class, G_class)
    cfg.vae.update(cfg.shared)
    cfg.vae.s_iter = 0
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                donate=False)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(2)
    losses = []
    p = params
    for it in range(30):
        toks = rand_tokens(jax.random.fold_in(key, it), 16)
        p, opt_state, m = step(p, opt_state, jax.random.fold_in(key, it),
                               toks, jnp.asarray(it, jnp.int32))
        losses.append(float(m["L_vae_recon"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_bf16_flag_actually_computes_bf16():
    """T_args.bf16 must run the blocks in bfloat16 (params cast at use),
    and stay numerically close to the fp32 path."""
    cfg, model, params = tfm_model()
    cfg16 = C.default_config()
    cfg16.model.update(cfg.model.copy())
    cfg16.model.E_args.T_args.bf16 = True
    cfg16.model.G_args.T_args.bf16 = True
    model16 = build_model(cfg16.model, n_vocab=V, max_seq_len=T)

    key = jax.random.PRNGKey(11)
    toks = rand_tokens(key, 4)
    mu32, _ = model.encode(params, toks)
    mu16, _ = model16.encode(params, toks)
    # same params, different compute dtype: close but NOT identical
    # (bit-identical would mean the flag is still a no-op)
    np.testing.assert_allclose(np.asarray(mu16), np.asarray(mu32),
                               rtol=0.05, atol=0.05)
    assert not np.array_equal(np.asarray(mu16), np.asarray(mu32))

    z = model.sample_z_prior(key, 4)
    c = model.sample_c_prior(key, 4)
    lg32 = model.decode_train(params, key, toks, z, c, train=False)
    lg16 = model16.decode_train(params, key, toks, z, c, train=False)
    np.testing.assert_allclose(np.asarray(lg16), np.asarray(lg32),
                               rtol=0.2, atol=0.2)
    assert not np.array_equal(np.asarray(lg16), np.asarray(lg32))


def test_transformer_cli_end_to_end(tmp_path):
    """Tiny phase-1 run + static-eval battery with the transformer family
    selected via CLI flags (the full user path, not just unit APIs)."""
    import main as main_mod
    import static_eval as se_mod
    from controlled_peptide_generation_tpu.api import (
        get_model_and_vocab_path, load_trained_model, load_vocab)

    argv = ["--tiny", "1", "--dataset", "synthetic", "--runname", "tfm",
            "--phase", "1",
            "--model.E_args.E_class", "transformer",
            "--model.G_args.G_class", "transformer",
            "--model.E_args.T_args.d_model", "32",
            "--model.E_args.T_args.d_ff", "64",
            "--model.G_args.T_args.d_model", "32",
            "--model.G_args.T_args.d_ff", "64",
            "--savepath_toplevel", str(tmp_path / "out"),
            "--tb_toplevel", str(tmp_path / "tb"),
            "--datapath", str(tmp_path / "data")]
    cfg = main_mod.main(argv)
    import os
    assert os.path.exists(cfg.vae.gen_samples_path)

    model_path, vocab_path, _ = get_model_and_vocab_path(cfg)
    vocab = load_vocab(vocab_path)
    model, params = load_trained_model(model_path, vocab.size(), cfg)
    assert model.G_class == "transformer"
    se_mod.test_sampling(model, params, vocab, n_samples=2)
    se_mod.test_reconstruction(model, params, vocab, "M K T A, K L L K")


def test_transformer_fused_round_matches_composed():
    """The fused CLaSS round drives the transformer family through the
    same KV-cache beam engine: token-exact vs the composed draw+decode
    stages for the same key."""
    from controlled_peptide_generation_tpu.latent import (density, gmm,
                                                          logreg)
    from controlled_peptide_generation_tpu.latent.fused import fused_round

    _, model, params = tfm_model()
    key = jax.random.PRNGKey(11)
    mu = 0.3 * jax.random.normal(key, (80, model.z_dim))
    lv = jnp.full((80, model.z_dim), -1.5)
    Q = density.mogQ(np.asarray(mu), np.asarray(lv), n_components=4,
                     z_num_samples=2, covariance_type="diag", key=key)
    w = jnp.zeros(model.z_dim).at[0].set(1.0)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w, b=jnp.asarray(0.1)),
         "tox": logreg.LogRegParams(w=-w, b=jnp.asarray(-0.2))},
        {"amp": 1, "tox": 0})

    n = 16
    z, scores, accept, tokens = fused_round(model, params, key, Q, n,
                                            decode_dtype="float32",
                                            beam_size=3)
    kz, ku, kc = jax.random.split(key, 3)
    z_ref = gmm.sample(kz, Q.params, n, "diag")
    c_ref = model.sample_c_prior(kc, n)
    hyps, _ = beam_mod.beam_search(model, params, z_ref, c_ref,
                                   beam_size=3, n_best=1)
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(hyps[:, 0, :]))
