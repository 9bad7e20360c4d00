import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import sampling
from controlled_peptide_generation_tpu.data.vocab import (
    PAD_IDX, START_IDX, EOS_IDX)


@pytest.fixture(scope="module")
def small_model():
    cfg = C.default_config()
    cfg.model.z_dim = 16
    cfg.model.emb_dim = 12
    cfg.model.E_args.h_dim = 10
    model = build_model(cfg.model, n_vocab=14, max_seq_len=12)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def rand_tokens(key, B, T, V):
    toks = jax.random.randint(key, (B, T), 4, V)
    toks = toks.at[:, 0].set(START_IDX)
    toks = toks.at[:, 6].set(EOS_IDX)
    toks = toks.at[:, 7:].set(PAD_IDX)
    return toks.astype(jnp.int32)


def test_forward_shapes(small_model):
    model, params = small_model
    key = jax.random.PRNGKey(1)
    toks = rand_tokens(key, 5, 12, 14)
    (mu, lv), (z, c), logits = model.forward(params, key, toks,
                                             q_c="prior", sample_z=1)
    assert mu.shape == (5, 16) and lv.shape == (5, 16)
    assert z.shape == (5, 16) and c.shape == (5, 2)
    assert logits.shape == (5, 12, 14)
    # one-hot prior c
    assert np.allclose(np.asarray(c).sum(1), 1.0)


def test_forward_sample_z_max(small_model):
    model, params = small_model
    key = jax.random.PRNGKey(2)
    toks = rand_tokens(key, 3, 12, 14)
    (mu, _), (z, _), _ = model.forward(params, key, toks, sample_z="max",
                                       train=False)
    np.testing.assert_allclose(np.asarray(z), np.asarray(mu))


def test_forward_classifier_c(small_model):
    model, params = small_model
    key = jax.random.PRNGKey(3)
    toks = rand_tokens(key, 4, 12, 14)
    _, (_, c), _ = model.forward(params, key, toks, q_c="classifier",
                                 train=False)
    assert np.allclose(np.asarray(c).sum(1), 1.0, atol=1e-5)
    assert (np.asarray(c) > 0).all()


def test_forward_labels_c(small_model):
    model, params = small_model
    key = jax.random.PRNGKey(4)
    toks = rand_tokens(key, 4, 12, 14)
    labels = jnp.array([0, 1, 1, 0])
    _, (_, c), _ = model.forward(params, key, toks, labels=labels)
    np.testing.assert_allclose(np.asarray(c),
                               np.eye(2)[np.array([0, 1, 1, 0])])


def test_pad_embeds_to_zero(small_model):
    model, params = small_model
    from controlled_peptide_generation_tpu.ops import nn
    emb = nn.embed(params["emb"], jnp.array([[PAD_IDX]]))
    assert np.abs(np.asarray(emb)).max() == 0.0


def test_dropout_only_in_train(small_model):
    model, params = small_model
    key = jax.random.PRNGKey(5)
    toks = rand_tokens(key, 4, 12, 14)
    z = model.sample_z_prior(key, 4)
    c = model.sample_c_prior(key, 4)
    l1 = model.decode_train(params, key, toks, z, c, train=False)
    l2 = model.decode_train(params, jax.random.PRNGKey(99), toks, z, c,
                            train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))
    l3 = model.decode_train(params, key, toks, z, c, train=True)
    assert np.abs(np.asarray(l1) - np.asarray(l3)).max() > 1e-6


def test_decode_step_matches_unfactored_projection(small_model):
    """The free-running decoder step factors the GRU input projection into
    a [V, 3H] token table + a per-sequence (z, c) vector (decoder.py
    apply_step). It must agree with the direct gru_cell on the
    concatenated [emb, z, c] input — hard and soft token paths."""
    from controlled_peptide_generation_tpu.ops import nn
    from controlled_peptide_generation_tpu.ops.gru import gru_cell

    model, params = small_model
    key = jax.random.PRNGKey(3)
    B = 6
    z = model.sample_z_prior(key, B)
    c = model.sample_c_prior(jax.random.fold_in(key, 1), B)
    h = model.init_decoder_hidden(params, z, c)
    tok = jax.random.randint(jax.random.fold_in(key, 2), (B,), 0, 14,
                             jnp.int32)
    soft = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(key, 3), (B, 14)))

    def reference_step(token_hard, token_soft):
        emb = (nn.soft_embed(params["emb"], token_soft)
               if token_soft is not None
               else nn.embed(params["emb"], token_hard))
        x = jnp.concatenate([emb, z, c], axis=1)
        return gru_cell(params["dec"]["gru"], x, h)

    for hard, softp in ((tok, None), (None, soft)):
        _, h_new = model.decode_step(params, hard, softp, z, c, h)
        h_ref = reference_step(hard, softp)
        np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_ref),
                                   rtol=2e-5, atol=2e-6)


def test_sampling_hard_modes(small_model):
    model, params = small_model
    key = jax.random.PRNGKey(6)
    z = model.sample_z_prior(key, 8)
    c = model.sample_c_prior(key, 8)

    for mode in ("greedy", "categorical"):
        seq = sampling.sample_sentences(model, params, key, z, c,
                                        sample_mode=mode)
        seq = np.asarray(seq)
        assert seq.shape == (8, model.max_seq_len + 1)
        assert (seq[:, 0] == START_IDX).all()
        # after first EOS everything is PAD
        for row in seq:
            eos = np.where(row == EOS_IDX)[0]
            if len(eos):
                assert (row[eos[0] + 1:] == PAD_IDX).all()

    g1 = sampling.sample_sentences(model, params, key, z, c,
                                   sample_mode="greedy")
    g2 = sampling.sample_sentences(model, params, key, z, c,
                                   sample_mode="greedy")
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_sampling_soft_modes(small_model):
    model, params = small_model
    key = jax.random.PRNGKey(7)
    z = model.sample_z_prior(key, 4)
    c = model.sample_c_prior(key, 4)
    hard, soft = sampling.sample_sentences(model, params, key, z, c,
                                           sample_mode="greedy_softmax")
    assert np.asarray(hard).shape == (4, model.max_seq_len + 1)
    assert np.asarray(soft).shape == (4, model.max_seq_len + 1, 14)
    # none_softmax never updates the hard track (reference quirk)
    hard2, _ = sampling.sample_sentences(model, params, key, z, c,
                                         sample_mode="none_softmax")
    assert (np.asarray(hard2) == START_IDX).all()


def test_prevent_empty(small_model):
    model, params = small_model
    key = jax.random.PRNGKey(8)
    z = model.sample_z_prior(key, 16)
    c = model.sample_c_prior(key, 16)
    # greedy: the -2|min| masking puts specials strictly below every
    # real-token logit, so argmax can never pick them at step 0
    seq = sampling.sample_sentences(model, params, key, z, c,
                                    sample_mode="greedy",
                                    prevent_empty=True)
    first = np.asarray(seq)[:, 1]
    assert not np.isin(first, [PAD_IDX, START_IDX, EOS_IDX]).any()


def test_flow_apply_invertible_logdet():
    from controlled_peptide_generation_tpu.models import flow as F
    key = jax.random.PRNGKey(0)
    for ftype in ("planar", "radial", "alternating"):
        p = F.init(key, ftype, 4, 8)
        z = jax.random.normal(jax.random.PRNGKey(1), (6, 8))
        z2, ld = F.apply(p, ftype, z)
        assert z2.shape == z.shape and ld.shape == (6,)
        assert np.isfinite(np.asarray(z2)).all()
        assert np.isfinite(np.asarray(ld)).all()


def test_kl_flow_mc_identity_matches_analytic():
    """With an identity 'flow' (z_K = z0, logdet 0) the MC estimate's
    expectation is the analytic KL(q||p): check on a large sample."""
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu.ops import losses as L

    key = jax.random.PRNGKey(0)
    mu = jnp.array([[0.7, -0.3, 0.1]]).repeat(20000, 0)
    logvar = jnp.array([[0.2, -0.5, 0.0]]).repeat(20000, 0)
    eps = jax.random.normal(key, mu.shape)
    z0 = mu + jnp.exp(logvar / 2) * eps
    mc = L.kl_flow_mc(mu, logvar, z0, z0, jnp.zeros(mu.shape[0]))
    analytic = L.kl_gaussianprior(mu, logvar)
    np.testing.assert_allclose(float(mc), float(analytic), rtol=0.05)


def test_flow_posterior_training_learns_and_moves_flow_params():
    """Phase-1 training with model.flow>0 / flow_mode=posterior: the
    reference shipped config switches for this but raises at train time —
    here it is a first-class training mode."""
    import jax
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.ops import losses as L
    from controlled_peptide_generation_tpu.train.train_vae import (
        make_train_step)

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.vae.z_regu_loss = "kl"
    cfg.model.z_dim = 8
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    cfg.model.flow = 2
    cfg.model.flow_type = "alternating"
    cfg.model.flow_mode = "posterior"
    model = build_model(cfg.model, n_vocab=14, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "flow" in params
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                donate=False)
    o = opt.init(params)
    key = jax.random.PRNGKey(2)
    losses = []
    p = params
    for it in range(40):
        toks = jax.random.randint(jax.random.fold_in(key, it), (16, 10),
                                  4, 14, jnp.int32).at[:, 0].set(2)
        p, o, m = step(p, o, jax.random.fold_in(key, it), toks,
                       jnp.asarray(it, jnp.int32))
        losses.append(float(m["L_vae_recon"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # the flow itself must receive gradients
    d = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
        jax.tree_util.tree_leaves(params["flow"]),
        jax.tree_util.tree_leaves(p["flow"])))
    assert d > 0


def test_generation_flow_mode_gating():
    """gen_prior applies the flow to prior z (reference model.py:210-214);
    posterior does not."""
    import jax
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.generation import (
        generate_sentences)

    outs = {}
    for mode in ("gen_prior", "posterior"):
        cfg = C.default_config()
        cfg.model.z_dim = 8
        cfg.model.emb_dim = 10
        cfg.model.E_args.h_dim = 8
        cfg.model.flow = 2
        cfg.model.flow_type = "planar"
        cfg.model.flow_mode = mode
        model = build_model(cfg.model, n_vocab=14, max_seq_len=10)
        params = model.init_params(jax.random.PRNGKey(0))
        # make the flow act non-trivially so the two modes differ
        params["flow"]["planar"]["scale"] = (
            params["flow"]["planar"]["scale"] + 2.0)
        params["flow"]["planar"]["w"] = (
            params["flow"]["planar"]["w"] + 1.0)
        _, z_out, _ = generate_sentences(model, params,
                                         jax.random.PRNGKey(3), 4,
                                         sample_mode="greedy")
        outs[mode] = np.asarray(z_out)
    assert not np.allclose(outs["gen_prior"], outs["posterior"])
