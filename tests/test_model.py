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
