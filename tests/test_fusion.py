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


@pytest.mark.quick
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
    # decode_dtype float32 here: this test asserts BIT-exact equality with
    # the composed stages (the bf16 default is covered by the quality test)
    z, c, probs, accum, accept, tokens = _fused_round(
        model, params, key, "gmm_diag", Q.params, clf_w, clf_b, targets, n,
        decode_dtype="float32")

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


def test_compact_round_matches_decode_all_accepted_subset(setup):
    """Accepted-only decode (capacity=K): the valid compacted slots must
    hold EXACTLY the decode-all round's accepted candidates — same order,
    same tokens, same z/score rows — for the same key."""
    cfg, model, params, rf = setup
    from controlled_peptide_generation_tpu.latent import density, logreg
    from controlled_peptide_generation_tpu.latent.fused import fused_round

    D = model.z_dim
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(200, D)).astype(np.float32)
    lv = np.full((200, D), -1.0, np.float32)
    Q = density.mogQ(mu, lv, n_components=4, z_num_samples=2,
                     key=jax.random.PRNGKey(0))
    w = jnp.zeros(D).at[0].set(1.0)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w, b=jnp.asarray(0.2)),
         "tox": logreg.LogRegParams(w=-w, b=jnp.asarray(-0.1))},
        {"amp": 1, "tox": 0})

    key = jax.random.PRNGKey(11)
    n = 64
    z_all, sc_all, acc_all, tok_all = fused_round(
        model, params, key, Q, n, decode_dtype="float32")
    acc_np = np.asarray(acc_all)
    n_acc = int(acc_np.sum())
    assert 0 < n_acc < n, "test needs a mixed accept mask"

    # ample capacity: every accepted candidate gets a decode slot
    cap = n_acc + 4
    z_c, sc_c, acc_c, tok_c, idx, valid = fused_round(
        model, params, key, Q, n, decode_dtype="float32", capacity=cap)
    np.testing.assert_array_equal(np.asarray(acc_c), acc_np)
    v = np.asarray(valid)
    assert int(v.sum()) == n_acc and v[:n_acc].all()
    acc_idx = np.nonzero(acc_np)[0]
    np.testing.assert_array_equal(np.asarray(idx)[:n_acc], acc_idx)
    np.testing.assert_array_equal(np.asarray(tok_c)[:n_acc],
                                  np.asarray(tok_all)[acc_idx])
    np.testing.assert_allclose(np.asarray(z_c)[:n_acc],
                               np.asarray(z_all)[acc_idx], atol=1e-6)
    for k in sc_all:
        np.testing.assert_allclose(np.asarray(sc_c[k])[:n_acc],
                                   np.asarray(sc_all[k])[acc_idx],
                                   atol=1e-6)

    # tight capacity: a PREFIX of the accepted stream survives
    cap2 = max(n_acc // 2, 1)
    _, _, _, tok_t, idx_t, valid_t = fused_round(
        model, params, key, Q, n, decode_dtype="float32", capacity=cap2)
    vt = np.asarray(valid_t)
    assert vt.all()  # more accepted than slots: every slot is valid
    np.testing.assert_array_equal(np.asarray(idx_t), acc_idx[:cap2])
    np.testing.assert_array_equal(np.asarray(tok_t),
                                  np.asarray(tok_all)[acc_idx[:cap2]])


def test_beam_chunk_slicing_is_bit_exact(setup):
    """The production 50k-candidate rounds decode in <=beam_chunk-sentence
    slices inside one program (a workaround for a TPU backend fault at
    >25k-sentence beam kernels, see latent/fused.py + tools/
    repro_beam_fault.py). The sliced branch must be bit-identical to the
    single-kernel decode across a chunk boundary, in both decode modes."""
    cfg, model, params, rf = setup
    from controlled_peptide_generation_tpu.latent.fused import fused_round

    D = model.z_dim
    rng = np.random.default_rng(3)
    mu = rng.normal(size=(200, D)).astype(np.float32)
    lv = np.full((200, D), -1.0, np.float32)
    Q = density.mogQ(mu, lv, n_components=4, z_num_samples=2,
                     key=jax.random.PRNGKey(0))
    w = jnp.zeros(D).at[0].set(1.0)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w, b=jnp.asarray(0.2)),
         "tox": logreg.LogRegParams(w=-w, b=jnp.asarray(-0.1))},
        {"amp": 1, "tox": 0})

    key = jax.random.PRNGKey(13)
    n = 64
    # decode-all: 64 sentences in one kernel vs 24+24+16 slices
    big = fused_round(model, params, key, Q, n, decode_dtype="float32")
    small = fused_round(model, params, key, Q, n, decode_dtype="float32",
                        beam_chunk=24)
    for a, b in zip(big, small):
        if isinstance(a, dict):
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # accepted-only: capacity 40 decoded as 16+16+8 slices
    big_c = fused_round(model, params, key, Q, n, decode_dtype="float32",
                        capacity=40)
    small_c = fused_round(model, params, key, Q, n, decode_dtype="float32",
                          capacity=40, beam_chunk=16)
    for a, b in zip(big_c[:4], small_c[:4]):
        if isinstance(a, dict):
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(big_c[4]),
                                  np.asarray(small_c[4]))
    np.testing.assert_array_equal(np.asarray(big_c[5]),
                                  np.asarray(small_c[5]))


def test_bf16_decode_quality_vs_fp32():
    """hw.gen_dtype offers a bfloat16 CLaSS decode (the fp32 default won
    the Pallas-kernel era, BENCH.md "gen_dtype flip"). Quality gate:
    the fp32-rescored log-prob of bf16-decoded beam hypotheses must be
    within a small gap of the fp32-decoded ones (beam score bookkeeping is
    fp32 in both cases)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.ops import losses as L
    from controlled_peptide_generation_tpu.ops.beam import beam_search
    from controlled_peptide_generation_tpu.train.train_vae import (
        make_train_step)

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 16
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=14, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(0))
    # train briefly so logits aren't uniform noise
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                donate=False)
    o = opt.init(params)
    key = jax.random.PRNGKey(2)
    for it in range(30):
        toks = jax.random.randint(jax.random.fold_in(key, it), (32, 10),
                                  4, 14, jnp.int32).at[:, 0].set(2)
        params, o, _ = step(params, o, jax.random.fold_in(key, it), toks,
                            jnp.asarray(it, jnp.int32))

    B = 64
    z = model.sample_z_prior(jax.random.PRNGKey(5), B)
    c = model.sample_c_prior(jax.random.PRNGKey(6), B)
    p16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    def rescore(toks):
        lg = model.decode_train(params, jax.random.PRNGKey(0),
                                toks[:, :-1], z, c, train=False)
        lp = jax.nn.log_softmax(lg, axis=-1)
        tgt = toks[:, 1:]
        pick = jnp.take_along_axis(lp, tgt[:, :, None], axis=2)[..., 0]
        from controlled_peptide_generation_tpu.data.vocab import (
            EOS_IDX, PAD_IDX)
        live = tgt != PAD_IDX
        return jnp.sum(jnp.where(live, pick, 0.0), axis=1)

    h32, _ = beam_search(model, params, z, c, beam_size=5, n_best=1)
    h16, _ = beam_search(model, p16, z.astype(jnp.bfloat16),
                         c.astype(jnp.bfloat16), beam_size=5, n_best=1)
    s32 = np.asarray(rescore(h32[:, 0]))
    s16 = np.asarray(rescore(h16[:, 0]))
    # mean fp32-rescored quality gap under bf16 decode: small
    gap = float(np.mean(s32 - s16))
    assert gap < 0.25, (gap, s32.mean(), s16.mean())


def test_fused_round_applies_flow_like_composed_path():
    """Flow models (gen_prior) must decode flow(z) in the fused round, the
    same latents the non-fused generate_sentences path decodes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.latent import density, logreg
    from controlled_peptide_generation_tpu.latent.fused import fused_round
    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.ops.beam import beam_search

    cfg = C.default_config()
    cfg.model.z_dim = 8
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    cfg.model.flow = 2
    cfg.model.flow_type = "planar"
    model = build_model(cfg.model, n_vocab=14, max_seq_len=8)
    params = model.init_params(jax.random.PRNGKey(0))
    # make the flow act non-trivially
    params["flow"]["planar"]["scale"] = (
        params["flow"]["planar"]["scale"] + 2.0)
    params["flow"]["planar"]["w"] = params["flow"]["planar"]["w"] + 1.0

    key = jax.random.PRNGKey(1)
    mu = 0.3 * jax.random.normal(key, (100, model.z_dim))
    lv = jnp.full((100, model.z_dim), -1.5)
    Q = density.mogQ(np.asarray(mu), np.asarray(lv), n_components=4,
                     z_num_samples=2, covariance_type="diag", key=key)
    w = jnp.zeros(model.z_dim).at[0].set(1.0)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w, b=jnp.asarray(0.1)),
         "tox": logreg.LogRegParams(w=-w, b=jnp.asarray(-0.2))},
        {"amp": 1, "tox": 0})

    z, scores, accept, tokens = fused_round(model, params, key, Q, 32,
                                            decode_dtype="float32")
    # recompute: same draws, flow applied, c from the same subkey
    kz, ku, kc = jax.random.split(key, 3)
    from controlled_peptide_generation_tpu.latent import gmm
    z_ref = gmm.sample(kz, Q.params, 32, "diag")
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-6)
    z_flowed, _ = model.apply_flow(params, z_ref)
    assert float(jnp.abs(z_flowed - z_ref).max()) > 1e-3  # flow non-trivial
    c = model.sample_c_prior(kc, 32)
    hyps, _ = beam_search(model, params, z_flowed, c, beam_size=5, n_best=1)
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(hyps[:, 0, :]))


def test_heldout_vmap_equals_per_batch(setup):
    """The one-dispatch heldout evaluator (train_vae._heldout_fn vmaps all
    batches into one program; the old path dispatched each batch alone with
    per-value syncs) is a pure re-batching: stacked results must equal the
    same fn over singleton stacks."""
    from controlled_peptide_generation_tpu.train.train_vae import (
        _heldout_fn)
    cfg, model, params, rf = setup
    n, B = 3, 6
    key = jax.random.PRNGKey(11)
    texts = jax.random.randint(key, (n, B, 10), 4, 14).astype(jnp.int32)
    texts = texts.at[..., 0].set(2).at[..., 7].set(3)
    keys = jnp.stack([jax.random.fold_in(key, i) for i in range(n)])

    fn = _heldout_fn(model)
    r_all, k_all, mu_all, lv_all = fn(params, keys, texts)
    assert r_all.shape == (n,) and mu_all.shape == (n, B, model.z_dim)
    for i in range(n):
        r1, k1, mu1, lv1 = fn(params, keys[i:i + 1], texts[i:i + 1])
        np.testing.assert_allclose(float(r1[0]), float(r_all[i]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(k1[0]), float(k_all[i]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mu1[0]),
                                   np.asarray(mu_all[i]), atol=1e-6)


def test_heldout_handles_ragged_batches(setup):
    """Epoch-tail batches from non-weighted iterators can be short; the
    evaluator must fall back to per-shape dispatch instead of crashing on
    np.stack (and still pool encodings across all rows)."""
    from controlled_peptide_generation_tpu.train.train_vae import (
        evaluate_heldout)
    cfg, model, params, rf = setup

    key = jax.random.PRNGKey(13)
    shapes = [6, 6, 3, 6]   # one short epoch-tail batch

    class FakeDataset:
        _iters = {"hld_vae": None}

        def __init__(self):
            self._n = 0

        def next_batch(self, name):
            B = shapes[self._n]
            self._n += 1
            t = jax.random.randint(jax.random.fold_in(key, self._n),
                                   (B, 10), 4, 14).astype(jnp.int32)
            t = t.at[:, 0].set(2).at[:, 7].set(3)

            class B_:
                text = np.asarray(t)
            return B_

    out = evaluate_heldout(model, params, FakeDataset(),
                           jax.random.PRNGKey(14))
    assert set(out) == {"recon", "kl", "cov_frob"}
    assert np.isfinite(out["recon"]) and np.isfinite(out["cov_frob"])


def test_aligned_unroll():
    """Chunk width: the largest divisor of the cadences' gcd that fits
    under the requested unroll — never the over-shrunk plain gcd."""
    from controlled_peptide_generation_tpu.train.train_vae import (
        aligned_unroll)
    assert aligned_unroll(50, 500, 20000) == 50
    assert aligned_unroll(64, 500, 20000) == 50   # gcd would say 4
    assert aligned_unroll(7, 500, 20000) == 5     # gcd would say 1
    assert aligned_unroll(50, 10, 25) == 5        # tiny profile
    assert aligned_unroll(1, 500, 20000) == 1
    assert aligned_unroll(100, 100, 100) == 100
