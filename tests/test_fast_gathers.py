"""Exactness of the TPU fast-gather lowerings (ops/nn.py).

On TPU the beam step's dynamic gathers / top_k sort are replaced by
select chains, iterated argmax and one-hot matmuls (enabled at trace time
on the TPU backend). They must be BIT-exact vs the generic lowerings —
these tests force the fast path on the CPU test backend and compare,
including through the full beam search vs its default-path output, for
both hidden-state families (GRU array, transformer KV-cache pytree).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import nn
from controlled_peptide_generation_tpu.ops.beam import beam_search


@pytest.fixture()
def force_fast():
    nn.set_fast_gathers(True)
    jax.clear_caches()          # jitted fns bake the flag in at trace time
    yield
    nn.set_fast_gathers(None)
    jax.clear_caches()


def _quantized(key, shape, q=4.0):
    """Coarsely quantized normals: guaranteed duplicate values, so tie
    handling is actually exercised. Signed zeros are canonicalized to
    +0.0 — topk_small's documented precondition (top_k ranks +0.0 above
    -0.0; argmax treats them equal), enforced by the beam layer."""
    x = jnp.round(jax.random.normal(key, shape) * q) / q
    return jnp.where(x == 0.0, 0.0, x)


def test_topk_small_signed_zero_after_canonicalization():
    """The exact -0.0 row that diverges raw must match once the beam
    layer's -0.0 -> +0.0 rewrite is applied."""
    x = jnp.asarray([[-0.75, -0.75, -1.5, 0.25, -0.0, 0.0, -0.25]])
    x = jnp.where(x == 0.0, 0.0, x)
    v_ref, i_ref = jax.lax.top_k(x, 3)
    v, i = nn.topk_small(x, 3)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("k,n", [(5, 130), (3, 7), (1, 126), (4, 4)])
def test_topk_small_matches_lax_top_k(k, n):
    x = _quantized(jax.random.PRNGKey(0), (64, n))
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = nn.topk_small(x, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_topk_small_first_advance_shape():
    # the beam's first advance: rows 1..K-1 all -inf, row 0 finite (>= k
    # finite entries total, the documented precondition)
    K, V = 5, 26
    row0 = _quantized(jax.random.PRNGKey(1), (8, V))
    x = jnp.concatenate([row0, jnp.full((8, (K - 1) * V), -jnp.inf)], 1)
    v_ref, i_ref = jax.lax.top_k(x, K)
    v, i = nn.topk_small(x, K)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("trailing", [(), (7,), (3, 4)])
def test_take_small_axis1_matches_take_along_axis(trailing):
    key = jax.random.PRNGKey(2)
    B, K = 9, 5
    a = jax.random.normal(key, (B, K) + trailing)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (B, K), 0, K)
    ref = jnp.take_along_axis(
        a, idx.reshape(B, K, *([1] * len(trailing))), axis=1)
    out = nn.take_small_axis1(a, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_select_small_matches_indexing():
    key = jax.random.PRNGKey(3)
    row = jax.random.normal(key, (11, 5))
    i = jax.random.randint(jax.random.fold_in(key, 1), (11,), 0, 5)
    ref = jnp.take_along_axis(row, i[:, None], axis=1)[:, 0]
    out = jax.vmap(nn.select_small)(row, i)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # scalar form
    assert float(nn.select_small(row[0], jnp.asarray(3))) == float(row[0, 3])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_table_lookup_exact(force_fast, dtype):
    table = jax.random.normal(jax.random.PRNGKey(4), (26, 306)).astype(dtype)
    ix = jax.random.randint(jax.random.PRNGKey(5), (64, 7), 0, 26)
    out = nn.table_lookup(table, ix)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[ix]))


def test_table_lookup_signed_zero_both_paths_agree():
    """A -0.0 table entry must come out IDENTICAL (as +0.0) on the fast
    and default paths — the one-hot matmul's zero-term sum flips the
    sign bit, so table_lookup canonicalizes on both paths."""
    table = jnp.asarray([[-0.0, 1.0], [2.0, -0.0], [0.5, -0.5]])
    ix = jnp.asarray([0, 1, 2])
    outs = {}
    for flag in (False, True):
        nn.set_fast_gathers(flag)
        jax.clear_caches()
        try:
            outs[flag] = np.asarray(nn.table_lookup(table, ix))
        finally:
            nn.set_fast_gathers(None)
            jax.clear_caches()
    np.testing.assert_array_equal(outs[True], outs[False])
    # and the zero really is +0.0 on both
    assert np.signbit(outs[True][0, 0]) == np.signbit(outs[False][0, 0])
    assert not np.signbit(outs[True][0, 0])


@pytest.mark.parametrize("seed,K,n_best", [(0, 4, 3), (1, 5, 1)])
def test_beam_search_fast_path_bit_exact(seed, K, n_best):
    """Full beam search, fast path vs default path: token-exact hyps and
    bit-exact scores."""
    cfg = C.default_config()
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=13, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(42))
    key = jax.random.PRNGKey(seed)
    kz, kc = jax.random.split(key)
    z = model.sample_z_prior(kz, 6)
    c = model.sample_c_prior(kc, 6)

    nn.set_fast_gathers(False)
    jax.clear_caches()
    try:
        hyps_ref, scores_ref = jax.tree.map(
            np.asarray, beam_search(model, params, z, c, beam_size=K,
                                    n_best=n_best))
        nn.set_fast_gathers(True)
        jax.clear_caches()
        hyps, scores = jax.tree.map(
            np.asarray, beam_search(model, params, z, c, beam_size=K,
                                    n_best=n_best))
    finally:
        nn.set_fast_gathers(None)
        jax.clear_caches()
    np.testing.assert_array_equal(hyps, hyps_ref)
    np.testing.assert_array_equal(scores, scores_ref)


def _beam_both_paths(model, params, z, c, K, n_best):
    nn.set_fast_gathers(False)
    jax.clear_caches()
    try:
        ref = jax.tree.map(np.asarray,
                           beam_search(model, params, z, c, beam_size=K,
                                       n_best=n_best))
        nn.set_fast_gathers(True)
        jax.clear_caches()
        out = jax.tree.map(np.asarray,
                           beam_search(model, params, z, c, beam_size=K,
                                       n_best=n_best))
    finally:
        nn.set_fast_gathers(None)
        jax.clear_caches()
    return out, ref


def test_beam_search_fast_path_bit_exact_transformer():
    """Same bit-compare over the transformer's dict KV-cache hidden
    pytree: the [B,K,S,D] cache leaves exceed the select-chain leaf-size
    gate (gather path) while the [B,K] pos leaf stays on it — both leaf
    classes are exercised in one search."""
    cfg = C.default_config()
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.E_class = "transformer"
    cfg.model.G_args.G_class = "transformer"
    model = build_model(cfg.model, n_vocab=13, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(7))
    kz, kc = jax.random.split(jax.random.PRNGKey(8))
    z = model.sample_z_prior(kz, 5)
    c = model.sample_c_prior(kc, 5)
    (hyps, scores), (hyps_ref, scores_ref) = _beam_both_paths(
        model, params, z, c, K=4, n_best=2)
    np.testing.assert_array_equal(hyps, hyps_ref)
    np.testing.assert_array_equal(scores, scores_ref)


def test_beam_search_fast_path_wide_beam_fallback():
    """beam_size > V - 2 violates topk_small's finite-entries
    precondition; the fast path must fall back to lax.top_k there and
    still match the default path exactly."""
    cfg = C.default_config()
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=13, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(9))
    kz, kc = jax.random.split(jax.random.PRNGKey(10))
    z = model.sample_z_prior(kz, 4)
    c = model.sample_c_prior(kc, 4)
    (hyps, scores), (hyps_ref, scores_ref) = _beam_both_paths(
        model, params, z, c, K=12, n_best=3)
    np.testing.assert_array_equal(hyps, hyps_ref)
    np.testing.assert_array_equal(scores, scores_ref)
