"""Parameter init + tiny functional layers.

Initializers reproduce the torch defaults the reference trains with, so loss
trajectories are statistically comparable:

* Linear / Conv: weight & bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  (torch kaiming_uniform(a=sqrt(5)) reduces to exactly this bound);
* Embedding: N(0, 1) with the PAD row zeroed (nn.Embedding padding_idx);
* GRU: all weights/biases ~ U(-1/sqrt(h_dim), 1/sqrt(h_dim)).

All parameters live in plain dict pytrees; layers are pure functions.
"""

import jax
import jax.numpy as jnp

from ..data.vocab import PAD_IDX


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key, in_dim, out_dim, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / in_dim ** 0.5
    return {"w": uniform(kw, (in_dim, out_dim), bound, dtype),
            "b": uniform(kb, (out_dim,), bound, dtype)}


def linear(p, x):
    return x @ p["w"] + p["b"]


def init_embedding(key, n_vocab, emb_dim, dtype=jnp.float32):
    w = jax.random.normal(key, (n_vocab, emb_dim), dtype)
    return {"w": w.at[PAD_IDX].set(0.0)}


def embed(p, ix):
    """Hard token lookup; PAD always embeds to the zero vector (and receives
    no gradient) by re-zeroing the row inside the computation. On TPU the
    lookup runs as a one-hot matmul (table_lookup below): exact same
    values, and the backward pass becomes an MXU matmul instead of a
    scatter-add."""
    w = p["w"].at[PAD_IDX].set(0.0)
    return table_lookup(w, ix)


def soft_embed(p, soft_ix):
    """[..., V] probabilities -> [..., emb_dim]; differentiable feedback path
    (reference: models/mutils.py:39-45)."""
    w = p["w"].at[PAD_IDX].set(0.0)
    return soft_ix @ w


def onehot(ix, n):
    return jax.nn.one_hot(ix, n, dtype=jnp.float32)


# ---- fast exact gathers (TPU) ----------------------------------------------
# XLA lowers small-axis dynamic gathers and small-k top_k to generic
# gather/sort emitters that are latency-bound on TPU. Each has an exact
# reformulation in ops the VPU/MXU run well: a K-way select chain, an
# iterated argmax, and a one-hot matmul. They compute bit-identical
# results (pure selection / single-nonzero dot rows, verified end-to-end
# in tests/test_fast_gathers.py and on hardware). Measured on the v5e
# chip (separate-process A/B, median of 8): the full GRU beam program is
# ~1.2x faster at beam_size=15 (the static_eval recon setting) and
# neutral at beam_size=5; the transformer KV-cache beam is neutral at
# both (its reorder stays on the gather path via the leaf-size gate in
# beam.py). Enabled at trace time on the TPU backend only — every
# measurement behind them is TPU; GPU's native gather/sort kernels have
# no such latency cliff. Tests force either path via set_fast_gathers.

_FAST_GATHERS = None   # None = auto (TPU backend); True/False = forced


def set_fast_gathers(value):
    """Force (True/False) or restore auto (None) fast-gather lowering.
    jit caches traces: tests toggling this must jax.clear_caches()."""
    global _FAST_GATHERS
    _FAST_GATHERS = value


def fast_gathers_enabled():
    if _FAST_GATHERS is not None:
        return _FAST_GATHERS
    return jax.default_backend() == "tpu"


def take_small_axis1(a, idx):
    """jnp.take_along_axis(a, idx[..., None...], axis=1) for a [B, K, ...]
    and idx [B, K] with small static K, as a K-way select chain: reads a
    K+1 times through fused elementwise selects instead of a dynamic
    gather. Indices must be in [0, K) — no clamp semantics."""
    K = a.shape[1]
    ex = idx.reshape(idx.shape + (1,) * (a.ndim - 2))
    out = jnp.broadcast_to(a[:, K - 1:K], a.shape)
    for j in range(K - 2, -1, -1):
        out = jnp.where(ex == j, a[:, j:j + 1], out)
    return out


def select_small(row, i):
    """row[i] for a [..., K] row and scalar/batched index i, small static K,
    as a select chain (vmap-friendly; used by the beam backtrace)."""
    K = row.shape[-1]
    out = row[..., K - 1]
    for j in range(K - 2, -1, -1):
        out = jnp.where(i == j, row[..., j], out)
    return out


def topk_small(x, k):
    """Exact jax.lax.top_k(x, k) for small k via k iterated (max, argmax)
    reductions with the found entry masked to -inf between iterations —
    O(kN) VPU reduces instead of a full [N] stable sort. Tie-breaking matches
    top_k exactly: argmax returns the lowest index among equal values,
    which is the stable-sort order.

    Preconditions: (1) every row has at least k entries strictly above
    -inf (masking cannot go below -inf, so all--inf tails would repeat
    index 0 — where lax.top_k would return distinct dead lanes); (2) no
    -0.0 entries — top_k's total order ranks +0.0 above -0.0 but argmax
    treats them equal, so canonicalize signed zeros first (beam.py
    does). Beam candidate rows satisfy both WHEN beam_size <= V - 2:
    blocked entries use the finite NEG, the first advance leaves >= V-2
    finite candidates in beam row 0 (BOS and possibly EOS blocked, the
    other K-1 rows all -inf), and _advance_one rewrites -0.0 to +0.0.
    beam.py enforces the bound by falling back to lax.top_k otherwise.
    """
    iota = jax.lax.iota(jnp.int32, x.shape[-1])
    iota = jnp.broadcast_to(iota, x.shape)
    cur = x
    vals, idxs = [], []
    for _ in range(k):
        v = jnp.max(cur, axis=-1)
        i = jnp.argmax(cur, axis=-1).astype(jnp.int32)
        vals.append(v)
        idxs.append(i)
        cur = jnp.where(iota == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def table_lookup(table, ix):
    """table[ix] for a tiny [V, D] table (decoder token table, V~26): a
    one-hot matmul puts the lookup on the MXU where the row gather is
    latency-bound (1.5x at [5120] indices, measured on-chip). Exact: each one-hot
    row contributes a single 1.0 * table[v] term; adding the zero terms
    is exact in any float dtype — but ONLY at Precision.HIGHEST, which
    keeps f32 table entries un-truncated (TPU default precision rounds
    matmul inputs to bf16; verified non-exact on hardware).

    One caveat keeps the two paths bit-identical: summing the zero terms
    turns a -0.0 table entry into +0.0 (1.0*-0.0 + 0.0 = +0.0), so BOTH
    paths canonicalize signed zeros in the table first. -0.0 -> +0.0 is
    arithmetically inert everywhere downstream (x + ±0.0, exp, compares
    all agree); only a bit-level dump of the embedding itself could tell."""
    table = jnp.where(table == 0.0, 0.0, table)
    if not fast_gathers_enabled():
        return table[ix]
    oh = jax.nn.one_hot(ix, table.shape[0], dtype=table.dtype)
    return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)


def init_conv1d_seq(key, width, in_dim, n_filters, dtype=jnp.float32):
    """Kim-2014 text-conv filter bank: full-width kernel over embeddings."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (width * in_dim) ** 0.5
    return {"w": uniform(kw, (width, in_dim, n_filters), bound, dtype),
            "b": uniform(kb, (n_filters,), bound, dtype)}


def conv1d_seq(p, x):
    """x: [B, T, E] -> [B, T-width+1, F] valid conv along T."""
    # dimension_numbers: batch, time(spatial), feature
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC")) + p["b"]


def cast_tree(tree, dtype):
    """Cast float32 leaves to a compute dtype (params stay fp32 at rest;
    jnp promotion would otherwise pull bf16 activations back to fp32 at
    every matmul against fp32 weights)."""
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree)


def dropout(key, x, rate, train):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def word_dropout(key, tokens, rate, unk_idx, train):
    """Replace tokens with UNK with prob ``rate`` (decoder input corruption,
    reference models/decoder.py:112-133)."""
    if not train or rate <= 0.0:
        return tokens
    drop = jax.random.bernoulli(key, rate, tokens.shape)
    return jnp.where(drop, jnp.full_like(tokens, unk_idx), tokens)
