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
    no gradient) by re-zeroing the row inside the computation."""
    w = p["w"].at[PAD_IDX].set(0.0)
    return w[ix]


def soft_embed(p, soft_ix):
    """[..., V] probabilities -> [..., emb_dim]; differentiable feedback path
    (reference: models/mutils.py:39-45)."""
    w = p["w"].at[PAD_IDX].set(0.0)
    return soft_ix @ w


def onehot(ix, n):
    return jax.nn.one_hot(ix, n, dtype=jnp.float32)


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
