"""GRU decoder: teacher-forced full-sequence pass + single-step sampling.

Reference: models/decoder.py GRUDecoder — hidden state is concat(z, c)
(h_dim = z_dim + c_dim), the input at every step is [emb(token), z, c],
word dropout corrupts teacher-forced inputs to UNK, and an output dropout +
linear head produces vocab logits. The same cell drives both the
teacher-forced scan and the free-running step used by sampling/beam.
"""

import jax
import jax.numpy as jnp

from ..data.vocab import UNK_IDX, PAD_IDX
from ..ops.gru import init_gru_params, gru_cell_pregated, gru_scan
from ..ops import nn


def init(key, emb_dim, output_dim, h_dim,
         p_word_dropout=0.3, p_out_dropout=0.3, skip_connections=False):
    """emb_dim here is the FULL per-step input width (word emb + z + c),
    matching the reference's build_decoder wiring (models/model.py:63-67)."""
    kg, ko, kx, kz = jax.random.split(key, 4)
    params = {
        "gru": init_gru_params(kg, emb_dim, h_dim),
        "out": nn.init_linear(ko, h_dim, output_dim),
    }
    if skip_connections:
        params["skip_x"] = nn.init_linear(kx, h_dim, h_dim)
        params["skip_z"] = nn.init_linear(kz, h_dim, h_dim)
        # torch uses bias=False for the skip projections
        params["skip_x"]["b"] = jnp.zeros_like(params["skip_x"]["b"])
        params["skip_z"]["b"] = jnp.zeros_like(params["skip_z"]["b"])
    return params


def init_hidden(z, c):
    return jnp.concatenate([z, c], axis=1)


def _head(params, rnn_out, zc, skip_connections, p_out_dropout, key, train):
    if skip_connections:
        rnn_out = (nn.linear(params["skip_x"], rnn_out)
                   + nn.linear(params["skip_z"], zc))
    rnn_out = nn.dropout(key, rnn_out, p_out_dropout, train)
    return nn.linear(params["out"], rnn_out)


def apply_teacher_forced(params, emb_params, tokens, z, c, key, train,
                         p_word_dropout=0.3, p_out_dropout=0.3,
                         skip_connections=False):
    """tokens: [B, T] int -> logits [B, T, V]."""
    k_wd, k_do = jax.random.split(key)
    x = nn.word_dropout(k_wd, tokens, p_word_dropout, UNK_IDX, train)
    emb = nn.embed(emb_params, x)                        # [B, T, E]
    zc = init_hidden(z, c)                               # [B, H]
    T = tokens.shape[1]
    zc_t = jnp.broadcast_to(zc[:, None, :], (zc.shape[0], T, zc.shape[1]))
    inputs = jnp.concatenate([emb, zc_t], axis=2)
    rnn_out, _ = gru_scan(params["gru"], inputs, zc)     # [B, T, H]
    zc_b = zc_t if skip_connections else zc
    return _head(params, rnn_out, zc_b, skip_connections, p_out_dropout,
                 k_do, train)


def apply_step(params, emb_params, token_hard, token_soft, z, c, h,
               key=None, train=False, p_out_dropout=0.3,
               skip_connections=False):
    """One free-running step.

    token_soft ([B, V] probabilities, differentiable) takes precedence over
    token_hard ([B] indices) — reference decoder.py:86-97.
    Returns (logits [B, V], h' [B, H]).

    TPU-first restructuring: the step input is [emb(token), z, c], so its
    GRU input projection factors into a token part and a (z, c) part, BOTH
    loop-invariant inside the sampling/beam scan — the token part because
    the vocab is tiny (V~26: a [V, 3H] table replaces the per-step
    [B, E+H]x[E+H, 3H] matmul with a gather), the (z, c) part because z/c
    are fixed per sequence (one [B, 3H] vector). XLA's while-loop LICM
    hoists both out of the recurrence, leaving only the [B, H]x[H, 3H]
    recurrent matmul per step (~2.4x faster beam decode measured at the
    reference shapes, BENCH.md). Same math as projecting the concatenated
    input, regrouped — differences are accumulation-order ulps.
    """
    wi, bi = params["gru"]["wi"], params["gru"]["bi"]
    E = emb_params["w"].shape[1]
    emb_w = emb_params["w"].at[PAD_IDX].set(0.0)
    tok_table = emb_w @ wi[:E]                    # [V, 3H] loop-invariant
    zc = jnp.concatenate([z, c], axis=1)
    zc_gi = zc @ wi[E:] + bi                      # [B, 3H] loop-invariant
    if token_soft is not None:
        gi = token_soft @ tok_table + zc_gi
    else:
        gi = nn.table_lookup(tok_table, token_hard) + zc_gi
    h_new = gru_cell_pregated(params["gru"], gi, h)
    if key is None:
        key = jax.random.PRNGKey(0)
    logits = _head(params, h_new, zc, skip_connections, p_out_dropout,
                   key, train)
    return logits, h_new
