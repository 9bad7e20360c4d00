"""Free-running generation: all sampling modes as one lax.scan.

Reference: models/model.py sample_G (model.py:225-385), minus the beam branch
which lives in ops/beam.py. The per-timestep Python loop becomes a scan whose
step does: decoder single step -> mode-dispatched token selection ->
EOS/finished masking. The mode is static (one compiled program per mode).

Hard modes: 'categorical' (temperature), 'greedy'.
Soft modes (differentiable feedback for phase-2 controlled-gen training):
'none_softmax', 'greedy_softmax', 'categorical_softmax' — the decoder is fed
the softmax distribution via soft embedding; the hard-token track is used
only for EOS bookkeeping, and (as in the reference) 'none_softmax' never
updates the hard track at all.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..data.vocab import PAD_IDX, START_IDX, EOS_IDX

HARD_MODES = ("categorical", "greedy")
SOFT_MODES = ("none_softmax", "greedy_softmax", "categorical_softmax")


def _mask_specials_first_step(logits, i):
    """prevent_empty: mask PAD/START/EOS on the first step only
    (model.py:299-305) — a fused where over the V axis, not per-column
    .at[].set scatters (a strided DUS costs ~0.4 ms/step on TPU, see
    ops/beam.py _advance_one)."""
    large_neg = -2.0 * jnp.abs(jnp.min(logits))
    v_ix = jnp.arange(logits.shape[-1])
    special = ((v_ix == PAD_IDX) | (v_ix == START_IDX)
               | (v_ix == EOS_IDX))
    return jnp.where((i == 0) & special, large_neg, logits)



@partial(jax.jit, static_argnames=(
    "model", "sample_mode", "prepend_start_idx", "prevent_empty"))
def sample_sentences(model, params, key, z, c,
                     sample_mode="categorical", temp=1.0,
                     prepend_start_idx=True, prevent_empty=False):
    """Generate [B, T(+1)] token ids (hard modes) or additionally
    [B, T(+1), V] soft rows (soft modes).

    z: [B, z_dim], c: [B, c_dim]. T = model.max_seq_len. When
    prepend_start_idx, output column 0 is the START token (dataloader
    format), giving width T+1.
    """
    soft = sample_mode in SOFT_MODES
    assert sample_mode in HARD_MODES + SOFT_MODES, sample_mode
    assert not (soft and prevent_empty), (
        "cant prevent_empty when soft sampling")
    B = z.shape[0]
    V = model.n_vocab

    tok0 = jnp.full((B,), START_IDX, jnp.int32)
    soft0 = jax.nn.one_hot(tok0, V) if soft else None
    # hidden state is an opaque pytree (GRU: [B, H] array; transformer:
    # KV-cache dict) — the scan carries it without looking inside
    h0 = model.init_decoder_hidden(params, z, c)
    finished0 = jnp.zeros((B,), bool)

    def step(carry, key_t_and_i):
        key_t, i = key_t_and_i
        tok, softix, h, finished = carry
        logits, h = model.decode_step(params, tok, softix if soft else None,
                                      z, c, h)
        # sampling math in fp32 whatever dtype the decoder ran in
        logits = logits.astype(jnp.float32)
        if prevent_empty:
            logits = _mask_specials_first_step(logits, i)

        new_tok = tok
        new_soft = softix
        if sample_mode == "categorical":
            new_tok = jax.random.categorical(key_t, logits / temp, axis=1)
        elif sample_mode == "greedy":
            new_tok = jnp.argmax(logits, axis=1)
        elif sample_mode == "none_softmax":
            new_soft = jax.nn.softmax(logits / temp, axis=1)
        elif sample_mode == "greedy_softmax":
            new_tok = jnp.argmax(logits, axis=1)
            new_soft = jax.nn.softmax(logits / temp, axis=1)
        elif sample_mode == "categorical_softmax":
            new_tok = jax.random.categorical(key_t, logits / temp, axis=1)
            new_soft = jax.nn.softmax(logits / temp, axis=1)
        new_tok = new_tok.astype(jnp.int32)

        # finished bookkeeping (model.py:348-359): already-finished rows emit
        # PAD; rows that just emitted EOS are finished from the next step on
        new_tok = jnp.where(finished, PAD_IDX, new_tok)
        finished = finished | (new_tok == EOS_IDX)
        if soft:
            # zero out the soft rows of finished sentences (embeds to 0)
            new_soft = jnp.where(finished[:, None], 0.0, new_soft)
        out = (new_tok, new_soft) if soft else (new_tok,)
        return (new_tok, new_soft, h, finished), out

    keys = jax.random.split(key, model.max_seq_len)
    steps = jnp.arange(model.max_seq_len)
    _, outs = jax.lax.scan(step, (tok0, soft0, h0, finished0), (keys, steps))

    seq = jnp.swapaxes(outs[0], 0, 1)                     # [B, T]
    if prepend_start_idx:
        seq = jnp.concatenate([tok0[:, None], seq], axis=1)
    if soft:
        soft_seq = jnp.swapaxes(outs[1], 0, 1)            # [B, T, V]
        if prepend_start_idx:
            start_row = jax.nn.one_hot(tok0, V)[:, None, :]
            soft_seq = jnp.concatenate([start_row, soft_seq], axis=1)
        return seq, soft_seq
    return seq


@partial(jax.jit, static_argnames=("sample_mode", "prepend_start_idx",
                                   "prevent_empty"))
def sample_from_logits(key, all_logits, sample_mode="categorical",
                       temp=1.0, prepend_start_idx=True,
                       prevent_empty=False):
    """Generation over PRECOMPUTED per-step logits [B, T, V] — the deconv
    decoder's cached-logits replay contract (reference decoder.py:268-271,
    316-323: forward_sample ignores the fed-back tokens and replays its
    cache pointer-wise). Same mode/EOS-masking semantics as
    sample_sentences."""
    soft = sample_mode in SOFT_MODES
    assert sample_mode in HARD_MODES + SOFT_MODES, sample_mode
    assert not (soft and prevent_empty)
    B, T, V = all_logits.shape
    tok0 = jnp.full((B,), START_IDX, jnp.int32)
    finished0 = jnp.zeros((B,), bool)

    def step(carry, inp):
        tok, finished = carry
        key_t, i, logits = inp
        if prevent_empty:
            logits = _mask_specials_first_step(logits, i)
        new_tok = tok
        new_soft = None
        if sample_mode in ("categorical", "categorical_softmax"):
            new_tok = jax.random.categorical(key_t, logits / temp, axis=1)
        elif sample_mode in ("greedy", "greedy_softmax"):
            new_tok = jnp.argmax(logits, axis=1)
        if soft:
            new_soft = jax.nn.softmax(logits / temp, axis=1)
        new_tok = jnp.where(finished, PAD_IDX, new_tok.astype(jnp.int32))
        finished = finished | (new_tok == EOS_IDX)
        if soft:
            new_soft = jnp.where(finished[:, None], 0.0, new_soft)
            return (new_tok, finished), (new_tok, new_soft)
        return (new_tok, finished), (new_tok,)

    keys = jax.random.split(key, T)
    logits_tm = jnp.swapaxes(all_logits, 0, 1)
    _, outs = jax.lax.scan(step, (tok0, finished0),
                           (keys, jnp.arange(T), logits_tm))
    seq = jnp.swapaxes(outs[0], 0, 1)
    if prepend_start_idx:
        seq = jnp.concatenate([tok0[:, None], seq], axis=1)
    if soft:
        soft_seq = jnp.swapaxes(outs[1], 0, 1)
        if prepend_start_idx:
            start_row = jax.nn.one_hot(tok0, V)[:, None, :]
            soft_seq = jnp.concatenate([start_row, soft_seq], axis=1)
        return seq, soft_seq
    return seq
