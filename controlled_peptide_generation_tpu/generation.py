"""High-level generation wrapper (reference: model.generate_sentences,
models/model.py:197-223).

Dispatches between the scan-based sampler (ops/sampling.py) and the batched
beam search (ops/beam.py); samples z and c from their priors when not given;
applies the flow prior when the model has one.
"""

import jax.numpy as jnp
import jax

from .ops import sampling, beam as beam_ops


def generate_sentences(model, params, key, mbsize, z=None, c=None,
                       sample_mode="categorical", temp=1.0,
                       prepend_start_idx=True, prevent_empty=False,
                       min_length=1, beam_size=5, n_best=3):
    """Returns (sentences, z, c_ix).

    Hard modes: sentences is [mbsize, T+1] int32.
    Soft modes: sentences is (hard [mbsize, T+1], soft [mbsize, T+1, V]).
    Beam: sentences is [mbsize, n_best, T+1] int32 (scores dropped here;
    call ops.beam.beam_search directly for them).
    """
    kz, kc, ks = jax.random.split(key, 3)
    if z is None:
        z = model.sample_z_prior(kz, mbsize)
    else:
        z = jnp.asarray(z)
    if c is None:
        c = model.sample_c_prior(kc, mbsize)
    else:
        c = jnp.asarray(c)
    assert mbsize == z.shape[0] == c.shape[0], (
        f"sizes dont match {mbsize} {z.shape[0]} {c.shape[0]}")

    if model.flow > 0 and getattr(model, "flow_mode",
                                  "gen_prior") == "gen_prior":
        # reference semantics (model.py:210-214): flow applied to prior
        # samples at generation. posterior-trained flows transform q(z|x)
        # during training only — the aggregate posterior of z_K is already
        # matched to N(0,I), so prior samples decode directly.
        z, _ = model.apply_flow(params, z)

    if model.G_class == "deconv":
        # non-autoregressive replay: all logits precomputed from (z, c)
        logits = model.decode_logits(params, z, c)
        if sample_mode == "beam":
            hyps, _ = beam_ops.beam_search_logits(
                logits, beam_size=beam_size, n_best=n_best,
                min_length=min_length)
            sentences = hyps
        else:
            sentences = sampling.sample_from_logits(
                ks, logits, sample_mode=sample_mode, temp=temp,
                prepend_start_idx=prepend_start_idx,
                prevent_empty=prevent_empty)
        return sentences, z, jnp.argmax(c, axis=1)

    if sample_mode == "beam":
        hyps, _ = beam_ops.beam_search(model, params, z, c,
                                       beam_size=beam_size, n_best=n_best,
                                       min_length=min_length)
        sentences = hyps
    else:
        sentences = sampling.sample_sentences(
            model, params, ks, z, c, sample_mode=sample_mode, temp=temp,
            prepend_start_idx=prepend_start_idx, prevent_empty=prevent_empty)

    c_ix = jnp.argmax(c, axis=1)
    return sentences, z, c_ix
