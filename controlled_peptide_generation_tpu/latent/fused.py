"""Fully fused CLaSS round: rejection sampling + beam decode in ONE jit.

The pipeline's per-round host loop (sample -> score -> accept -> chunked
decode) costs a dozen device dispatches; over a tunneled/remote TPU the
dispatch latency dominates end-to-end throughput (measured: chunked rounds
run at CPU speed while the pure beam kernel is 19x faster). Fusing the whole
round — GMM draw, every classifier head, the acceptance test, the c-prior
draw and the full-batch batched beam decode — into a single XLA program
makes one round one dispatch.

Semantically identical to the reference round (sample_pipeline.py:196-229):
every candidate is decoded (not just accepted ones), top-1 beam hypothesis
kept.

Accepted-only decode (``capacity``): the reference beam-decodes every
candidate, but only accepted ones are ever consumed downstream — at the
typical ~30% acceptance rate two thirds of the round's device time decodes
sequences that are immediately discarded. With ``capacity=K`` the round
compacts the accepted latents to the front (stable argsort on the accept
mask — a [n] bool sort, negligible next to the decode) and beam-decodes
only the first K slots. The accepted output set is bit-identical to the
decode-all round's accepted subset (same draws, same accept test, same
per-latent beam program); accepted candidates beyond K are dropped
unbiasedly (draws are i.i.d., so a prefix of the accepted stream is an
identical sample) and the next round replaces them.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.beam import beam_search, beam_search_logits
from . import gmm as gmm_mod

# max sentences per beam_search call inside a fused round (see _round_body).
# Default for the beam_chunk parameter below; tools/repro_beam_fault.py
# reproduces the backend fault this sidesteps.
_BEAM_CHUNK = 25_000


def _round_body(model, params, key, kind, q_params, clf_w, clf_b, targets,
                n, beam_size=5, decode_dtype="bfloat16", capacity=None,
                beam_chunk=None):
    """The round computation, un-jitted: jitted directly for single-device
    use (below) and wrapped with mesh shardings by parallel.dp_fused_round.

    capacity=None decodes all n candidates (reference semantics) and
    returns a 6-tuple; capacity=K compacts accepted latents to the front
    and decodes only K slots, returning an 8-tuple (..., idx, valid) where
    idx[j] is the candidate index decoded into slot j and valid[j] marks
    slots holding a real accepted candidate. In compact mode the returned
    z/probs/accum are the K gathered rows (rejected rows are never fetched
    to host)."""
    kz, ku, kc = jax.random.split(key, 3)
    cov_type = kind.split("_", 1)[1]
    # rejection math stays fp32 (acceptance probabilities are the product
    # of sigmoid heads — precision matters for acceptance-rate parity)
    z = gmm_mod.sample(kz, q_params, n, cov_type)
    p1 = jax.nn.sigmoid(z @ clf_w.T + clf_b[None, :])
    probs = jnp.where(targets[None, :] == 1, p1, 1.0 - p1)
    accum = jnp.prod(probs, axis=1)
    accept = jax.random.uniform(ku, (n,)) < accum
    c = model.sample_c_prior(kc, n)
    # flow models decode flow(z), matching the non-fused path: in gen_prior
    # mode generation.py applies the flow to any provided z (reference
    # model.py:210-214); in posterior mode Q was fit on encoder-mean (z0)
    # space, and the decoder was trained on z_K = flow(z0) — either way the
    # decoded latent is flow(z). The returned z stays the raw draw
    # (the reference stores pre-decode samples_z).
    z_dec = model.apply_flow(params, z)[0] if model.flow > 0 else z
    idx = valid = None
    if capacity is not None:
        # clamp: more slots than candidates would misalign idx/valid with
        # the n-row gathers below (argsort yields at most n entries)
        capacity = min(int(capacity), n)
        # accepted-first compaction: stable sort keeps candidate order, so
        # slot j holds the j-th accepted candidate of the round
        idx = jnp.argsort(jnp.logical_not(accept), stable=True)[:capacity]
        valid = jnp.arange(capacity) < jnp.sum(accept)
        z, probs, accum = z[idx], probs[idx], accum[idx]
        z_dec, c = z_dec[idx], c[idx]
    # the beam decode runs in the MXU-native dtype (measured ~7x on the
    # T=25 GRU recurrence at these shapes); beam score bookkeeping is
    # fp32 inside beam_search regardless (logits cast before log_softmax)
    dt = jnp.dtype(decode_dtype)
    if dt != jnp.float32:
        dec_params = nn.cast_tree(params, dt)
        z_d, c_d = z_dec.astype(dt), c.astype(dt)
    else:
        dec_params, z_d, c_d = params, z_dec, c
    # decode in <=beam_chunk-sentence slices (still ONE program — the
    # slices are a python loop inside the trace, concatenated). Beyond
    # ~25k sentences after the accepted-first compaction, the single big
    # beam kernel trips a deterministic TPU backend fault ("TPU device
    # error") on this toolchain (repro: tools/repro_beam_fault.py);
    # chunking sidesteps it at no measurable cost and results are exact
    # (per-sentence independence). beam_chunk is a static jit arg so tests
    # exercise the sliced branch at small shapes (test_fusion.py).
    beam_chunk = _BEAM_CHUNK if beam_chunk is None else int(beam_chunk)

    def _decode(z_i, c_i):
        if model.G_class == "deconv":
            # non-autoregressive family: all logits precomputed from
            # (z, c), beam replays them (generation.py:46-53 contract)
            logits = model.decode_logits(dec_params, z_i, c_i)
            return beam_search_logits(logits, beam_size=beam_size,
                                      n_best=1)
        return beam_search(model, dec_params, z_i, c_i,
                           beam_size=beam_size, n_best=1)

    B_dec = z_d.shape[0]
    if B_dec > beam_chunk:
        parts = [_decode(z_d[s:s + beam_chunk], c_d[s:s + beam_chunk])
                 for s in range(0, B_dec, beam_chunk)]
        hyps = jnp.concatenate([p[0] for p in parts])
        scores = jnp.concatenate([p[1] for p in parts])
    else:
        hyps, scores = _decode(z_d, c_d)
    if capacity is None:
        return z, c, probs, accum, accept, hyps[:, 0, :]
    return z, c, probs, accum, accept, hyps[:, 0, :], idx, valid


_fused_round = partial(jax.jit, static_argnames=(
    "model", "kind", "n", "beam_size", "decode_dtype",
    "capacity", "beam_chunk"))(_round_body)


def _clf_args(Q):
    names = sorted(Q.attr_clfs)
    clf_w = jnp.stack([Q.attr_clfs[a].w for a in names])
    clf_b = jnp.stack([Q.attr_clfs[a].b for a in names])
    targets = jnp.array([Q.clf_targets[a] for a in names])
    return names, clf_w, clf_b, targets


def round_memory_analysis(model, params, key, Q, n, beam_size=5,
                          decode_dtype="bfloat16", capacity=None,
                          beam_chunk=None):
    """AOT-compile the fused round at this exact shape and return XLA's
    memory analysis (temp/argument/output bytes) — turns the lane-budget
    heuristic's "~6x program overhead" constant into measured data
    (pipeline.transformer_dispatch_budget). With the persistent
    compilation cache enabled (utils/runtime.setup), the executable is
    reused by the immediately following identical dispatch, so the probe
    costs one cache entry, not a doubled compile."""
    _, clf_w, clf_b, targets = _clf_args(Q)
    kind, q_params = Q._sampler()
    lowered = _fused_round.lower(
        model, params, key, kind, q_params, clf_w, clf_b, targets, n,
        beam_size, decode_dtype, capacity, beam_chunk)
    return lowered.compile().memory_analysis()


def fused_round(model, params, key, Q, n, beam_size=5, prefix="clfZ",
                decode_dtype="bfloat16", capacity=None, beam_chunk=None):
    """One dispatch: returns (z, scores dict, accept, tokens [n, T+1]).

    With capacity=K, only accepted candidates are beam-decoded (see module
    docstring); the return grows to (z, scores, accept, tokens [K, T+1],
    idx [K], valid [K]) and z/scores carry the K compacted rows."""
    names, clf_w, clf_b, targets = _clf_args(Q)
    kind, q_params = Q._sampler()
    out = _fused_round(
        model, params, key, kind, q_params, clf_w, clf_b, targets, n,
        beam_size, decode_dtype, capacity, beam_chunk)
    z, c, probs, accum, accept, tokens = out[:6]
    scores = {f"{prefix}_prob_accum": accum}
    for i, a in enumerate(names):
        scores[f"{prefix}_{a}={Q.clf_targets[a]}"] = probs[:, i]
    if capacity is None:
        return z, scores, accept, tokens
    return z, scores, accept, tokens, out[6], out[7]
