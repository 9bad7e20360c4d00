"""Fully batched on-device beam search.

Replaces the reference's per-sentence Python Beam objects (models/Beam.py +
the batch driver in models/model.py:258-404) with one lax.scan that advances
all (batch, beam) lanes simultaneously: scores and backpointers are fixed-
shape arrays, decoder hidden states are reordered with gathers, and finished
hypotheses land in a fixed-capacity masked heap. The backtrace runs on device
too, vmapped over (batch, n_best).

Semantics matched to the reference:

* log-softmax scores accumulated additively; START always blocked and EOS
  blocked below min_length at -1e20 (Beam.py:63-71);
* rows whose last token is EOS get their children blocked at -1e20
  (Beam.py:76-80);
* the first advance draws only from beam 0's distribution (Beam.py:82);
* a hypothesis is finished when its token is EOS; it records
  (score, timestep, beam) in insertion order (Beam.py:97-101);
* a sentence is done when EOS tops the beam AND >= n_best finished
  (Beam.py:107-108); done sentences stop advancing;
* finalization pads with current beams until n_best, then stable-sorts by
  score descending (Beam.py:110-122), and hypotheses are reconstructed by
  walking backpointers, including the initial BOS row (Beam.py:124-131).
"""

import math
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import PAD_IDX, START_IDX, EOS_IDX
from . import nn
from . import pallas_beam
from . import pallas_tfm_beam

NEG = -1e20

# Whole-scan fused Pallas beam (ops/pallas_beam.py): None = auto,
# True/False = forced. Like nn.set_fast_gathers, the toggle is read at
# trace time — tests flipping it must jax.clear_caches(). Auto resolves
# to ON on the TPU backend: the calibrated device-time A/B
# (tools/bench_pallas_beam.py, BENCH.md "fused Pallas beam") measures
# 1.28-1.58x over the XLA scan at every production shape/dtype
# (1024/4096/16384 x fp32/bf16), and the on-device divergence is
# near-tie suffix flips well inside the fp32-vs-bf16 noise floor the
# pipeline already accepts (6.1% of sentences at matched fp32 vs the
# 16% dtype floor; interpret mode is bit-exact, tests/test_pallas_beam).
_PALLAS_BEAM = None
_AUTO_ON_TPU = True


def set_pallas_beam(value):
    """Force (True/False) or restore auto (None) the fused Pallas beam.

    The user-facing control is ``--hw.pallas_beam auto|on|off`` on every
    CLI — config.finalize routes it here, so pipeline.py, serve.py,
    static_eval.py, main.py and latent/fused.py (which all decode through
    beam_search) follow one policy. The global is read at trace time:
    flip it before the first decode (finalize runs before any tracing),
    or jax.clear_caches() in tests."""
    global _PALLAS_BEAM
    _PALLAS_BEAM = value


def pallas_beam_enabled():
    if _PALLAS_BEAM is not None:
        return _PALLAS_BEAM
    return _AUTO_ON_TPU and jax.default_backend() == "tpu"


class BeamState(NamedTuple):
    scores: jnp.ndarray    # [B, K] accumulated log-probs
    prev: jnp.ndarray      # [B, K] last token per beam
    h: Any                 # decoder hidden pytree, leaves [B, K, ...]
    adv: jnp.ndarray       # [B] number of advances performed
    eos_top: jnp.ndarray   # [B] EOS has topped the beam
    fin_cnt: jnp.ndarray   # [B] finished-hypothesis count


def _advance_one(logp, scores, prev, adv, *, K, V, min_length, fast=False):
    """Single-sentence beam advance; vmapped over the batch.

    Finished-hypothesis bookkeeping happens OUTSIDE the scan: this only
    returns the per-step finish mask (next_y == EOS). Scattering each
    finish into a [F]-sized heap inside the loop cost ~70% of the whole
    beam program on TPU (measured, BENCH.md); the heap is reconstructed
    from the stacked per-step emissions in one vectorized pass instead.
    """
    cur_len = adv + 1
    # mask BOS always and EOS before min_length via fused elementwise
    # where over the V axis — a .at[:, col].set here lowers to a strided
    # dynamic-update-slice that cost ~57% of the whole beam program on
    # TPU (profiled: 2x ~0.4 ms/step on f32[4096,5,26]); the where fuses
    # into the surrounding arithmetic for free
    v_ix = np.arange(V)
    wp = jnp.where(jnp.asarray(v_ix == START_IDX), NEG, logp)
    wp = jnp.where(cur_len < min_length,
                   jnp.where(jnp.asarray(v_ix == EOS_IDX), NEG, wp), wp)

    # candidate matrix: first advance draws from beam 0 only
    later = wp + scores[:, None]
    later = jnp.where((prev == EOS_IDX)[:, None], NEG, later)
    k_ix = jnp.arange(K)
    first = jnp.where((k_ix == 0)[:, None], wp, -jnp.inf)
    bs = jnp.where(adv == 0, first, later)

    # canonicalize signed zeros: top_k's total order ranks +0.0 above
    # -0.0 while topk_small's argmax treats them equal — mapping -0.0 to
    # +0.0 on BOTH paths keeps them bit-identical even when a candidate
    # score is exactly zero (probability-1 token)
    bs = jnp.where(bs == 0.0, 0.0, bs)

    # top_k lowers to a full stable sort of the [K*V] candidates; the
    # iterated-argmax form is exact (incl. tie order) and cheaper on TPU
    # at large beam widths (ops/nn.py topk_small; its >= k finite-entries
    # precondition holds when K <= V - 2 — the _fast_topk gate below
    # falls back to lax.top_k for wider beams)
    if fast:
        best, ids = nn.topk_small(bs.reshape(K * V), K)
    else:
        best, ids = jax.lax.top_k(bs.reshape(K * V), K)
    prev_k = (ids // V).astype(jnp.int32)
    next_y = (ids % V).astype(jnp.int32)

    mask = next_y == EOS_IDX        # newly finished, beam (insertion) order
    eos_top = next_y[0] == EOS_IDX

    return best, next_y, prev_k, adv + 1, mask, eos_top


def _backtrace(t, k, ys, ptrs, T, fast=False):
    """Walk backpointers from (t, k); returns [T+1] tokens, PAD beyond t.

    The walk is a reverse lax.scan EMITTING each token — scattering them
    into a preallocated hyp buffer (`hyp.at[j+1].set`) was another
    scatter-in-loop pattern costing real device time (see _advance_one).
    A log-depth associative-scan pointer composition was also tried and
    measured SLOWER: composing [K]-maps means gathers along a 5-wide
    lane-padded axis, which TPUs execute far worse than this short
    sequential walk. The per-step row is fed through the scan's xs
    (reversed) so the only dynamic indexing left is the K-wide beam pick,
    which the fast path lowers as a select chain (ops/nn.py).
    """
    sel = nn.select_small if fast else (lambda row, i: row[i])
    ys_rev = ys[1:][::-1]        # row ys[j + 1] for j = T-1 .. 0
    ptr_rev = ptrs[::-1]         # row ptrs[j]

    def body(k_cur, inp):
        j, y_row, p_row = inp
        on = (j + 1) <= t
        tok = jnp.where(on, sel(y_row, k_cur), PAD_IDX)
        k_next = jnp.where(on, sel(p_row, k_cur), k_cur)
        return k_next, tok

    k_fin, toks_rev = jax.lax.scan(
        body, k, (jnp.arange(T - 1, -1, -1), ys_rev, ptr_rev))
    return jnp.concatenate([sel(ys[0], k_fin)[None], toks_rev[::-1]])


def _finalize_one(ys, ptrs, scores, adv, fin_cnt, fin_mask, fin_score,
                  *, K, n_best, T, fast=False):
    """sort_finished(minimum=n_best) + n_best backtraces for one sentence.

    fin_mask/fin_score are the [T*K] per-step finish emissions flattened
    step-major — EXACTLY the old heap's insertion order (per step, beams
    in order), so the stable score sort reproduces the reference's
    tie-breaking. The pad-with-current-beams entries (used when fewer
    than n_best hypotheses finished) are appended after all finish slots,
    where the old code also placed them."""
    i = jnp.arange(n_best)
    n_add = jnp.maximum(n_best - fin_cnt, 0)
    flat = jnp.arange(T * K)
    keyed = jnp.concatenate([
        jnp.where(fin_mask, fin_score, -jnp.inf),
        jnp.where(i < n_add, scores[jnp.minimum(i, K - 1)], -jnp.inf),
    ])
    t_all = jnp.concatenate([flat // K + 1, jnp.full((n_best,), adv)])
    k_all = jnp.concatenate([flat % K, i])
    order = jnp.argsort(-keyed, stable=True)[:n_best]
    ts, ks, sc = t_all[order], k_all[order], keyed[order]
    hyps = jax.vmap(lambda t, k: _backtrace(t, k, ys, ptrs, T,
                                            fast=fast))(ts, ks)
    return hyps, sc


@partial(jax.jit, static_argnames=("model", "beam_size", "n_best",
                                   "min_length", "max_len"))
def beam_search(model, params, z, c, beam_size=5, n_best=3, min_length=1,
                max_len=None):
    """z: [B, z_dim], c: [B, c_dim] ->
    (hyps [B, n_best, T+1] int32, scores [B, n_best] f32).

    hyps[:, :, 0] is the BOS row token; positions past each hypothesis end
    are PAD. Top-1 decode is hyps[:, 0].
    """
    assert beam_size >= n_best, "Can't return more than max hypothesis"
    B, K = z.shape[0], beam_size
    V = model.n_vocab
    T = max_len if max_len is not None else model.max_seq_len
    # pytree decoder states (transformer KV cache, position table) are
    # allocated for model.max_seq_len steps — longer decodes would
    # silently clamp scatter/gather indices and corrupt the tail
    assert T <= model.max_seq_len, (
        f"max_len {T} exceeds model.max_seq_len {model.max_seq_len}")

    if pallas_beam_enabled() and pallas_beam.applicable(model, K, z.dtype):
        return _beam_search_pallas(model, params, z, c, K, n_best,
                                   min_length, T)
    # transformer-family alternates: the whole-scan Pallas kernel routes
    # only when the kernel route is FORCED (--hw.pallas_beam on), never
    # on auto — measured at parity with the generic scan (13.2k vs
    # 13.1k seqs/s at chunk 4096 bf16) because the workload is small-op
    # latency-bound, not reorder-bound (BENCH.md "transformer beam
    # arms"); the ancestry arm is its own opt-in (set_tfm_anc)
    if (_PALLAS_BEAM is True
            and pallas_tfm_beam.applicable(model, K, z.dtype)):
        return _beam_search_pallas_tfm(model, params, z, c, K, n_best,
                                       min_length, T)
    if tfm_anc_enabled() and getattr(model, "G_class",
                                     None) == "transformer":
        return _beam_search_tfm_anc(model, params, z, c, K, n_best,
                                    min_length, T)

    z_flat = jnp.repeat(z, K, axis=0)          # [B*K] batch-major lanes
    c_flat = jnp.repeat(c, K, axis=0)
    # hidden is a pytree with batch-leading leaves (GRU: one [B, H] array;
    # transformer: KV-cache dict); replicate every leaf over the beam axis
    h0 = model.init_decoder_hidden(params, z, c)
    h0 = jax.tree.map(lambda a: jnp.repeat(a[:, None], K, axis=1), h0)

    prev0 = jnp.full((B, K), PAD_IDX, jnp.int32).at[:, 0].set(START_IDX)
    state = BeamState(
        scores=jnp.zeros((B, K)),
        prev=prev0,
        h=h0,
        adv=jnp.zeros((B,), jnp.int32),
        eos_top=jnp.zeros((B,), bool),
        fin_cnt=jnp.zeros((B,), jnp.int32),
    )

    fast = nn.fast_gathers_enabled()
    # topk_small needs >= K finite candidates on the first advance
    # (>= V - 2 available: BOS and possibly EOS blocked); wider beams
    # fall back to lax.top_k, which handles -inf tails gracefully
    advance = jax.vmap(partial(_advance_one, K=K, V=V,
                               min_length=min_length,
                               fast=fast and K <= V - 2))

    def step(state, _):
        h_flat = jax.tree.map(
            lambda a: a.reshape(B * K, *a.shape[2:]), state.h)
        logits, h_new = model.decode_step(
            params, state.prev.reshape(B * K), None, z_flat, c_flat,
            h_flat)
        # score bookkeeping is always fp32, whatever dtype the decoder ran in
        logp = jax.nn.log_softmax(logits.astype(jnp.float32),
                                  axis=-1).reshape(B, K, V)
        done = state.eos_top & (state.fin_cnt >= n_best)

        best, next_y, prev_k, adv, mask, eos_top_new = advance(
            logp, state.scores, state.prev, state.adv)

        # reorder hidden along the beam axis by backpointer origin,
        # per leaf (index broadcast up to the leaf's rank); the dynamic
        # K-axis gather is latency-bound on TPU — the fast path lowers
        # SMALL leaves (GRU hidden, cache positions) as a K-way select
        # chain. The chain reads a leaf K+1 times, so big leaves like the
        # transformer's [B,K,S,D] KV cache stay on the one-read gather:
        # measured neutral there at reference dims (154k vs 148k seqs/s
        # beam 5, 172k vs 175k beam 15) and the K+1 HBM passes would
        # dominate at larger d_model*S
        def reorder(a):
            a = a.reshape(B, K, *a.shape[1:])
            if fast and math.prod(a.shape[2:]) <= 1024:
                return nn.take_small_axis1(a, prev_k)
            idx = prev_k.reshape(B, K, *([1] * (a.ndim - 2)))
            return jnp.take_along_axis(a, idx, axis=1)

        # done sentences' hidden state advances too — their emissions,
        # scores and finish records are all gated on `done` below, so
        # nothing observable depends on it, and freezing it would (a)
        # spend a full-cache select per step (30% of the transformer beam
        # program, profiled) and (b) desynchronize the KV-cache write
        # position across sentences, breaking the uniform-pos invariant
        # the cache's dynamic_update_slice relies on (models/transformer
        # _block_step)
        h_next = jax.tree.map(reorder, h_new)

        d1 = done[:, None]
        mask = mask & ~d1                      # done sentences record nothing
        new_state = BeamState(
            scores=jnp.where(d1, state.scores, best),
            prev=jnp.where(d1, state.prev, next_y),
            h=h_next,
            adv=jnp.where(done, state.adv, adv),
            eos_top=state.eos_top | (eos_top_new & ~done),
            fin_cnt=state.fin_cnt + mask.sum(axis=1),
        )
        ys_emit = jnp.where(d1, jnp.full_like(next_y, PAD_IDX), next_y)
        ptr_emit = jnp.where(d1, jnp.zeros_like(prev_k), prev_k)
        return new_state, (ys_emit, ptr_emit, best, mask)

    state, (ys_steps, ptr_steps, sc_steps, mask_steps) = jax.lax.scan(
        step, state, None, length=T)

    ys = jnp.concatenate([prev0[None], ys_steps], axis=0)   # [T+1, B, K]
    ys = jnp.swapaxes(ys, 0, 1)                              # [B, T+1, K]
    ptrs = jnp.swapaxes(ptr_steps, 0, 1)                     # [B, T, K]
    # finish emissions flattened step-major = heap insertion order
    fin_mask = jnp.swapaxes(mask_steps, 0, 1).reshape(B, T * K)
    fin_score = jnp.swapaxes(sc_steps, 0, 1).reshape(B, T * K)

    finalize = jax.vmap(partial(_finalize_one, K=K, n_best=n_best, T=T,
                                fast=fast))
    hyps, scores = finalize(ys, ptrs, state.scores, state.adv,
                            state.fin_cnt, fin_mask, fin_score)
    return hyps, scores


def _beam_search_pallas(model, params, z, c, K, n_best, min_length, T):
    """GRU-family beam via the whole-scan fused Pallas kernel.

    The kernel reproduces the lax.scan's per-step emissions exactly
    (ops/pallas_beam.py); this wrapper hoists the loop-invariant decoder
    projections exactly as models/decoder.apply_step does, then reuses the
    shared _finalize_one for the heap reconstruction + backtrace so the
    two paths cannot diverge after the emission tape. The per-step finish
    mask is reconstructed as ys == EOS: done sentences emit PAD (never
    EOS), live ones emit next_y, so the reconstruction is exact."""
    B = z.shape[0]
    V = model.n_vocab
    dec = params["dec"]
    wi, bi = dec["gru"]["wi"], dec["gru"]["bi"]
    emb_w = params["emb"]["w"].at[PAD_IDX].set(0.0)
    E = emb_w.shape[1]
    tok_table = emb_w @ wi[:E]                        # [V, 3H]
    # signed-zero canonicalization, as nn.table_lookup's one-hot path
    tok_table = jnp.where(tok_table == 0.0, 0.0, tok_table)
    zc = jnp.concatenate([z, c], axis=1)
    zc_gi = zc @ wi[E:] + bi                          # [B, 3H]

    ys_steps, ptr_steps, sc_steps, scores_f, adv_f, fin_f = (
        pallas_beam.beam_scan_gru(
            tok_table, zc_gi, dec["gru"]["wh"], dec["gru"]["bh"],
            dec["out"]["w"], dec["out"]["b"], zc,
            T=T, K=K, V=V, H=model.h_dec, min_length=min_length,
            n_best=n_best, block_b=pallas_beam.BLOCK_B,
            interpret=jax.default_backend() != "tpu"))
    # tapes arrive batch-major [B, T, K] (the kernel's 2D-output layout,
    # pallas_beam.beam_scan_gru docstring) — no transposes needed
    mask_steps = ys_steps == EOS_IDX                  # exact, see docstring

    prev0 = jnp.full((B, K), PAD_IDX, jnp.int32).at[:, 0].set(START_IDX)
    ys = jnp.concatenate([prev0[:, None], ys_steps], axis=1)  # [B, T+1, K]
    ptrs = ptr_steps
    fin_mask = mask_steps.reshape(B, T * K)
    fin_score = sc_steps.reshape(B, T * K)
    finalize = jax.vmap(partial(_finalize_one, K=K, n_best=n_best, T=T,
                                fast=nn.fast_gathers_enabled()))
    return finalize(ys, ptrs, scores_f, adv_f, fin_f, fin_mask, fin_score)


# The no-reorder ("ancestry") transformer beam: True/False force, None =
# auto. Auto resolves to OFF: measured on the v5e (tools/bench_tfm_arms
# .py, BENCH.md "transformer beam arms") the ancestry formulation is
# +5% at chunk 1024 but -8% at 4096 vs the generic reorder scan — all
# three arms (generic, ancestry, whole-scan Pallas kernel) land within
# ~±10% because the workload is dominated by per-step small-op/copy
# overheads at these dims (d_model 128, Dh 32, K 5, S 26; MXU busy
# 0.1%), not by the cache reorder the redesigns target.
_TFM_ANC = None


def set_tfm_anc(value):
    global _TFM_ANC
    _TFM_ANC = value


def tfm_anc_enabled():
    if _TFM_ANC is not None:
        return _TFM_ANC
    return False


def _beam_search_tfm_anc(model, params, z, c, K, n_best, min_length, T):
    """Transformer beam WITHOUT per-step cache reorder.

    The generic scan reorders every KV-cache leaf by beam backpointer
    each step; profiled on TPU (tools/profile_tfm_beam.py) those copies
    + K-way selects were ~50% of device time with matmuls at 0.1%. Here
    every lane writes its own cache rows unreordered and a [B, K, S]
    ancestry map tracks whose row each beam's history occupies;
    attention selects ancestor rows densely with an exact one-hot
    einsum (models/transformer.apply_step_anc) and the beam advance
    permutes only the ancestry map. Identical semantics — candidate
    masking, emissions, finalize — to the generic scan (same
    _advance_one/_finalize_one), with attention math at the same
    rounding points."""
    from ..models import transformer as tfm

    B = z.shape[0]
    V = model.n_vocab
    t_args = model.dec_tfm_args
    H = t_args.get("n_heads", 4)
    bf16 = t_args.get("bf16", False)

    caches, anc0 = tfm.anc_init(params["dec"], z, c, K,
                                model.max_seq_len, n_heads=H, bf16=bf16)

    prev0 = jnp.full((B, K), PAD_IDX, jnp.int32).at[:, 0].set(START_IDX)
    state0 = BeamState(
        scores=jnp.zeros((B, K)),
        prev=prev0,
        h=jnp.zeros((B, K, 1)),   # unused; caches/anc ride alongside
        adv=jnp.zeros((B,), jnp.int32),
        eos_top=jnp.zeros((B,), bool),
        fin_cnt=jnp.zeros((B,), jnp.int32),
    )
    fast = nn.fast_gathers_enabled()
    advance = jax.vmap(partial(_advance_one, K=K, V=V,
                               min_length=min_length,
                               fast=fast and K <= V - 2))
    own = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None],
                           (B, K))

    def step(carry, t):
        state, caches, anc = carry
        p = t + 1
        # stamp position p as own-lane BEFORE attention: each lane's row
        # at p is the one it just wrote
        anc = jax.lax.dynamic_update_slice(anc, own[:, :, None],
                                           (0, 0, p))
        logits, caches = tfm.apply_step_anc(
            params["dec"], params["emb"], state.prev, caches, anc, p,
            n_heads=H, bf16=bf16)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        done = state.eos_top & (state.fin_cnt >= n_best)

        best, next_y, prev_k, adv, mask, eos_top_new = advance(
            logp, state.scores, state.prev, state.adv)

        # the ONLY beam permutation: the tiny ancestry map (done lanes
        # advance too — outputs are gated, and the uniform write
        # position must stay uniform, exactly like the generic scan)
        anc = nn.take_small_axis1(anc, prev_k) if fast else \
            jnp.take_along_axis(anc, prev_k[:, :, None], axis=1)

        d1 = done[:, None]
        mask = mask & ~d1
        new_state = BeamState(
            scores=jnp.where(d1, state.scores, best),
            prev=jnp.where(d1, state.prev, next_y),
            h=state.h,
            adv=jnp.where(done, state.adv, adv),
            eos_top=state.eos_top | (eos_top_new & ~done),
            fin_cnt=state.fin_cnt + mask.sum(axis=1),
        )
        ys_emit = jnp.where(d1, jnp.full_like(next_y, PAD_IDX), next_y)
        ptr_emit = jnp.where(d1, jnp.zeros_like(prev_k), prev_k)
        return (new_state, caches, anc), (ys_emit, ptr_emit, best, mask)

    (state, _, _), (ys_steps, ptr_steps, sc_steps, mask_steps) = (
        jax.lax.scan(step, (state0, caches, anc0), jnp.arange(T)))

    ys = jnp.concatenate([prev0[None], ys_steps], axis=0)
    ys = jnp.swapaxes(ys, 0, 1)
    ptrs = jnp.swapaxes(ptr_steps, 0, 1)
    fin_mask = jnp.swapaxes(mask_steps, 0, 1).reshape(B, T * K)
    fin_score = jnp.swapaxes(sc_steps, 0, 1).reshape(B, T * K)
    finalize = jax.vmap(partial(_finalize_one, K=K, n_best=n_best, T=T,
                                fast=fast))
    return finalize(ys, ptrs, state.scores, state.adv, state.fin_cnt,
                    fin_mask, fin_score)


def _beam_search_pallas_tfm(model, params, z, c, K, n_best, min_length,
                            T):
    """Transformer-family beam via the whole-scan fused Pallas kernel
    (ops/pallas_tfm_beam.py).

    The latent prefix is computed by the SAME models/transformer
    .init_cache the XLA arm uses (only its position-0 cache rows are
    consumed), the embed->in-proj fold mirrors nn.embed's PAD-zeroing
    and one-hot exactness, qkv columns are pre-permuted to the kernel's
    [q|k|v] head-major layout, and the shared _finalize_one does the
    heap reconstruction + backtrace — the two paths cannot diverge after
    the emission tape."""
    B = z.shape[0]
    V = model.n_vocab
    t_args = model.dec_tfm_args
    H = t_args.get("n_heads", 4)
    D = t_args.get("d_model", 128)
    F = t_args.get("d_ff", 4 * D)
    dec = params["dec"]
    # Effective compute dtype must mirror the XLA arm's _compute_dtype
    # (the T_args.bf16 flag selects bf16 even over fp32 weights) or the
    # two "token-exact" arms diverge for bf16-flag configs.
    from ..models import transformer as tfm
    dt = tfm._compute_dtype(dec, t_args.get("bf16", False))
    S = model.max_seq_len + 1

    emb_w = params["emb"]["w"].at[PAD_IDX].set(0.0)
    tok_table = (emb_w @ dec["in"]["w"] + dec["in"]["b"]).astype(dt)
    tok_table = jnp.where(tok_table == 0.0, 0.0, tok_table)
    pos_table = dec["pos"][:S].astype(dt)

    perm = pallas_tfm_beam._perm_qkv_cols(H, D)
    layers = []
    for blk in dec["blocks"]:
        layers.append({
            "ln1": blk["ln1"], "ln2": blk["ln2"],
            "qkv": {"w": blk["qkv"]["w"][:, perm],
                    "b": blk["qkv"]["b"][perm]},
            "attn_out": blk["attn_out"], "ff1": blk["ff1"],
            "ff2": blk["ff2"],
        })

    # latent prefix: position-0 cache rows from the XLA arm's own
    # init_cache (one step, shared math)
    cache0 = model.init_decoder_hidden(params, z, c)
    k0s = [kl[:, 0, :] for kl in cache0["k"]]
    v0s = [vl[:, 0, :] for vl in cache0["v"]]

    ys_steps, ptr_steps, sc_steps, scores_f, adv_f, fin_f = (
        pallas_tfm_beam.beam_scan_tfm(
            tok_table, pos_table, layers, dec["ln_f"]["g"],
            dec["ln_f"]["b"], dec["out"]["w"], dec["out"]["b"], k0s, v0s,
            T=T, K=K, V=V, S=S, H=H, F=F, min_length=min_length,
            n_best=n_best, block_b=pallas_tfm_beam.default_block_b(dt),
            interpret=jax.default_backend() != "tpu"))
    mask_steps = ys_steps == EOS_IDX

    prev0 = jnp.full((B, K), PAD_IDX, jnp.int32).at[:, 0].set(START_IDX)
    ys = jnp.concatenate([prev0[:, None], ys_steps], axis=1)
    ptrs = ptr_steps
    fin_mask = mask_steps.reshape(B, T * K)
    fin_score = sc_steps.reshape(B, T * K)
    finalize = jax.vmap(partial(_finalize_one, K=K, n_best=n_best, T=T,
                                fast=nn.fast_gathers_enabled()))
    return finalize(ys, ptrs, scores_f, adv_f, fin_f, fin_mask, fin_score)


@partial(jax.jit, static_argnames=("beam_size", "n_best", "min_length"))
def beam_search_logits(all_logits, beam_size=5, n_best=3, min_length=1):
    """Beam search over PRECOMPUTED per-step logits [B, T, V] — the deconv
    decoder's replay contract: every beam of a sentence sees the same
    distribution at step t (no hidden state, no decoder calls). Bookkeeping
    semantics identical to beam_search."""
    assert beam_size >= n_best
    B, T, V = all_logits.shape
    K = beam_size

    prev0 = jnp.full((B, K), PAD_IDX, jnp.int32).at[:, 0].set(START_IDX)
    state = BeamState(
        scores=jnp.zeros((B, K)),
        prev=prev0,
        h=jnp.zeros((B, K, 1)),
        adv=jnp.zeros((B,), jnp.int32),
        eos_top=jnp.zeros((B,), bool),
        fin_cnt=jnp.zeros((B,), jnp.int32),
    )
    fast = nn.fast_gathers_enabled()
    advance = jax.vmap(partial(_advance_one, K=K, V=V,
                               min_length=min_length,
                               fast=fast and K <= V - 2))
    logits_tm = jnp.swapaxes(all_logits, 0, 1)          # [T, B, V]

    def step(state, logits_t):
        logp1 = jax.nn.log_softmax(logits_t.astype(jnp.float32),
                                   axis=-1)             # [B, V]
        logp = jnp.broadcast_to(logp1[:, None, :], (B, K, V))
        done = state.eos_top & (state.fin_cnt >= n_best)
        best, next_y, prev_k, adv, mask, eos_top_new = advance(
            logp, state.scores, state.prev, state.adv)
        d1 = done[:, None]
        mask = mask & ~d1
        new_state = BeamState(
            scores=jnp.where(d1, state.scores, best),
            prev=jnp.where(d1, state.prev, next_y),
            h=state.h,
            adv=jnp.where(done, state.adv, adv),
            eos_top=state.eos_top | (eos_top_new & ~done),
            fin_cnt=state.fin_cnt + mask.sum(axis=1),
        )
        ys_emit = jnp.where(d1, jnp.full_like(next_y, PAD_IDX), next_y)
        ptr_emit = jnp.where(d1, jnp.zeros_like(prev_k), prev_k)
        return new_state, (ys_emit, ptr_emit, best, mask)

    state, (ys_steps, ptr_steps, sc_steps, mask_steps) = jax.lax.scan(
        step, state, logits_tm)
    ys = jnp.swapaxes(jnp.concatenate([prev0[None], ys_steps], axis=0),
                      0, 1)
    ptrs = jnp.swapaxes(ptr_steps, 0, 1)
    fin_mask = jnp.swapaxes(mask_steps, 0, 1).reshape(B, T * K)
    fin_score = jnp.swapaxes(sc_steps, 0, 1).reshape(B, T * K)
    finalize = jax.vmap(partial(_finalize_one, K=K, n_best=n_best, T=T,
                                fast=fast))
    return finalize(ys, ptrs, state.scores, state.adv, state.fin_cnt,
                    fin_mask, fin_score)
