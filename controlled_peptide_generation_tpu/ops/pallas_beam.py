"""Whole-scan fused GRU beam search as ONE Pallas TPU kernel.

The XLA beam (ops/beam.py) is a lax.scan whose 25 iterations each run a
few fused kernels with the carried state (hidden, scores, prev tokens)
round-tripping through HBM between them — BENCH.md's roofline puts it at
8-12% MFU / 10-27% HBM BW, between both roofs, with the gap attributed to
the serialized scan + VPU bookkeeping. This kernel runs the ENTIRE T-step
beam recurrence for a tile of sentences inside one pallas_call: weights,
hidden state and all bookkeeping live in VMEM for all T steps, so the
only HBM traffic is the per-tile inputs once and the [Bt, T*K] emission
tape once (2D batch-tiled — see beam_scan_gru's "2D OUTPUTS ONLY" note
for the miscompile this layout guards against).

Layout: the NATURAL orientation — batch on sublanes, features on lanes —
with one [Bt, .] tile per beam slot and the K-loop unrolled (tuples of K
arrays in the fori_loop carry, no concatenates). Every per-step op is a
TPU-native pattern:

* matmuls contract over a 128-lane feature axis on the MXU
  ([Bt, Hp] x [Hp, 3Hp]);
* the token-embedding lookup is a one-hot matmul (== nn.table_lookup's
  fast path, exact);
* GRU/output biases are FOLDED into the matmuls via an always-1 pad lane
  of the hidden state (lane Hp-1 carries 1.0; the matching weight row
  carries the bias), so no [1, N]-over-sublanes broadcasts exist —
  Mosaic's unimplemented "sublane broadcast" relayout is what sank the
  transposed formulation of this kernel;
* softmax / top-k reductions are lane reductions emitting [Bt, 1]
  columns, and all bookkeeping (scores, prev, adv, fin counts) are
  [Bt, 1] columns — compares and selects only, no gathers or scatters;
* the hidden-state beam reorder is the same K-way select chain as
  ops/nn.take_small_axis1.

Semantics are exactly ops/beam.py's scan (same candidate masking, NEG
constants, signed-zero canonicalization, lowest-flat-index tie-breaking
via per-block lane argmax + lowest-block pick, done-gating). The
post-scan heap reconstruction / backtrace stays in XLA
(ops/beam._finalize_one) — it is one cheap pass, and keeping it shared
guarantees the two paths diverge nowhere after the emission tape.

Scope (enforced by `applicable`): GRU decoder family without skip
connections, V <= 128, h_dim <= 127 (one pad lane is the bias lane),
beam_size <= V - 2 (the same precondition as nn.topk_small). Reference
contract: models/Beam.py semantics via ops/beam.py; decoder math
models/decoder.py apply_step (reference models/decoder.py:60-99).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU backend optional at import time (CPU test envs run interpret)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from ..data.vocab import PAD_IDX, START_IDX, EOS_IDX

NEG = -1e20
_LANE = 128           # TPU lane width; feature axes are padded to this
NINF = float("-inf")

# Sentences per grid step (the kernel's batch tile). Bigger tiles give the
# MXU taller operands per serial recurrence step at the cost of grid-level
# pipelining across tiles; sweep with tools/bench_pallas_beam.py --blocks.
BLOCK_B = 128


def set_block_b(value):
    """Set the batch tile (multiple of 8); None restores the swept
    default (128). Read at trace time — callers flipping it must
    jax.clear_caches()."""
    global BLOCK_B
    BLOCK_B = 128 if value is None else int(value)


def applicable(model, beam_size, dtype) -> bool:
    """True when beam_search can route through this kernel.

    The T*K cap: the round-4 tape-scramble fix made tape emission K
    masked full-width selects over [Bt, TKp] accumulators per step per
    tape — O(T^2 K^2) VPU work and 3 TKp-wide carries of VMEM, fine at
    the reference shape (T=25, K=5 -> TKp=128, one lane tile) but
    quadratically worse with sequence length. Gate at TKp <= 2*_LANE so a
    future longer-sequence config silently falls back to the XLA arm
    instead of blowing VMEM or regressing past it (the divergence
    protocol covers both arms either way)."""
    if model.G_class != "gru":
        return False
    if model.gru_args.get("skip_connections", False):
        return False
    if model.max_seq_len * beam_size > 2 * _LANE:
        return False
    return (model.n_vocab <= _LANE and model.h_dec <= _LANE - 1
            and 1 < beam_size <= model.n_vocab - 2
            and jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                     jnp.dtype(jnp.bfloat16)))


def _kernel(tok_t_ref, zc_gi_ref, wh_ref, wout_ref, zc0_ref,
            ys_ref, ptr_ref, sc_ref, scoref_ref, adv_ref, fin_ref,
            *, T, K, V, H, Bt, TKp, min_length, n_best, dt):
    f32 = jnp.float32

    tok_t = tok_t_ref[:]                     # [Vp, 3Hp] gate-blocked
    zc_gi = zc_gi_ref[:]                     # [Bt, 3Hp]
    wh = wh_ref[:]                           # [Hp, 3Hp] (bias in row Hp-1)
    wout = wout_ref[:]                       # [Hp, Vp]  (bias in row Hp-1)

    Hp = wh.shape[0]
    Vp = tok_t.shape[0]

    v_lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, Vp), 1)    # vocab ids
    h_lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, Hp), 1)
    is_bias_lane = h_lane == Hp - 1
    one = jnp.asarray(1.0, dt)
    # emission-tape lane map: step t, beam k lands in lane t*K + k of a
    # [Bt, TKp] accumulator carried through the loop. The tape is written
    # as ONE 2D batch-tiled store at the end — see the module docstring's
    # "2D outputs only" note for why no [T, Bt, K] output windows exist.
    tk_lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, TKp), 1)

    # Mosaic's bf16 logistic/tanh lowering mis-broadcasts an f32 constant
    # into a bf16 vector (VerificationError); computing the transcendental
    # in f32 and rounding back matches what the VPU does internally for
    # bf16 elementwise transcendentals anyway.
    def sig(x):
        return jax.nn.sigmoid(x.astype(f32)).astype(dt)

    def tanh(x):
        return jnp.tanh(x.astype(f32)).astype(dt)

    def mm(a, b):
        out = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        return out.astype(dt)

    def step(t, carry):
        h, scores, prev, adv, eos_top, fin, ys_acc, ptr_acc, sc_acc = carry
        # h: K x [Bt, Hp] dt (lane Hp-1 pinned to 1.0); scores: K x
        # [Bt, 1] f32; prev: K x [Bt, 1] i32; adv/fin/eos_top [Bt, 1]
        # i32 (Mosaic cannot carry i1 vectors through scf.for, so the
        # sticky eos flag rides as 0/1 int); ys/ptr/sc_acc [Bt, TKp]
        # emission-tape accumulators (lane t*K+k <- step t, beam k)
        done = (eos_top > 0) & (fin >= n_best)                   # [Bt, 1]
        cur_len = adv + 1
        eos_early = cur_len < min_length
        is_first = adv == 0

        cand, h_new = [], []
        for k in range(K):
            # gi = tok_table[prev] + zc_gi as a one-hot matmul
            # (== nn.table_lookup's fast path, exact)
            oh = (v_lane == prev[k]).astype(dt)                  # [Bt, Vp]
            gi = mm(oh, tok_t) + zc_gi                           # [Bt, 3Hp]
            gh = mm(h[k], wh)       # [Bt, 3Hp]; bias via the 1.0 lane
            r = sig(gi[:, :Hp] + gh[:, :Hp])
            zg = sig(gi[:, Hp:2 * Hp] + gh[:, Hp:2 * Hp])
            n = tanh(gi[:, 2 * Hp:] + r * gh[:, 2 * Hp:])
            hk = ((one - zg) * n + zg * h[k]).astype(dt)
            # re-pin the bias lane (the gate math decays it toward 0.5)
            hk = jnp.where(is_bias_lane, one, hk)                # [Bt, Hp]
            h_new.append(hk)

            logits = mm(hk, wout).astype(f32)                    # [Bt, Vp]
            logits = jnp.where(v_lane < V, logits, NINF)
            m = jnp.max(logits, axis=1, keepdims=True)           # [Bt, 1]
            sh = logits - m
            logp = sh - jnp.log(jnp.sum(jnp.exp(sh), axis=1,
                                        keepdims=True))

            # candidate row block (beam.py _advance_one)
            wp = jnp.where(v_lane == START_IDX, NEG, logp)
            wp = jnp.where((v_lane == EOS_IDX) & eos_early, NEG, wp)
            later = wp + scores[k]
            later = jnp.where(prev[k] == EOS_IDX, NEG, later)
            first = wp if k == 0 else jnp.full_like(wp, NINF)
            bs = jnp.where(is_first, first, later)
            cand.append(jnp.where(bs == 0.0, 0.0, bs))           # -0.0->+0.0

        # iterated top-K over each sentence's [K, V] candidates: per-block
        # lane (max, argmax), then lowest-best-block pick == lowest flat
        # k*V+v index among ties == lax.top_k / nn.topk_small order.
        best_l, nexty_l, prevk_l = [], [], []
        for _ in range(K):
            rmax = [jnp.max(cand[k], axis=1, keepdims=True)
                    for k in range(K)]                           # K x [Bt,1]
            rarg = [jnp.argmax(cand[k], axis=1,
                               keepdims=True).astype(jnp.int32)
                    for k in range(K)]
            vbest = rmax[K - 1]
            # derive the init from the argmax output rather than a
            # jnp.full: a replicated-layout constant entering this select
            # chain makes Mosaic attempt a non-replicated -> replicated
            # relayout it has not implemented ("Invalid relayout")
            kbest = rarg[K - 1] * 0 + (K - 1)
            for j in range(K - 2, -1, -1):
                cond = rmax[j] >= vbest
                vbest = jnp.where(cond, rmax[j], vbest)
                kbest = jnp.where(cond, j, kbest)
            vstar = rarg[K - 1]
            for j in range(K - 2, -1, -1):
                vstar = jnp.where(kbest == j, rarg[j], vstar)
            best_l.append(vbest)
            nexty_l.append(vstar)
            prevk_l.append(kbest)
            cand = [jnp.where((kbest == k) & (v_lane == vstar), NINF,
                              cand[k]) for k in range(K)]

        # bookkeeping + emission tape (done-gated exactly like beam.py)
        eos_new = eos_top | ((nexty_l[0] == EOS_IDX)
                             & ~done).astype(jnp.int32)
        fin_new = fin
        scores_new, prev_new, h_next = [], [], []
        for k in range(K):
            mask_k = (nexty_l[k] == EOS_IDX) & ~done
            fin_new = fin_new + mask_k.astype(jnp.int32)
            scores_new.append(jnp.where(done, scores[k], best_l[k]))
            prev_new.append(jnp.where(done, prev[k], nexty_l[k]))
            # emission tape: a lane-masked select into the [Bt, TKp]
            # accumulators ([Bt, 1] payloads broadcast over lanes) — no
            # per-step stores, no dynamic slicing
            hit = tk_lane == t * K + k
            ys_acc = jnp.where(hit, jnp.where(done, PAD_IDX, nexty_l[k]),
                               ys_acc)
            ptr_acc = jnp.where(hit, jnp.where(done, 0, prevk_l[k]),
                                ptr_acc)
            sc_acc = jnp.where(hit, best_l[k], sc_acc)  # ungated, as beam.py
            # beam reorder of the hidden state: K-way select chain
            hk = h_new[K - 1]
            for j in range(K - 2, -1, -1):
                hk = jnp.where(prevk_l[k] == j, h_new[j], hk)
            h_next.append(hk)
        adv_new = jnp.where(done, adv, adv + 1)

        return (tuple(h_next), tuple(scores_new), tuple(prev_new),
                adv_new, eos_new, fin_new, ys_acc, ptr_acc, sc_acc)

    zc0 = zc0_ref[:].astype(dt)                                  # [Bt, Hp]
    zc0 = jnp.where(is_bias_lane, one, zc0)
    # Carry inits are derived from runtime data (a zeroed zc0 column) so
    # their layouts match the loop-body outputs: jnp.zeros/full constants
    # enter the fori_loop fully lane/sublane-replicated, the body's
    # max/argmax outputs are sublane-varying, and Mosaic's back-edge
    # relayout non-replicated -> replicated is unimplemented
    # ("Invalid relayout" at kernel compile time on v5e).
    zi = (zc0[:, :1].astype(f32) * 0.0).astype(jnp.int32)        # [Bt, 1]
    zf = zi.astype(jnp.float32)
    # tape inits derived from the lane iota (not jnp.zeros) so the carry
    # layout is lane-varying from iteration 0, matching the body's
    # masked-select outputs (same "Invalid relayout" avoidance as zi/zf)
    tz = tk_lane * 0
    carry = (
        tuple(zc0 for _ in range(K)),
        tuple(zf for _ in range(K)),
        tuple(zi + (START_IDX if k == 0 else PAD_IDX)
              for k in range(K)),
        zi, zi, zi,
        tz, tz, tz.astype(jnp.float32),
    )
    (_, scores, _, adv, _, fin, ys_acc, ptr_acc, sc_acc) = (
        jax.lax.fori_loop(0, T, step, carry))
    ys_ref[:] = ys_acc
    ptr_ref[:] = ptr_acc
    sc_ref[:] = sc_acc
    for k in range(K):
        scoref_ref[:, k:k + 1] = scores[k]
    adv_ref[:] = adv
    fin_ref[:] = fin


def _pad_to(x, n, axis, value=0.0):
    if x.shape[axis] == n:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=(
    "T", "K", "V", "H", "min_length", "n_best", "block_b", "interpret"))
def beam_scan_gru(tok_table, zc_gi, wh, bh, w_out, b_out, zc0, *,
                  T, K, V, H, min_length, n_best, block_b=128,
                  interpret=False):
    """Run the fused beam scan; returns the same per-step tape and final
    state as ops/beam.py's lax.scan, in BATCH-MAJOR [B, T, K] layout.

    tok_table [V, 3H] (signed zeros already canonicalized), zc_gi [B, 3H]
    (input bias bi already folded in), wh [H, 3H], bh [3H], w_out [H, V],
    b_out [V], zc0 [B, H] — all in the decode dtype. Gate sections of
    every 3H axis are padded independently to the 128-lane boundary so
    padded h lanes stay exactly zero through the gate math (zero weights
    -> r/z = 0.5, n = 0, h' = 0.5 * h = 0); bh and b_out ride weight row
    Hp-1 against the hidden state's pinned 1.0 bias lane.

    2D OUTPUTS ONLY (miscompile guard): the kernel emits the per-step
    tapes as one [Bpad, TKp] batch-tiled array per tape (lane t*K + k),
    NOT as [T, Bpad, K] windows. On this toolchain, 3D tape outputs are
    silently corrupted between the kernel and its XLA consumers at
    specific batch shapes (B = 6144/12288/20000... with block_b 128:
    ~100%% of token rows scrambled while the 2D score/adv/fin outputs of
    the very same call stay bit-exact, and a standalone jit of the same
    kernel at the same B is bit-exact too — repro:
    tools/repro_tape_scramble.py). Keeping every output 2D batch-tiled
    keeps the whole result in the empirically safe family and also
    deletes the [T, B, K] transposes the consumer needed.

    Returns (ys_steps [B,T,K] i32, ptr_steps [B,T,K] i32,
             sc_steps [B,T,K] f32, scores [B,K] f32, adv [B] i32,
             fin_cnt [B] i32).
    """
    B = zc_gi.shape[0]
    dt = tok_table.dtype
    Hp = _LANE
    Vp = _LANE
    Bt = int(block_b)
    assert Bt % 8 == 0, "block_b must be a multiple of the sublane tile"
    Bpad = -(-B // Bt) * Bt
    grid = Bpad // Bt
    TKp = -(-(T * K) // _LANE) * _LANE

    def gate_pad(a, axis):
        """pad each of the three H-wide gate sections to Hp along axis."""
        parts = jnp.split(a, 3, axis=axis)
        return jnp.concatenate([_pad_to(p, Hp, axis) for p in parts],
                               axis=axis)

    tok_t = _pad_to(gate_pad(tok_table, 1), Vp, 0)               # [Vp, 3Hp]
    zc_gi_p = gate_pad(_pad_to(zc_gi, Bpad, 0), 1)               # [Bpad,3Hp]
    # recurrent weights with the two biases folded into row Hp-1 (the
    # hidden state's pinned 1.0 lane): gh = h_aug @ wh_aug == h@wh + bh
    wh_p = gate_pad(_pad_to(wh, Hp, 0), 1)                       # [Hp, 3Hp]
    bh_row = gate_pad(bh[None, :], 1)                            # [1, 3Hp]
    wh_p = jnp.concatenate([wh_p[:Hp - 1], bh_row.astype(wh_p.dtype)], 0)
    wout_p = _pad_to(_pad_to(w_out, Hp, 0), Vp, 1)               # [Hp, Vp]
    bo_row = _pad_to(b_out[None, :], Vp, 1)
    wout_p = jnp.concatenate([wout_p[:Hp - 1],
                              bo_row.astype(wout_p.dtype)], 0)
    zc0_p = _pad_to(_pad_to(zc0, Bpad, 0), Hp, 1)                # [Bpad, Hp]

    kern = functools.partial(_kernel, T=T, K=K, V=V, H=H, Bt=Bt, TKp=TKp,
                             min_length=min_length, n_best=n_best, dt=dt)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))
    tile2 = lambda d: pl.BlockSpec((Bt, d), lambda i: (i, 0))
    tape = lambda dtype: jax.ShapeDtypeStruct((Bpad, TKp), dtype)
    out_shapes = (
        tape(jnp.int32), tape(jnp.int32), tape(jnp.float32),
        jax.ShapeDtypeStruct((Bpad, K), jnp.float32),    # final scores
        jax.ShapeDtypeStruct((Bpad, 1), jnp.int32),      # adv
        jax.ShapeDtypeStruct((Bpad, 1), jnp.int32),      # fin_cnt
    )
    out_specs = (tile2(TKp), tile2(TKp), tile2(TKp),
                 tile2(K), tile2(1), tile2(1))
    ys, ptr, sc, scores, adv, fin = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[full((Vp, 3 * Hp)), tile2(3 * Hp), full((Hp, 3 * Hp)),
                  full((Hp, Vp)), tile2(Hp)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(tok_t, zc_gi_p, wh_p, wout_p, zc0_p)

    def tapes(a):
        return a[:B, :T * K].reshape(B, T, K)

    return (tapes(ys), tapes(ptr), tapes(sc),
            scores[:B], adv[:B, 0], fin[:B, 0])
