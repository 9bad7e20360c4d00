"""Whole-scan fused GRU training recurrence as Pallas TPU kernels.

The phase-1 train step is three 25-step GRU lax.scans forward (encoder
fwd/bwd directions, teacher-forced decoder) plus their three reverse-time
gradient scans — six serialized recurrences whose per-step work is a
single small [B, H] x [H, 3H] matmul. Round 3 measured the XLA step at
1.4-2.6% MFU at the reference batch (b32) and attributed it to this
serialization; `ops/pallas_beam.py` then proved the fix on the same
recurrence shape (grid-tiled batch, VMEM-resident carry, whole scan in
one kernel). This module applies that winning technique to TRAINING:

* `_fwd_kernel` runs all T steps of h' = GRU(gi_t, h) inside one
  pallas_call — the recurrent weights and carry stay in VMEM for the
  whole scan; HBM traffic is the pre-gated input tape once in and the
  hidden tape once out.
* `_bwd_kernel` runs the reverse-time gradient recurrence the same way,
  recomputing the cheap gate activations from (h_{t-1}, gi_t) instead of
  taping them (3 extra VPU ops beat 3 extra HBM tapes), and accumulating
  dWh/dbh on-chip; the per-tile partials are reduced across the
  sequential grid in the output ref.
* `jax.custom_vjp` splices the pair into autodiff, so `jax.grad` of a
  loss through `gru_scan` (ops/gru.py) uses both kernels while the large
  MXU-friendly input projections (x @ Wi, and its dWi/dx) stay in XLA
  where they already run well.

Bias handling: the INPUT bias bi folds into the pre-gated tape outside
the kernel (gi = x @ Wi + bi, exactly the XLA scan's hoist), while the
RECURRENT bias bh rides the bias-lane trick from ops/pallas_beam.py —
hidden lane Hp-1 is pinned to 1.0 and bh occupies weight row Hp-1, so
gh = h_aug @ wh_aug == h @ Wh + bh with no [1, 3Hp]-over-sublanes
broadcast (the Mosaic relayout that sank the transposed beam kernel).
This keeps the torch/cuDNN gate grouping EXACT — in particular
n = tanh(i_n + r * (h @ Wh_n + bh_n)), where bh_n sits inside the
reset-gated term and cannot be folded into gi. The same trick makes the
gradient fall out for free: dWh_aug row Hp-1 accumulates exactly dbh.

Padding: H pads to the 128-lane boundary with zero weight rows/columns,
each 3H gate section padded independently; zero-initialized pad lanes
then stay exactly zero through the gate math in BOTH kernels (fwd:
r = z = 0.5, n = 0 -> h' = 0; bwd: dh_pad = 0 propagates 0s), so padded
lanes and padded batch rows contribute nothing to any gradient. The
backward masks the carried dh to real lanes each step — the pinned 1.0
lane is a constant, so no gradient may flow through it.

Scope (`applicable`): h_dim <= 127 (one lane is the bias lane),
fp32/bf16. Reference workload: train_vae.py:13-42 +
models/{encoder.py,decoder.py} (1-layer GRUs, cfg.py:172-176 shapes).
Routed via --hw.pallas_train (config.py). MEASURED OUTCOME (v5e,
tools/bench_pallas_train.py, chained dependent-step protocol): the
fused recurrences win in isolation, but the full train step is
dominated by the optimizer + projections + losses, so end-to-end the
route is 1.06x at the reference batch 32 and a regression at larger
batches (0.71x b256 / 0.92x b1024 — grid tiles serialize, and opaque
kernels deny XLA the cross-op overlap its own scans get). The auto
policy therefore resolves to OFF (ops/gru.pallas_train_enabled);
--hw.pallas_train on opts in. This replaces ops/pallas_kernels.py's
earlier single-block conclusion with whole-scan evidence.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128

# Batch tile per grid step. The backward kernel holds gi/dgi tapes
# (T x Bt x 3Hp) plus the hidden/dh tapes in VMEM: at T=25 fp32 a
# 64-row tile uses ~8 MB of the v5e's 16 MB VMEM. Sweep with
# tools/bench_pallas_train.py --blocks.
BLOCK_B = 64


def set_block_b(value):
    """Set the batch tile (multiple of 16); None restores the swept
    default (64). Read at trace time — callers flipping it must
    jax.clear_caches()."""
    global BLOCK_B
    BLOCK_B = 64 if value is None else int(value)


def applicable(h_dim, dtype) -> bool:
    return (h_dim <= _LANE - 1
            and jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                     jnp.dtype(jnp.bfloat16)))


def _mm(a, b):
    return jax.lax.dot_general(a, b,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_bt(a, b):
    """a [Bt, M], b [Bt, N] -> a^T b [M, N] in f32 (grad accumulation)."""
    return jax.lax.dot_general(a, b,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _sig(x):
    # f32 transcendentals, as ops/pallas_beam._kernel (Mosaic's bf16
    # logistic lowering mis-broadcasts an f32 constant otherwise)
    return jax.nn.sigmoid(x.astype(jnp.float32))


def _tanh(x):
    return jnp.tanh(x.astype(jnp.float32))


def _fwd_kernel(gi_ref, whb_ref, h0_ref, hs_ref, *, T, dt):
    """h_t = GRU(gi_t, h_{t-1}) for t = 0..T-1, one batch tile.

    gi_ref [T, Bt, 3Hp] pre-gated inputs (bi folded in), whb_ref
    [Hp, 3Hp] with bh in row Hp-1, h0_ref [Bt, Hp] with lane Hp-1 pinned
    to 1.0 -> hs_ref [T, Bt, Hp] (pinned lane included; callers slice).
    """
    whb = whb_ref[:]
    Hp = whb.shape[0]
    Bt = h0_ref.shape[0]
    h_lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, Hp), 1)
    is_bias_lane = h_lane == Hp - 1
    one = jnp.asarray(1.0, dt)

    def step(t, h):
        gi = gi_ref[t]                                   # [Bt, 3Hp]
        gh = _mm(h, whb).astype(dt)                      # == h@Wh + bh
        r = _sig(gi[:, :Hp] + gh[:, :Hp]).astype(dt)
        z = _sig(gi[:, Hp:2 * Hp] + gh[:, Hp:2 * Hp]).astype(dt)
        n = _tanh(gi[:, 2 * Hp:] + r * gh[:, 2 * Hp:]).astype(dt)
        h = ((one - z) * n + z * h).astype(dt)           # ops/gru._gates
        h = jnp.where(is_bias_lane, one, h)              # re-pin
        hs_ref[t] = h
        return h

    # carry derived from runtime data (h0), never a jnp.zeros constant:
    # Mosaic cannot relayout a replicated constant through the loop
    # back-edge (see ops/pallas_beam.py)
    jax.lax.fori_loop(0, T, step, h0_ref[:])


def _bwd_kernel(gi_ref, hprev_ref, dhs_ref, whb_ref, whbT_ref,
                dgi_ref, dh0_ref, dwhb_ref, *, T, H, dt):
    """Reverse-time gradient recurrence for one batch tile.

    Inputs: the pre-gated tape gi [T, Bt, 3Hp], the PREVIOUS augmented
    hidden tape hprev [T, Bt, Hp] (hprev[t] = h_{t-1} with the pinned
    bias lane, i.e. concat(h0, hs[:-1])), the incoming cotangents dhs
    [T, Bt, Hp] (dh_last already folded into dhs[T-1] by the wrapper,
    pad lanes zero), whb and its pre-transposed copy whbT [3Hp, Hp].
    Outputs: dgi [T, Bt, 3Hp], dh0 [Bt, Hp], and dwhb [Hp, 3Hp]
    accumulated across the sequential grid — row Hp-1 is exactly dbh
    (the pinned 1.0 lane contracts to a batch sum of the gate grads).
    """
    i = pl.program_id(0)
    whb = whb_ref[:]
    whbT = whbT_ref[:]
    Hp = whb.shape[0]
    f32 = jnp.float32
    Bt = dh0_ref.shape[0]
    h_lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, Hp), 1)
    real = (h_lane < H).astype(f32)   # kills pad lanes AND the bias lane

    def step(s, carry):
        dh, acc_r, acc_z, acc_n = carry
        t = T - 1 - s
        gi = gi_ref[t]
        hp = hprev_ref[t]                                # augmented
        dh = (dh + dhs_ref[t].astype(f32)) * real        # [Bt, Hp] f32

        # recompute the gates (ops/gru._gates forward, same padding)
        gh = _mm(hp, whb).astype(dt)
        gh_n = gh[:, 2 * Hp:]
        r = _sig(gi[:, :Hp] + gh[:, :Hp])
        z = _sig(gi[:, Hp:2 * Hp] + gh[:, Hp:2 * Hp])
        n = _tanh(gi[:, 2 * Hp:] + r.astype(dt) * gh_n)

        # h = (1-z)*n + z*h_prev; the pinned lane is a constant -> its
        # dh was zeroed by `real` above
        dz = dh * (hp.astype(f32) - n)
        dn = dh * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)                      # d(tanh pre-act)
        dr = dn_pre * gh_n.astype(f32)
        dgh_n = dn_pre * r
        dz_pre = dz * z * (1.0 - z)
        dr_pre = dr * r * (1.0 - r)

        dr_c = dr_pre.astype(dt)
        dz_c = dz_pre.astype(dt)
        dn_c = dn_pre.astype(dt)
        dgn_c = dgh_n.astype(dt)
        dgi_ref[t, :, :Hp] = dr_c
        dgi_ref[t, :, Hp:2 * Hp] = dz_c
        dgi_ref[t, :, 2 * Hp:] = dn_c

        # dh_{t-1} = dh*z + dgh @ Wh^T, per gate section ([., Hp] tiles
        # only — no lane concatenates for Mosaic to relayout); masked to
        # real lanes (the bias row of Wh must not leak into the pinned
        # constant lane)
        dh_prev = (dh * z
                   + _mm(dr_c, whbT[:Hp])
                   + _mm(dz_c, whbT[Hp:2 * Hp])
                   + _mm(dgn_c, whbT[2 * Hp:])) * real

        acc_r = acc_r + _mm_bt(hp, dr_c)                 # [Hp, Hp] f32
        acc_z = acc_z + _mm_bt(hp, dz_c)
        acc_n = acc_n + _mm_bt(hp, dgn_c)
        return dh_prev, acc_r, acc_z, acc_n

    # runtime-derived inits (see _fwd_kernel note)
    dh0 = dhs_ref[T - 1].astype(f32) * 0.0
    acc0 = _mm_bt(dh0, dh0)                              # [Hp, Hp] zeros
    dh_fin, acc_r, acc_z, acc_n = jax.lax.fori_loop(
        0, T, step, (dh0, acc0, acc0, acc0))
    dh0_ref[:] = dh_fin.astype(dt)

    @pl.when(i == 0)
    def _init():
        dwhb_ref[:, :Hp] = acc_r
        dwhb_ref[:, Hp:2 * Hp] = acc_z
        dwhb_ref[:, 2 * Hp:] = acc_n

    @pl.when(i > 0)
    def _accum():
        dwhb_ref[:, :Hp] += acc_r
        dwhb_ref[:, Hp:2 * Hp] += acc_z
        dwhb_ref[:, 2 * Hp:] += acc_n


def _pad_to(x, n, axis):
    if x.shape[axis] == n:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, widths)


def _gate_pad(a, axis):
    parts = jnp.split(a, 3, axis=axis)
    return jnp.concatenate([_pad_to(p, _LANE, axis) for p in parts],
                           axis=axis)


def _gate_unpad(a, h, axis):
    parts = jnp.split(a, 3, axis=axis)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, h)
    return jnp.concatenate([p[tuple(sl)] for p in parts], axis=axis)


def _tile(B, block_b):
    # 16-row granularity covers the bf16 sublane tile too
    Bt = min(int(block_b), -(-B // 16) * 16)
    Bpad = -(-B // Bt) * Bt
    return Bt, Bpad


def _whb(wh, bh):
    """[Hp, 3Hp] recurrent weights with bh folded into row Hp-1."""
    wh_p = _gate_pad(_pad_to(wh, _LANE, 0), 1)
    bh_row = _gate_pad(bh[None, :], 1).astype(wh_p.dtype)
    return jnp.concatenate([wh_p[:_LANE - 1], bh_row], axis=0)


def _pin(h_p):
    """Set lane Hp-1 of a padded [*, Hp] array to 1.0."""
    lane = jnp.arange(h_p.shape[-1]) == _LANE - 1
    return jnp.where(lane, jnp.asarray(1.0, h_p.dtype), h_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_seq(wh, bh, gi_tm, h0, block_b=None, interpret=False):
    """Fused GRU over a whole sequence.

    wh [H, 3H], bh [3H]; gi_tm [T, B, 3H] time-major pre-gated inputs
    with the input bias already added (gi = x @ wi + bi); h0 [B, H].
    Returns hs_tm [T, B, H]. Differentiable via the paired bwd kernel.
    """
    return _gru_seq_fwd(wh, bh, gi_tm, h0, block_b, interpret)[0]


def _gru_seq_fwd(wh, bh, gi_tm, h0, block_b, interpret):
    T, B, _ = gi_tm.shape
    H = wh.shape[0]
    dt = wh.dtype
    Bt, Bpad = _tile(B, block_b or BLOCK_B)
    grid = Bpad // Bt

    whb = _whb(wh, bh)                                   # [Hp, 3Hp]
    gi_p = _gate_pad(_pad_to(gi_tm, Bpad, 1), 2)         # [T, Bpad, 3Hp]
    h0_p = _pin(_pad_to(_pad_to(h0, Bpad, 0), _LANE, 1))  # [Bpad, Hp]

    tape3 = pl.BlockSpec((T, Bt, 3 * _LANE), lambda i: (0, i, 0))
    tape1 = pl.BlockSpec((T, Bt, _LANE), lambda i: (0, i, 0))
    tile = pl.BlockSpec((Bt, _LANE), lambda i: (i, 0))
    full = pl.BlockSpec((_LANE, 3 * _LANE), lambda i: (0, 0))

    hs_p = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, dt=dt),
        grid=(grid,),
        in_specs=[tape3, full, tile],
        out_specs=tape1,
        out_shape=jax.ShapeDtypeStruct((T, Bpad, _LANE), dt),
        interpret=interpret,
    )(gi_p, whb, h0_p)

    hs = hs_p[:, :B, :H]
    return hs, (wh, bh, gi_tm, h0, hs)


def _gru_seq_bwd(block_b, interpret, res, dhs):
    wh, bh, gi_tm, h0, hs = res
    T, B, _ = gi_tm.shape
    H = wh.shape[0]
    dt = wh.dtype
    Bt, Bpad = _tile(B, block_b or BLOCK_B)
    grid = Bpad // Bt

    whb = _whb(wh, bh)
    gi_p = _gate_pad(_pad_to(gi_tm, Bpad, 1), 2)
    hprev = jnp.concatenate([h0[None], hs[:-1]], axis=0)  # [T, B, H]
    hprev_p = _pin(_pad_to(_pad_to(hprev, Bpad, 1), _LANE, 2))
    dhs_p = _pad_to(_pad_to(dhs.astype(dt), Bpad, 1), _LANE, 2)

    tape3 = pl.BlockSpec((T, Bt, 3 * _LANE), lambda i: (0, i, 0))
    tape1 = pl.BlockSpec((T, Bt, _LANE), lambda i: (0, i, 0))
    tile = pl.BlockSpec((Bt, _LANE), lambda i: (i, 0))
    full = pl.BlockSpec((_LANE, 3 * _LANE), lambda i: (0, 0))
    fullT = pl.BlockSpec((3 * _LANE, _LANE), lambda i: (0, 0))
    red = pl.BlockSpec((_LANE, 3 * _LANE), lambda i: (0, 0))

    dgi_p, dh0_p, dwhb = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, H=H, dt=dt),
        grid=(grid,),
        in_specs=[tape3, tape1, tape1, full, fullT],
        out_specs=(tape3, tile, red),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bpad, 3 * _LANE), dt),
            jax.ShapeDtypeStruct((Bpad, _LANE), dt),
            jax.ShapeDtypeStruct((_LANE, 3 * _LANE), jnp.float32),
        ),
        interpret=interpret,
    )(gi_p, hprev_p, dhs_p, whb, whb.T)

    dgi = _gate_unpad(dgi_p[:, :B], H, 2)
    dh0 = dh0_p[:B, :H]
    dwh = _gate_unpad(dwhb[:H], H, 1).astype(wh.dtype)
    dbh = _gate_unpad(dwhb[_LANE - 1][None], H, 1)[0].astype(bh.dtype)
    return dwh, dbh, dgi, dh0


gru_seq.defvjp(_gru_seq_fwd, _gru_seq_bwd)
