"""GRU cell and sequence scan, TPU-shaped.

Gate math follows the cuDNN/torch convention (two bias vectors, reset gate
applied to the *projected* hidden state), so unit tests can verify bit-level
parity against torch.nn.GRU with copied weights. The reference model's
encoder/decoder are 1-layer GRUs (models/encoder.py:25, decoder.py:40).

TPU-first structure: the input projection for the WHOLE sequence is hoisted
out of the recurrence as one large [B*T, in] x [in, 3H] matmul (MXU-friendly),
so the lax.scan carries only the small [B, H] x [H, 3H] recurrent matmul and
the elementwise gates (fused by XLA into a couple of VPU ops per step).

The whole-scan fused Pallas path (ops/pallas_gru.py — forward + custom-VJP
backward kernels, VMEM-resident carry) replaces the per-step lax.scan here
when enabled; the superseded per-STEP kernel experiment lives in
ops/pallas_kernels.py (its "XLA wins" conclusion applied only to that
single-block formulation — see BENCH.md "fused Pallas train").
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import pallas_gru
from .nn import uniform

# Whole-scan fused Pallas GRU for training/encoding scans: None = auto,
# True/False = forced (config --hw.pallas_train auto|on|off routes here
# via finalize, like ops/beam.set_pallas_beam). Read at trace time.
#
# Auto resolves to OFF: on hardware the fused recurrences win in
# isolation but the full phase-1 train step is dominated by the
# optimizer, input/output projections and losses, so the measured
# end-to-end effect at the chained dependent-step protocol is 1.06x at
# the reference batch (32) and a REGRESSION at larger batches (0.71x at
# b256, 0.92x at b1024 — grid tiles serialize and the opaque kernels
# deny XLA cross-op overlap; tools/bench_pallas_train.py, BENCH.md
# "fused Pallas train"). The XLA scan also stays GSPMD-partitionable
# for DP/TP/PP meshes. Opt in with --hw.pallas_train on.
_PALLAS_TRAIN = None


def set_pallas_train(value):
    """Force (True/False) or restore auto (None) the fused Pallas GRU."""
    global _PALLAS_TRAIN
    _PALLAS_TRAIN = value


def pallas_train_enabled():
    if _PALLAS_TRAIN is not None:
        return _PALLAS_TRAIN
    return False


def init_gru_params(key, in_dim, h_dim, dtype=jnp.float32):
    """Weights stored pre-transposed for x @ W: wi [in,3H], wh [H,3H].

    Gate order along the 3H axis: reset, update, new (torch convention).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / h_dim ** 0.5
    return {
        "wi": uniform(k1, (in_dim, 3 * h_dim), bound, dtype),
        "wh": uniform(k2, (h_dim, 3 * h_dim), bound, dtype),
        "bi": uniform(k3, (3 * h_dim,), bound, dtype),
        "bh": uniform(k4, (3 * h_dim,), bound, dtype),
    }


def _gates(gi, gh, h):
    h_dim = h.shape[-1]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    del h_dim
    return (1.0 - z) * n + z * h


def gru_cell(params, x, h):
    """One step: x [B, in], h [B, H] -> h' [B, H]."""
    gi = x @ params["wi"] + params["bi"]
    gh = h @ params["wh"] + params["bh"]
    return _gates(gi, gh, h)


def gru_cell_pregated(params, gi, h):
    """One step with the input projection ALREADY applied (gi = x@wi+bi).

    Lets callers whose per-step input has loop-invariant factors (e.g. the
    decoder's [emb(token), z, c] input inside a sampling/beam scan) hoist
    those projections out of the recurrence; only the [B,H]x[H,3H]
    recurrent matmul remains per step."""
    gh = h @ params["wh"] + params["bh"]
    return _gates(gi, gh, h)


@partial(jax.jit, static_argnames=("reverse",))
def gru_scan(params, xs, h0, reverse=False):
    """Full-sequence GRU.

    xs: [B, T, in], h0: [B, H]. Returns (hs [B, T, H], h_T [B, H]).
    With reverse=True the scan runs T-1..0 and hs[t] is the state after
    consuming xs[t..T-1] (torch bidirectional semantics).
    """
    if (pallas_train_enabled()
            and pallas_gru.applicable(h0.shape[-1], h0.dtype)):
        # fused whole-scan kernel: same hoisted input projection as the
        # XLA path below; bh rides the kernel's bias lane so the torch
        # gate grouping (bh_n inside the reset-gated term) stays exact
        gi_all = xs @ params["wi"] + params["bi"]
        gi_tm = jnp.swapaxes(gi_all, 0, 1)             # [T, B, 3H]
        if reverse:
            gi_tm = jnp.flip(gi_tm, 0)
        hs_tm = pallas_gru.gru_seq(params["wh"], params["bh"], gi_tm, h0,
                                   None,
                                   jax.default_backend() != "tpu")
        h_last = hs_tm[-1]
        if reverse:
            hs_tm = jnp.flip(hs_tm, 0)
        return jnp.swapaxes(hs_tm, 0, 1), h_last

    # hoist the input projection out of the recurrence: one big MXU matmul
    gi_all = xs @ params["wi"] + params["bi"]          # [B, T, 3H]
    gi_tm = jnp.swapaxes(gi_all, 0, 1)                 # [T, B, 3H] time-major

    wh, bh = params["wh"], params["bh"]

    def step(h, gi):
        h_new = _gates(gi, h @ wh + bh, h)
        return h_new, h_new

    h_last, hs = jax.lax.scan(step, h0, gi_tm, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), h_last
