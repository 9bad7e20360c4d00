"""GRU cell and sequence scan, TPU-shaped.

Gate math follows the cuDNN/torch convention (two bias vectors, reset gate
applied to the *projected* hidden state), so unit tests can verify bit-level
parity against torch.nn.GRU with copied weights. The reference model's
encoder/decoder are 1-layer GRUs (models/encoder.py:25, decoder.py:40).

TPU-first structure: the input projection for the WHOLE sequence is hoisted
out of the recurrence as one large [B*T, in] x [in, 3H] matmul (MXU-friendly),
so the lax.scan carries only the small [B, H] x [H, 3H] recurrent matmul and
the elementwise gates (fused by XLA into a couple of VPU ops per step).

An optional fused Pallas step kernel exists in ops/pallas_kernels.py; at the
reference's sizes (H=80..102) the XLA path is at parity or faster, and is the
default (see bench notes in BENCH.md).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .nn import uniform


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
    # hoist the input projection out of the recurrence: one big MXU matmul
    gi_all = xs @ params["wi"] + params["bi"]          # [B, T, 3H]
    gi_tm = jnp.swapaxes(gi_all, 0, 1)                 # [T, B, 3H] time-major

    wh, bh = params["wh"], params["bh"]

    def step(h, gi):
        h_new = _gates(gi, h @ wh + bh, h)
        return h_new, h_new

    h_last, hs = jax.lax.scan(step, h0, gi_tm, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), h_last
