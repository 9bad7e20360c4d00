"""EXPERIMENTAL Pallas TPU kernels: fused GRU sequence and WAE-MMD.

Status: NOT on any production path. These exist alongside the pure-XLA
implementations (ops/gru.py, ops/losses.py) and are selected explicitly.
Measured twice (rounds 1 and 2, BENCH.md): at the reference's sizes
(B=32..1024, H=80..102, N=32 latents) XLA is at parity or faster — the
recurrences are VMEM-resident either way — and at larger shapes
(B>=4096 or H>=512) this single-block kernel exceeds VMEM and fails to
compile. Making it win would need a grid over batch tiles with the
recurrent state double-buffered per tile; until someone needs GRUs at
those sizes the XLA scan is the right answer, so the kernels stay as a
validated starting point (interpret-mode tests in test_pallas.py), not a
production dispatch.

Kernel notes:
* gru_sequence: the input projection x@Wi for the WHOLE sequence is done by
  the caller (one MXU matmul); the kernel scans time, holding h and Wh in
  VMEM, computing the small recurrent matmul + gates per step (one grid
  step, fori_loop over T). Layout: time-major [T, B, 3H].
* mmd_full: forms the three kernel matrices tile-by-tile in VMEM and
  reduces the reference's H - rowbcast(diag H) sum in one pass.

Pallas programs run in interpret mode on CPU, so unit tests validate both
paths everywhere; on TPU they compile to Mosaic.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU test envs)
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu",)
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# fused GRU sequence kernel
# ---------------------------------------------------------------------------

def _gru_seq_kernel(gi_ref, wh_ref, bh_ref, h0_ref, hs_ref, hT_ref, *, T, H):
    wh = wh_ref[:]                      # [H, 3H] stays in VMEM for all steps
    bh = bh_ref[:]

    def step(t, h):
        gi = gi_ref[t]                  # [B, 3H]
        gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        hs_ref[t] = h_new
        return h_new

    hT_ref[:] = jax.lax.fori_loop(0, T, step, h0_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_sequence_pallas(gi_tm, wh, bh, h0, interpret=None):
    """Time-major fused GRU: gi_tm [T, B, 3H] (pre-projected inputs),
    wh [H, 3H], bh [3H], h0 [B, H] -> (hs [T, B, H], h_T [B, H])."""
    T, B, H3 = gi_tm.shape
    H = H3 // 3
    if interpret is None:
        interpret = not _on_tpu()
    kernel = functools.partial(_gru_seq_kernel, T=T, H=H)
    specs = [pl.BlockSpec(memory_space=_VMEM)] * 4 if _VMEM else None
    out_specs = ([pl.BlockSpec(memory_space=_VMEM)] * 2 if _VMEM else None)
    hs, hT = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((T, B, H), gi_tm.dtype),
                   jax.ShapeDtypeStruct((B, H), gi_tm.dtype)),
        in_specs=specs,
        out_specs=tuple(out_specs) if out_specs else None,
        interpret=interpret,
    )(gi_tm, wh, bh, h0)
    return hs, hT


def gru_scan_pallas(params, xs, h0, reverse=False, interpret=None):
    """Drop-in equivalent of ops.gru.gru_scan using the Pallas kernel."""
    gi_all = xs @ params["wi"] + params["bi"]
    gi_tm = jnp.swapaxes(gi_all, 0, 1)
    if reverse:
        gi_tm = gi_tm[::-1]
    hs, hT = gru_sequence_pallas(gi_tm, params["wh"], params["bh"], h0,
                                 interpret=interpret)
    if reverse:
        hs = hs[::-1]
    return jnp.swapaxes(hs, 0, 1), hT


# ---------------------------------------------------------------------------
# WAE-MMD full-kernel
# ---------------------------------------------------------------------------

def _mmd_kernel(z1_ref, z2_ref, out_ref, *, sigma, N):
    z1 = z1_ref[:]
    z2 = z2_ref[:]

    def k(x, y):
        sq_x = jnp.sum(x * x, axis=1, keepdims=True)
        sq_y = jnp.sum(y * y, axis=1, keepdims=True)
        d = sq_x + sq_y.T - 2.0 * jnp.dot(
            x, y.T, preferred_element_type=jnp.float32)
        return jnp.exp(-d / sigma ** 2)

    H = k(z1, z1) + k(z2, z2) - 2.0 * k(z1, z2)
    H = H - jax.lax.broadcast_in_dim(
        jnp.diagonal(H), H.shape, broadcast_dimensions=(1,))
    out_ref[0, 0] = jnp.sum(H) / (N * (N - 1))


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def mmd_full_pallas(z1, z2, sigma=7.0, interpret=None):
    """Gaussian-kernel MMD^2_u with the reference's diag-row-broadcast
    (losses.py:47-57) as one fused kernel. z1, z2: [N, D]."""
    N = z1.shape[0]
    if interpret is None:
        interpret = not _on_tpu()
    kernel = functools.partial(_mmd_kernel, sigma=sigma, N=N)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), z1.dtype),
        in_specs=([pl.BlockSpec(memory_space=_VMEM)] * 2 if _VMEM
                  else None),
        out_specs=(pl.BlockSpec(memory_space=_VMEM) if _VMEM else None),
        interpret=interpret,
    )(z1, z2)
    return out[0, 0]
