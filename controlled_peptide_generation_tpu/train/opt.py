"""Optimizer construction shared by every phase-1 trainer (single-device,
DP mesh), plus the FLAT-vector Adam variant.

The reference optimizes with torch Adam + clip_grad_norm_(5.0)
(train_vae.py:39-42, cfg.py:234-236); the default here is the exact
optax equivalent. The flat variant exists for TPU dispatch-latency
reasons: the train step at the reference batch (32) is latency-bound,
not FLOP-bound (1.4% MFU; BENCH.md "fused Pallas train" ablation puts
grad+adam at ~193 us of a ~211 us step, the recurrences a minority).
optax's tree-structured clip+adam emits a handful of small fused
kernels PER PARAMETER LEAF (global-norm partials, moment updates,
bias corrections); raveling the ~0.5M-param tree into ONE vector turns
the whole optimizer into ~four large VPU ops and one reduction —
tools/bench_flat_adam.py measures the effect with the chained
device-time protocol.

Math is the same as optax.chain(clip_by_global_norm, adam) up to float
re-association: the global norm sums squares over one concatenated
vector instead of per-leaf partials, so trajectories are statistically
identical, not bit-identical (tests/test_flat_opt.py bounds the drift).
The opt-state checkpoint layout differs (one m/v vector vs per-leaf
moments): don't flip hw.flat_optimizer across a resume.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

# None = auto (currently OFF), True/False = forced; set from
# config.finalize via --hw.flat_optimizer auto|on|off, read at
# trainer-build time (like ops/beam.set_pallas_beam).
_FLAT_OPT = None


def set_flat_optimizer(value):
    """Force (True/False) or restore auto (None) the flat-vector Adam."""
    global _FLAT_OPT
    _FLAT_OPT = value


def flat_optimizer_enabled():
    if _FLAT_OPT is not None:
        return _FLAT_OPT
    return False


class FlatAdamState(NamedTuple):
    m: jnp.ndarray       # first moment, one raveled vector
    v: jnp.ndarray       # second moment
    count: jnp.ndarray   # scalar int32 step count


def flat_adam(lr, clip, b1=0.9, b2=0.999, eps=1e-8):
    """optax.chain(clip_by_global_norm(clip), adam(lr)) computed on the
    raveled parameter vector. Drop-in GradientTransformation: update()
    takes/returns pytrees, only the internal state is flat."""

    def init(params):
        flat, _ = ravel_pytree(params)
        # m and v must be DISTINCT buffers: the donated train step donates
        # every opt-state leaf, and aliasing them trips XLA's
        # "donate the same buffer twice" check at dispatch time
        return FlatAdamState(m=jnp.zeros_like(flat),
                             v=jnp.zeros_like(flat),
                             count=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        del params
        g, unravel = ravel_pytree(grads)
        norm = jnp.sqrt(jnp.sum(g * g))
        g = jnp.where(norm < clip, g, g * (clip / norm))
        count = optax.safe_increment(state.count)
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * (g * g)
        mh = m / (1.0 - b1 ** count)
        vh = v / (1.0 - b2 ** count)
        upd = (-lr) * mh / (jnp.sqrt(vh) + eps)
        return unravel(upd), FlatAdamState(m=m, v=v, count=count)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfgv, flat=None):
    """The phase-1 optimizer (reference train_vae.py:39-42 contract).

    flat=None reads the hw.flat_optimizer policy; True/False force."""
    if flat is None:
        flat = flat_optimizer_enabled()
    if flat:
        return flat_adam(cfgv.lr, cfgv.clip_grad)
    return optax.chain(
        optax.clip_by_global_norm(cfgv.clip_grad),
        optax.adam(cfgv.lr),
    )
