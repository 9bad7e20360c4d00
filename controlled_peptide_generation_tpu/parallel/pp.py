"""Pipeline parallelism for the transformer family (GPipe via shard_map).

The reference is strictly single-device (SURVEY.md §2.28 — one
cuda:0-or-cpu torch.device, reference main.py:39); at the reference's own
scale (~0.5M params, 2 blocks) pipelining is counter-productive and DP/TP
(parallel/mesh.py, parallel/tp.py) cover scaling. This module completes
the sharding vocabulary for the transformer stretch family with the
TPU-idiomatic pipeline recipe, so deeper configs of the same architecture
can span chips that TP alone can't reach:

* the block stack is split into ``pipe`` contiguous stages; each device of
  a 1-D ``Mesh(('pipe',))`` owns one stage's blocks (the stage-stacked
  param leaves are sharded on their leading axis — XLA slices, it never
  materialises the full stack per device);
* the batch is split into M microbatches which stream through the stages
  in the classic GPipe schedule: M + S - 1 ticks of a ``lax.scan``, each
  tick running every device's stage on its current microbatch and handing
  activations to the next stage over a ``ppermute`` ring (ICI
  neighbours — no host, no gather);
* the backward pass needs no hand-written schedule: ``jax.grad``
  differentiates through shard_map / scan / ppermute, and the transpose
  of a forward ppermute is the reverse-ring ppermute, so the cotangents
  flow stage-to-stage backwards through the same bubble automatically;
* only the full-sequence (teacher-forced) passes pipeline — exactly where
  training FLOPs live. Single-step KV-cache generation keeps its fused
  single-program path (latent/fused.py); a 25-token decode step is far
  too small to ship between chips.

Integration is a pure drop-in: ``make_pp_model(model, mesh)`` returns a
``dataclasses.replace``d model whose ``{enc,dec}_blocks_apply`` hooks
route block stacks through the pipeline, so the standard jitted train
step / loss library / eval paths run unchanged and trajectories match the
single-device step exactly (the pipeline reorders no arithmetic within a
microbatch; microbatches are concatenated, not reduced).

Hybrid data x pipeline parallelism costs no extra code: shard_map here is
manual over 'pipe' ONLY, so on a ('data', 'pipe') mesh
(``get_mesh_pipe(pp, dp=...)``) GSPMD keeps the microbatch rows sharded
over 'data' straight through the pipeline and the DP step builders
(parallel/mesh.py) accept the PP model unchanged — their gradient psum
spans the data axis around the pipe schedule (test_pp.py hybrid test).

Constraints (asserted loudly): n_layers % pipe == 0, batch % n_micro == 0,
p_dropout == 0 (the reference family default — per-block dropout keys
would have to travel with the microbatches).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.transformer import _block_full


def get_mesh_pipe(pp, dp=1, devices=None):
    """Mesh with a 'pipe' axis over the first ``dp * pp`` devices.

    dp == 1: 1-D Mesh(('pipe',)). dp > 1: 2-D Mesh(('data', 'pipe')) for
    hybrid data x pipeline parallelism — 'pipe' is fastest-varying so each
    stage hand-off is one ICI hop, and the gradient psum spans the slower
    'data' axis (same layout rule as tp.get_mesh_2d)."""
    devices = devices if devices is not None else jax.devices()
    n = dp * pp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if dp == 1:
        return Mesh(np.array(devices[:pp]), ("pipe",))
    return Mesh(np.array(devices[:n]).reshape(dp, pp), ("data", "pipe"))


def _stack_blocks(blocks, n_stages):
    """List of L same-structure block param dicts -> one pytree whose
    leaves are [n_stages, L // n_stages, ...] (stage-major)."""
    L = len(blocks)
    per = L // n_stages
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    return (jax.tree.map(
        lambda l: l.reshape(n_stages, per, *l.shape[1:]), stacked), per)


def make_blocks_apply(mesh, n_heads, n_micro=None):
    """Build a ``blocks_apply(blocks, x, mask) -> x`` pipeline schedule.

    ``blocks``: list of block param dicts (len divisible by the mesh's
    pipe degree); ``x``: [B, S_len, D] activations; ``mask``: attention
    mask broadcastable to [B, H, S_len, S_len]. Default microbatch count
    is the stage count (the minimum that keeps every stage busy in the
    steady state); when the batch does not divide, the count adapts to
    gcd(B, n_micro) — the schedule is correct for ANY microbatch count,
    fewer just means a bigger bubble (down to M=1 = purely sequential
    stages), so odd CLI batch sizes degrade throughput, never error."""
    S = mesh.shape["pipe"]
    ring = [(i, (i + 1) % S) for i in range(S)]

    def blocks_apply(blocks, x, mask):
        import math
        L = len(blocks)
        assert L % S == 0, f"n_layers {L} not divisible by pipe={S}"
        B = x.shape[0]
        M = math.gcd(B, int(n_micro) if n_micro else S)
        stacked, per = _stack_blocks(blocks, S)
        mask_b = jnp.broadcast_to(mask, (B,) + mask.shape[1:])
        xm = x.reshape(M, B // M, *x.shape[1:])
        maskm = mask_b.reshape(M, B // M, *mask_b.shape[1:])

        def stage_fn(blocks_stage, xi, mi):
            for i in range(per):
                p = jax.tree.map(lambda l: l[i], blocks_stage)
                xi = _block_full(p, xi, mi, n_heads)
            return xi

        def pipe(blocks_local, xm, maskm):
            # blocks_local leaves are [1, per, ...] — this device's stage
            blocks_stage = jax.tree.map(lambda l: l[0], blocks_local)
            idx = jax.lax.axis_index("pipe")

            def tick(state, t):
                recv, outs = state
                # stage s processes microbatch t - s at tick t; out-of-
                # range ticks compute on clamped/stale data whose results
                # are never stored (and whose cotangents are zero)
                m_in = jnp.clip(t - idx, 0, M - 1)
                x_in = jnp.where(
                    idx == 0,
                    jax.lax.dynamic_index_in_dim(xm, m_in, 0, False),
                    recv)
                mi = jax.lax.dynamic_index_in_dim(maskm, m_in, 0, False)
                y = stage_fn(blocks_stage, x_in, mi)
                m_out = t - (S - 1)
                store = (idx == S - 1) & (m_out >= 0)
                mo = jnp.clip(m_out, 0, M - 1)
                cur = jax.lax.dynamic_index_in_dim(outs, mo, 0, False)
                outs = jax.lax.dynamic_update_index_in_dim(
                    outs, jnp.where(store, y, cur), mo, 0)
                recv = jax.lax.ppermute(y, "pipe", ring)
                return (recv, outs), None

            # the carry becomes device-varying on the first tick; mark the
            # (invariant) zero initials accordingly for the vma checker
            init = jax.lax.pcast(
                (jnp.zeros_like(xm[0]), jnp.zeros_like(xm)),
                ("pipe",), to="varying")
            (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
            # hand the last stage's outputs to everyone (out_specs P()
            # wants replication); zeros elsewhere make psum a broadcast
            return jax.lax.psum(
                jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)),
                "pipe")

        # manual ONLY over 'pipe': on a hybrid ('data', 'pipe') mesh the
        # batch dims stay in GSPMD's hands, so the same schedule runs
        # data-sharded microbatches without any code change
        out = jax.shard_map(pipe, mesh=mesh,
                            in_specs=(P("pipe"), P(), P()),
                            out_specs=P(), axis_names={"pipe"})(
                                stacked, xm, maskm)
        return out.reshape(B, *x.shape[1:])

    return blocks_apply


def validate_pp_divisibility(model, pp):
    """Every transformer leg's depth must split into pipe stages, and the
    family's dropout must be off (see module docstring)."""
    for name, args in (("encoder", model.enc_tfm_args),
                       ("decoder", model.dec_tfm_args)):
        if not args:
            continue
        n_layers = args.get("n_layers", 2)
        assert n_layers % pp == 0, (
            f"{name} n_layers {n_layers} not divisible by pipe={pp}")
        assert args.get("p_dropout", 0.0) == 0.0, (
            f"pipeline parallelism requires {name} p_dropout == 0")


def make_pp_model(model, mesh, n_micro=None):
    """Drop-in pipeline-parallel variant of a transformer-family model.

    Returns ``model`` with its transformer block stacks routed through a
    GPipe schedule over ``mesh``'s 'pipe' axis. Only legs whose class is
    'transformer' change; the result plugs into the unmodified train step
    (train/train_vae.py) and produces the single-device trajectory."""
    pp = mesh.shape["pipe"]
    validate_pp_divisibility(model, pp)
    upd = {}
    if model.E_class == "transformer":
        upd["enc_blocks_apply"] = make_blocks_apply(
            mesh, model.enc_tfm_args.get("n_heads", 4), n_micro)
    if model.G_class == "transformer":
        upd["dec_blocks_apply"] = make_blocks_apply(
            mesh, model.dec_tfm_args.get("n_heads", 4), n_micro)
    assert upd, "pipeline parallelism applies to the transformer family"
    return dataclasses.replace(model, **upd)
