"""Tensor parallelism for the transformer family (Megatron-style, via GSPMD).

The reference is strictly single-device (SURVEY.md §2.28 — one
cuda:0-or-cpu torch.device, main.py:39) and its GRU/CNN models (~0.5M
params) make TP counter-productive; data parallelism covers them
(parallel/mesh.py). The transformer stretch family, however, has the
standard two shardable matmul pairs per block, so this module adds the
TPU-idiomatic 2D-mesh recipe for scaling it: pick a Mesh(('data',
'model')), annotate the param tree with PartitionSpecs, and let XLA's SPMD
partitioner insert the collectives — no hand-written communication.

Sharding layout (the Megatron column/row pairing):

* ``qkv.w [D, 3D]``      -> P(None, 'model')  — column-parallel. The fused
  output columns are laid out head-major ([D, H, 3, Dh], see
  models/transformer.py:_init_block), so a 'model' shard owns whole heads
  and computes its q, k AND v locally; attention itself is then
  embarrassingly parallel over heads.
* ``attn_out.w [D, D]``  -> P('model', None)  — row-parallel; the partial
  products psum once per block (the only attention collective).
* ``ff1.w [D, F]``       -> P(None, 'model'), ``ff2.w [F, D]`` ->
  P('model', None) — same column/row pairing around the gelu; one psum.
* biases of column-parallel layers shard with their columns; row-parallel
  biases, LayerNorms, embeddings, positions and the tiny heads
  (mu/logvar/out: V~26, z~100) are replicated.

Everything non-transformer in the tree (embedding, classifier, GRU/deconv
legs, flow) is replicated — TP composes with the batch ('data') axis,
which carries the gradient psum exactly as in parallel/mesh.py.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh_2d(dp, tp, devices=None):
    """Mesh of shape (dp, tp) with axes ('data', 'model').

    The 'model' axis is the fastest-varying one so TP collectives ride
    neighbouring devices (ICI) while DP gradient psums span the slower
    axis — the standard layout from the scaling playbook."""
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]).reshape(dp, tp), ("data", "model"))


def get_mesh_3d(dp, pp, tp, devices=None):
    """Mesh of shape (dp, pp, tp) with axes ('data', 'pipe', 'model').

    Full 3D composition for the transformer family: GPipe stages over
    'pipe' (parallel/pp.py — manual shard_map over that axis only),
    Megatron block sharding over 'model' (this module — pure GSPMD
    specs), gradient psum over 'data'. Axis order follows the scaling
    playbook: 'model' fastest-varying (per-block TP psums ride
    neighbouring ICI links), 'pipe' next (one hop per stage hand-off),
    'data' slowest (gradient psum once per step)."""
    devices = devices if devices is not None else jax.devices()
    n = dp * pp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]).reshape(dp, pp, tp),
                ("data", "pipe", "model"))


# path-suffix -> (weight spec, bias spec); applied inside transformer
# 'blocks' lists only
_COL = (P(None, "model"), P("model"))
_ROW = (P("model", None), P())
_BLOCK_SPECS = {"qkv": _COL, "ff1": _COL, "attn_out": _ROW, "ff2": _ROW}


def transformer_param_specs(params, n_heads=4, tp=1):
    """PartitionSpec pytree matching ``params`` (same treedef).

    Only leaves under a transformer block list (``.../blocks/<i>/<name>``)
    get sharded specs; everything else is replicated. ``n_heads``/``tp``
    are validated so a mis-sized mesh fails loudly instead of silently
    resharding mid-block."""
    assert tp >= 1 and n_heads % tp == 0, (
        f"tensor-parallel degree {tp} must divide n_heads {n_heads}")

    def spec_for(path):
        keys = [getattr(e, "key", getattr(e, "idx", None)) for e in path]
        if "blocks" in keys:
            name, leaf = keys[-2], keys[-1]
            pair = _BLOCK_SPECS.get(name)
            if pair is not None:
                return pair[0] if leaf == "w" else pair[1]
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, _: spec_for(path), params)


def shard_tp(mesh, tree, specs):
    """Commit a pytree onto the mesh under the given spec tree."""
    return jax.device_put(
        tree, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                           is_leaf=lambda x: isinstance(x, P)))


def _opt_state_specs(opt_state, param_specs):
    """Spec tree with opt_state's structure: any subtree whose treedef
    equals the params' (optax moment accumulators like adam's mu/nu) gets
    the param specs; every other leaf (counts, empty states) replicates."""
    params_td = jax.tree_util.tree_structure(
        param_specs, is_leaf=lambda x: isinstance(x, P))

    def rec(node):
        try:
            if jax.tree_util.tree_structure(node) == params_td:
                return param_specs
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[rec(c) for c in node])
        if isinstance(node, tuple):
            return tuple(rec(c) for c in node)
        if isinstance(node, list):
            return [rec(c) for c in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return P()

    return rec(opt_state)


def validate_tp_divisibility(model, tp):
    """FF hidden and head count must divide over the model axis."""
    for args in (model.enc_tfm_args, model.dec_tfm_args):
        if not args:
            continue
        assert args.get("n_heads", 4) % tp == 0, (
            f"n_heads {args.get('n_heads', 4)} not divisible by tp={tp}")
        assert args.get("d_ff", 256) % tp == 0, (
            f"d_ff {args.get('d_ff', 256)} not divisible by tp={tp}")


def make_tp_train_step(model, cfgv, cfg_losses, rf_basis, mesh,
                       donate=True):
    """Phase-1 train step over a ('data', 'model') mesh: batch sharded on
    'data', transformer block weights sharded on 'model' per the module
    docstring, everything else replicated. Gradients reduce over 'data'
    (psum) and the block-internal partial sums reduce over 'model' — both
    inserted by GSPMD from the input shardings alone; the step body is
    IDENTICAL to the single-device one (train_vae.make_loss_fn), so
    trajectories match the unsharded step up to float reduction order.

    Returns (train_step, optimizer, init_state) where
    init_state(params) -> (sharded params, sharded opt_state). Inputs to
    train_step must be committed via init_state / shard_batch — the jit
    follows the argument shardings rather than pinning in_shardings, so
    the same compiled step also serves pure-DP meshes (tp=1).
    """
    import jax.numpy as jnp
    import optax
    from functools import partial

    from ..train.train_vae import make_loss_fn
    from ..utils.annealing import anneal

    tp = mesh.shape.get("model", 1)
    validate_tp_divisibility(model, tp)

    optimizer = optax.chain(
        optax.clip_by_global_norm(cfgv.clip_grad),
        optax.adam(cfgv.lr))
    beta_sched = cfgv.beta
    loss_fn = make_loss_fn(model, cfgv, cfg_losses.wae_mmd, rf_basis)

    n_heads = (model.dec_tfm_args or model.enc_tfm_args).get("n_heads", 4)

    def init_state(params, opt_state=None):
        """Commit (params, opt_state) onto the mesh under the TP specs.
        opt_state=None initializes fresh moments; pass a loaded state
        (checkpoint resume) to shard it instead."""
        specs = transformer_param_specs(params, n_heads=n_heads, tp=tp)
        sharded = shard_tp(mesh, params, specs)
        # adam moments are zeros_like(params) with NO dataflow from the
        # inputs, so GSPMD cannot propagate shardings into them — commit
        # them explicitly under the param specs
        if opt_state is None:
            opt_state = optimizer.init(params)
        opt_state = shard_tp(mesh, opt_state,
                             _opt_state_specs(opt_state, specs))
        return sharded, opt_state

    batch_sh = NamedSharding(mesh, P("data"))

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, key, text, it):
        text = jax.lax.with_sharding_constraint(text, batch_sh)
        beta = anneal(beta_sched, it.astype(jnp.float32))
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, key, text, beta)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["beta"] = beta
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, optimizer, init_state


def make_tp_full_step(model, cfgf, cfg_losses, rf_basis, mesh, donate=True):
    """Phase-2 (three sub-update) step over a mesh with a 'model' axis:
    same Megatron layout as make_tp_train_step, same iteration body as
    train_full.make_full_step — the three Adam states each get the
    param-spec'd moment sharding via the generic _opt_state_specs, so the
    composition costs no phase-specific communication code. Works on the
    2D ('data', 'model') and 3D ('data', 'pipe', 'model') meshes alike
    (pass a make_pp_model-wrapped model for the latter).

    Returns (full_step, (opt_E, opt_G, opt_C), init_state) where
    init_state(params, opt_states=None) -> (sharded params, sharded
    (oE, oG, oC))."""
    from functools import partial

    from ..train.train_full import make_full_step

    tp = mesh.shape.get("model", 1)
    validate_tp_divisibility(model, tp)
    _, opts, one_iter = make_full_step(model, cfgf, cfg_losses, rf_basis,
                                       donate=False)
    n_heads = (model.dec_tfm_args or model.enc_tfm_args).get("n_heads", 4)

    def init_state(params, opt_states=None):
        specs = transformer_param_specs(params, n_heads=n_heads, tp=tp)
        sharded = shard_tp(mesh, params, specs)
        if opt_states is None:
            opt_states = tuple(o.init(params) for o in opts)
        opt_states = tuple(
            shard_tp(mesh, o, _opt_state_specs(o, specs))
            for o in opt_states)
        return sharded, opt_states

    batch_sh = NamedSharding(mesh, P("data"))

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3) if donate else ())
    def full_step(params, oE, oG, oC, key, text, lab_text, lab_y, it):
        text = jax.lax.with_sharding_constraint(text, batch_sh)
        lab_text = jax.lax.with_sharding_constraint(lab_text, batch_sh)
        lab_y = jax.lax.with_sharding_constraint(lab_y, batch_sh)
        return one_iter(params, oE, oG, oC, key, text, lab_text, lab_y, it)

    return full_step, opts, init_state
