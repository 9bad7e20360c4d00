"""Multi-device execution: data-parallel training + sharded CLaSS fan-out.

The reference is strictly single-device (SURVEY.md §2.28: one cuda:0-or-cpu
torch.device, no distributed backend of any kind); scale-out here is the
TPU-idiomatic replacement: a jax.sharding.Mesh over the batch axis, jit with
NamedSharding constraints, and XLA inserting the gradient psum over ICI.
Multi-host extends the same code via jax.distributed.initialize — no custom
communication backend exists or is needed.

Model size (~0.5M params) makes tensor/pipeline parallelism counter-
productive for the GRU family; DP for training and embarrassingly-parallel
sharding for CLaSS rejection rounds are its two meaningful axes. The
transformer stretch family additionally supports Megatron-style tensor
parallelism over a (data, model) mesh (parallel/tp.py) and GPipe pipeline
parallelism over a ('pipe',) or hybrid ('data', 'pipe') mesh
(parallel/pp.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import losses as L
from ..utils.annealing import anneal


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host (DCN) initialization hook: jax.distributed.initialize.

    On a multi-host TPU slice, call this once per process before building
    meshes; jax.devices() then spans all hosts and the same DP code runs
    with gradient psums over ICI within a slice and DCN across slices. On
    single-host setups it is a no-op. No custom communication backend
    exists or is needed (SURVEY.md §5.8)."""
    import jax

    if num_processes in (None, 0, 1):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def get_mesh(n_devices=None, axis="data", devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]), (axis,))


def replicate(mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh, batch, axis="data"):
    """Shard array leading axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)


def make_dp_train_step(model, cfgv, cfg_losses, rf_basis, mesh,
                       axis="data", donate=True):
    """Data-parallel version of train.make_train_step: batch sharded over
    the mesh axis, params/optimizer state replicated, gradient reduction
    compiled to an XLA psum over ICI."""
    from ..train.train_vae import make_loss_fn
    from ..train.opt import make_optimizer

    # shared builder: follows hw.flat_optimizer like the 1-device step
    optimizer = make_optimizer(cfgv)
    beta_sched = cfgv.beta

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))

    # the shared phase-1 objective; under the batch sharding the z-coupled
    # MMD terms see the GLOBAL batch (XLA all-gathers z — 100-dim rows,
    # negligible ICI traffic) and the gradient reduction compiles to a psum
    loss_fn = make_loss_fn(model, cfgv, cfg_losses.wae_mmd, rf_basis)

    @partial(jax.jit,
             in_shardings=(repl, repl, repl, batch_sh, repl),
             out_shardings=(repl, repl, repl),
             donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, key, text, it):
        beta = anneal(beta_sched, it.astype(jnp.float32))
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, key, text, beta)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["beta"] = beta
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, optimizer


def make_dp_train_scan(model, cfgv, cfg_losses, rf_basis, mesh, unroll,
                       axis="data", donate=True):
    """``unroll`` data-parallel optimizer steps in ONE jitted program:
    the batch stack [unroll, B, T] is sharded over the mesh on the batch
    axis, the scan carries replicated params/opt state, and each inner
    step's gradient reduction is the same XLA psum as make_dp_train_step.
    RNG streams match the step-by-step DP path (fold_in(key, it))."""
    step_fn, optimizer = make_dp_train_step(model, cfgv, cfg_losses,
                                            rf_basis, mesh, axis=axis,
                                            donate=False)
    # re-derive the un-jitted single-step body: jit-of-jit is fine in jax
    # (inner jit inlines), so reuse step_fn directly inside the scan

    repl = NamedSharding(mesh, P())
    stack_sh = NamedSharding(mesh, P(None, axis))

    @partial(jax.jit,
             in_shardings=(repl, repl, repl, stack_sh, repl),
             out_shardings=(repl, repl, repl),
             donate_argnums=(0, 1) if donate else ())
    def train_chunk(params, opt_state, key, texts, it0):
        def body(carry, inp):
            params, opt_state = carry
            text, i = inp
            it = it0 + i
            params, opt_state, metrics = step_fn(
                params, opt_state, jax.random.fold_in(key, it), text, it)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state),
            (texts, jnp.arange(unroll, dtype=jnp.int32)))
        last = jax.tree.map(lambda m: m[-1], metrics)
        return params, opt_state, last

    return train_chunk, optimizer


def make_dp_full_step(model, cfgf, cfg_losses, rf_basis, mesh,
                      axis="data", donate=True):
    """Data-parallel phase-2 (controlled-generation) iteration: the same
    three sub-updates as train_full.make_full_step, with both minibatches
    (unlabeled text + labeled rows) sharded over the mesh and each
    sub-update's gradient reduction compiled to an XLA psum. The
    generator-attribute stage's prior samples are global arrays, so every
    sampled sentence matches the single-device iteration bit for bit."""
    from ..train.train_full import make_full_step

    _, opts, one_iter = make_full_step(model, cfgf, cfg_losses, rf_basis,
                                       donate=False)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))

    full_step = partial(
        jax.jit,
        in_shardings=(repl, repl, repl, repl, repl,
                      batch_sh, batch_sh, batch_sh, repl),
        out_shardings=(repl,) * 5,
        donate_argnums=(0, 1, 2, 3) if donate else ())(one_iter)
    return full_step, opts, one_iter


def make_dp_full_scan(model, cfgf, cfg_losses, rf_basis, mesh, unroll,
                      axis="data", donate=True):
    """``unroll`` data-parallel phase-2 iterations in ONE jitted program
    (batch stacks sharded P(None, axis); RNG streams identical to the
    step-by-step DP path)."""
    _, opts, one_iter = make_dp_full_step(model, cfgf, cfg_losses,
                                          rf_basis, mesh, axis=axis,
                                          donate=False)
    repl = NamedSharding(mesh, P())
    stack_sh = NamedSharding(mesh, P(None, axis))

    @partial(jax.jit,
             in_shardings=(repl, repl, repl, repl, repl,
                           stack_sh, stack_sh, stack_sh, repl),
             out_shardings=(repl,) * 5,
             donate_argnums=(0, 1, 2, 3) if donate else ())
    def full_chunk(params, oE, oG, oC, key, texts, lab_texts, lab_ys, it0):
        def body(carry, inp):
            params, oE, oG, oC = carry
            text, lab_text, lab_y, i = inp
            it = it0 + i
            params, oE, oG, oC, metrics = one_iter(
                params, oE, oG, oC, jax.random.fold_in(key, it),
                text, lab_text, lab_y, it)
            return (params, oE, oG, oC), metrics

        (params, oE, oG, oC), metrics = jax.lax.scan(
            body, (params, oE, oG, oC),
            (texts, lab_texts, lab_ys,
             jnp.arange(unroll, dtype=jnp.int32)))
        last = jax.tree.map(lambda m: m[-1], metrics)
        return params, oE, oG, oC, last

    return full_chunk, opts


# (id(mesh), id(model), kind, n, ...) -> (jitted fn, mesh, model).
# The value holds STRONG references to the mesh and model whose ids are in
# the key: ids are only reusable after their object is garbage-collected,
# so pinning the objects for the cache entry's lifetime makes id collisions
# (a stale fn closed over a dead mesh's shardings) impossible, including in
# long-lived services that rebuild meshes/models.
_dp_round_cache = {}


def dp_fused_round(mesh, model, params, key, Q, n, beam_size=5,
                   axis="data", decode_dtype="bfloat16", prefix="clfZ",
                   capacity=None, beam_chunk=None):
    """Whole CLaSS round — GMM draw, classifier heads, accept test,
    c-prior and full-batch beam decode — as ONE program sharded over the
    mesh batch axis. Each device owns n/D candidates end to end (the round
    is embarrassingly parallel until the host-side dedup), so throughput
    scales with the mesh; params are replicated and no collectives are
    needed inside the round.

    capacity=K enables accepted-only decode (latent/fused.py): the global
    accepted-first compaction is the only cross-device step (XLA lowers the
    [n]-bool argsort + [K]-row gather to ICI collectives, negligible next
    to the K-batch beam decode sharded over the mesh). Results are
    bit-identical to the single-device compact round; the return grows to
    (z, scores, accept, tokens, idx, valid) as in fused_round."""
    from ..latent.fused import _round_body

    n_dev = mesh.devices.size
    assert n % n_dev == 0, f"round size {n} must divide over {n_dev} devices"
    if capacity is not None:
        assert capacity % n_dev == 0, (
            f"decode capacity {capacity} must divide over {n_dev} devices")
    names = sorted(Q.attr_clfs)
    clf_w = jnp.stack([Q.attr_clfs[a].w for a in names])
    clf_b = jnp.stack([Q.attr_clfs[a].b for a in names])
    targets = jnp.array([Q.clf_targets[a] for a in names])
    kind, q_params = Q._sampler()

    cache_key = (id(mesh), id(model), kind, n, beam_size, decode_dtype,
                 axis, capacity, beam_chunk)
    entry = _dp_round_cache.get(cache_key)
    fn = entry[0] if entry is not None else None
    if fn is None:
        repl = NamedSharding(mesh, P())
        out_sh = NamedSharding(mesh, P(axis))

        def body(params, key, q_params, cw, cb, tg):
            return _round_body(model, params, key, kind, q_params, cw, cb,
                               tg, n, beam_size=beam_size,
                               decode_dtype=decode_dtype,
                               capacity=capacity, beam_chunk=beam_chunk)

        n_out = 6 if capacity is None else 8
        fn = jax.jit(body,
                     in_shardings=(repl, repl, repl, repl, repl, repl),
                     out_shardings=(out_sh,) * n_out)
        _dp_round_cache[cache_key] = (fn, mesh, model)
    out = fn(params, key, q_params, clf_w, clf_b, targets)
    z, c, probs, accum, accept, tokens = out[:6]
    scores = {f"{prefix}_prob_accum": accum}
    for i, a in enumerate(names):
        scores[f"{prefix}_{a}={Q.clf_targets[a]}"] = probs[:, i]
    if capacity is None:
        return z, scores, accept, tokens
    return z, scores, accept, tokens, out[6], out[7]


def dp_rejection_round(mesh, sampler, clf_w, clf_b, targets, key, n,
                       axis="data"):
    """CLaSS rejection round sharded across the mesh: each device draws and
    scores n/D candidates; outputs stay device-sharded for chained use."""
    from ..latent import gmm as gmm_mod

    kind, q_params = sampler
    cov_type = kind.split("_", 1)[1]
    n_dev = mesh.devices.size
    assert n % n_dev == 0, f"round size {n} must divide over {n_dev} devices"

    repl = NamedSharding(mesh, P())
    out_sh = NamedSharding(mesh, P(axis))

    @partial(jax.jit,
             in_shardings=(repl, repl, repl, repl, repl),
             out_shardings=(out_sh, out_sh, out_sh, out_sh),
             static_argnums=(5,))
    def round_fn(key, q, cw, cb, tg, n_static):
        kz, ku = jax.random.split(key)
        z = gmm_mod.sample(kz, q, n_static, cov_type)
        z = jax.lax.with_sharding_constraint(z, out_sh)
        p1 = jax.nn.sigmoid(z @ cw.T + cb[None, :])
        probs = jnp.where(tg[None, :] == 1, p1, 1.0 - p1)
        accum = jnp.prod(probs, axis=1)
        accept = jax.random.uniform(ku, (n_static,)) < accum
        return z, probs, accum, accept

    return round_fn(key, q_params, clf_w, clf_b, targets, n)
