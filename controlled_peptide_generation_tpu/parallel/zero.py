"""ZeRO-1 optimizer-state sharding over the data axis.

The reference is single-device (SURVEY.md §2.28, reference main.py:39) and
at its scale (~0.5M params) optimizer memory is irrelevant; this module
completes the memory side of the scaling vocabulary (alongside DP/TP/PP,
parallel/{mesh,tp,pp}.py) for larger configs of the same model families:
Adam's mu/nu moments are partitioned 1/N over the mesh's 'data' axis
instead of replicated, the TPU-idiomatic form of ZeRO stage 1
(Rajbhandari et al. 2020) — and, as everywhere in this framework, the
partitioning is expressed as GSPMD sharding constraints, not hand-written
collectives:

* params and batch flow exactly as in parallel.make_dp_train_step
  (params replicated, batch sharded, gradient reduction = psum);
* gradients are then CONSTRAINED to the moment shardings before the
  optimizer update, so XLA materialises each device's 1/N gradient shard
  (fusing the reduce with the slice where profitable), runs the
  elementwise Adam math on shards, and keeps mu/nu sharded across steps;
* the updated params are constrained back to replicated — one all_gather
  of the update shards per step, the classic ZeRO-1 exchange.

Each param leaf is sharded along its first axis divisible by the mesh's
data size (most leaves' axis 0); indivisible leaves stay replicated —
with biases and LayerNorms that is a few KB, not worth padded sharding.
The step is trajectory-identical to plain DP up to float reduction order
(test_zero.py asserts parity against the single-device step).
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .tp import _opt_state_specs, shard_tp


def zero_param_specs(params, n_shards, axis="data"):
    """Spec tree sharding each leaf on its first n_shards-divisible dim."""
    def spec(leaf):
        for d, s in enumerate(getattr(leaf, "shape", ())):
            if s >= n_shards and s % n_shards == 0:
                return P(*([None] * d + [axis]))
        return P()

    return jax.tree.map(spec, params)


def make_zero_train_step(model, cfgv, cfg_losses, rf_basis, mesh,
                         axis="data", donate=True):
    """Phase-1 DP train step with ZeRO-1 sharded optimizer state.

    Returns (train_step, optimizer, init_state) with the same signature
    contract as parallel.make_tp_train_step: commit state through
    init_state(params, opt_state=None) and feed batches through
    shard_batch; the jit follows the argument shardings."""
    from ..train.train_vae import make_loss_fn
    from ..utils.annealing import anneal

    n = mesh.shape[axis]
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfgv.clip_grad),
        optax.adam(cfgv.lr))
    loss_fn = make_loss_fn(model, cfgv, cfg_losses.wae_mmd, rf_basis)
    beta_sched = cfgv.beta

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))

    def grad_shardings(params):
        specs = zero_param_specs(params, n, axis)
        return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                            is_leaf=lambda x: isinstance(x, P))

    def init_state(params, opt_state=None):
        """Replicate params; commit (or re-commit) moments ZeRO-sharded."""
        specs = zero_param_specs(params, n, axis)
        if opt_state is None:
            opt_state = optimizer.init(params)
        opt_state = shard_tp(mesh, opt_state,
                             _opt_state_specs(opt_state, specs))
        params = jax.device_put(params, repl)
        return params, opt_state

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, key, text, it):
        text = jax.lax.with_sharding_constraint(text, batch_sh)
        beta = anneal(beta_sched, it.astype(jnp.float32))
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, key, text, beta)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["beta"] = beta
        # ZeRO point: materialise 1/N gradient shards; Adam then runs on
        # shards and the moments stay sharded step to step
        grads = jax.lax.with_sharding_constraint(grads,
                                                 grad_shardings(grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # one all_gather of the update shards: params back to replicated
        params = jax.lax.with_sharding_constraint(params, repl)
        return params, opt_state, metrics

    return train_step, optimizer, init_state
