"""Phase-1 WAE/VAE training: one jitted XLA program per step.

Reference loop: train_vae.py:13-68 — Adam over the autoencoder params,
linearly annealed beta, loss = recon + beta*z_regu + lambda1*|logvar|_1 +
lambda2*KL_sharedmu, global-norm grad clip 5.0; kl/mmd/mmdrf all computed
every step (the reference logs all three regardless of which regularizes).

TPU-first structure: forward + all losses + grads + clip + adam fuse into a
single donated jit; the host touches device data only at log boundaries.
The weighted-multinomial batch sampling stays on host (numpy), overlapping
with device compute through jax's async dispatch.
"""

import logging
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import losses as L
from ..utils.annealing import anneal
from ..utils import logging as tblog
from ..generation import generate_sentences
from . import checkpoints
from .opt import make_optimizer  # noqa: F401  (re-export; impl in opt.py)

log = logging.getLogger(__name__)


def make_loss_fn(model, cfgv, mmd_cfg, rf_basis):
    """The phase-1 objective, shared by the single-device step/scan and the
    DP builders (parallel/mesh.py) so all paths stay trajectory-identical.

    Plain path (model.flow == 0): forward with q_c='prior', z_regu from
    cfgv.z_regu_loss (kl | mmd | mmdrf). Flow path (model.flow > 0 and
    flow_mode='posterior'): decode from z_K = flow(z0) and the 'kl' regu
    becomes the MC flow-posterior KL (losses.kl_flow_mc) — the training
    mode the reference shipped switches for but never released."""
    z_regu_name = cfgv.z_regu_loss
    use_flow = model.flow > 0
    if use_flow:
        assert getattr(model, "flow_mode", "gen_prior") == "posterior", (
            "training with a flow requires model.flow_mode='posterior' "
            "(gen_prior matches the reference, whose forward raises during "
            "training, model.py:173-177)")

    def loss_fn(params, key, text, beta):
        k_fwd, k_mmd, k_rf, k_basis = jax.random.split(key, 4)
        if use_flow:
            kz, kc, kd, ke = jax.random.split(k_fwd, 4)
            mu, logvar = model.encode(params, text, key=ke, train=True)
            z0 = model.sample_z(kz, mu, logvar)
            z, logdet = model.apply_flow(params, z0)
            c = model.sample_c_prior(kc, text.shape[0])
            dec_logits = model.decode_train(params, kd, text, z, c,
                                            train=True)
            kl = L.kl_flow_mc(mu, logvar, z0, z, logdet)
        else:
            (mu, logvar), (z, c), dec_logits = model.forward(
                params, k_fwd, text, q_c="prior", sample_z=1, train=True)
            kl = L.kl_gaussianprior(mu, logvar)
        recon = L.recon_dec(text, dec_logits)
        mmd = L.wae_mmd_gaussianprior_full(k_mmd, z, mmd_cfg.sigma,
                                           mmd_cfg.kernel)
        if rf_basis is None:
            rf_w, rf_b = L.init_rf_basis(k_basis, model.z_dim,
                                         mmd_cfg.rf_dim)
        else:
            rf_w, rf_b = rf_basis
        mmdrf = L.wae_mmd_gaussianprior_rf(k_rf, z, rf_w, rf_b,
                                           mmd_cfg.sigma)
        z_regu = {"kl": kl, "mmd": mmd, "mmdrf": mmdrf}[z_regu_name]
        z_logvar_L1 = jnp.mean(jnp.sum(jnp.abs(logvar), axis=1))
        z_logvar_KL_penalty = L.kl_gaussian_sharedmu(mu, logvar)
        loss = (recon + beta * z_regu
                + cfgv.lambda_logvar_L1 * z_logvar_L1
                + cfgv.lambda_logvar_KL * z_logvar_KL_penalty)
        metrics = {
            "z_mu_L1": jnp.mean(jnp.abs(mu)),
            "z_logvar": jnp.mean(logvar),
            "z_logvar_L1": z_logvar_L1,
            "z_logvar_KL_penalty": z_logvar_KL_penalty,
            "L_vae": loss,
            "L_vae_recon": recon,
            "L_vae_kl": kl,
            "L_wae_mmd": mmd,
            "L_wae_mmdrf": mmdrf,
        }
        return loss, metrics

    return loss_fn


def make_train_step(model, cfgv, cfg_losses, rf_basis, donate=True):
    """Build the jitted train step.

    rf_basis: (rf_w, rf_b) fixed random-feature basis, or None to resample
    from the per-step key (cfg.losses.wae_mmd.rf_resample).
    """
    optimizer = make_optimizer(cfgv)
    beta_sched = cfgv.beta
    loss_fn = make_loss_fn(model, cfgv, cfg_losses.wae_mmd, rf_basis)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
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


def make_train_scan(model, cfgv, cfg_losses, rf_basis, unroll, donate=True):
    """Multi-step train chunk: ``unroll`` optimizer steps inside ONE jitted
    program (lax.scan over pre-staged batches). Removes per-step dispatch
    latency — the dominant cost on a remote/tunneled TPU — while computing
    exactly the same updates as ``unroll`` calls of make_train_step."""
    assert rf_basis is not None, (
        "train scan requires a fixed RF basis (rf_resample=False)")
    optimizer = make_optimizer(cfgv)
    beta_sched = cfgv.beta
    # same loss (and key-split structure) as make_train_step, so the
    # unrolled and step-by-step paths produce the SAME trajectories
    loss_fn = make_loss_fn(model, cfgv, cfg_losses.wae_mmd, rf_basis)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_chunk(params, opt_state, key, texts, it0):
        """texts: [unroll, B, T]; runs steps it0 .. it0+unroll-1."""
        def body(carry, inp):
            params, opt_state = carry
            text, i = inp
            it = it0 + i
            beta = anneal(beta_sched, it.astype(jnp.float32))
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                params, jax.random.fold_in(key, it), text, beta)
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["beta"] = beta
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state),
            (texts, jnp.arange(unroll, dtype=jnp.int32)))
        last = jax.tree.map(lambda m: m[-1], metrics)
        return params, opt_state, last

    return train_chunk, optimizer


def aligned_unroll(unroll, *cadences):
    """Largest chunk width <= unroll that divides every log cadence.

    A chunk straddling a boundary forces per-step dispatch, but clamping
    to gcd(unroll, cadences) over-shrinks (e.g. unroll 64 with cadence
    500 -> 4); the largest divisor of the cadences' gcd that still fits
    (-> 50) keeps chunks big AND aligned."""
    import math
    g = math.gcd(*cadences)
    for d in range(min(unroll, g), 0, -1):
        if g % d == 0:
            return d
    return 1


# id(model) -> (jitted fn, model); the value pins the model so the id key
# cannot be reused by a new object after GC (same policy as
# parallel/mesh._dp_round_cache)
_heldout_fns = {}


def _heldout_fn(model):
    """Per-model cached jitted heldout evaluator over a STACK of batches.

    All n_batches evaluate inside one program (vmap over the stack) and the
    caller fetches every output in one transfer — per-batch dispatch with
    float() syncs cost ~0.1-0.3s each through a tunneled device, which made
    each checkpoint boundary ~5s (measured; BENCH.md)."""
    entry = _heldout_fns.get(id(model))
    if entry is None:
        use_flow = (model.flow > 0
                    and getattr(model, "flow_mode", "") == "posterior")

        def one(params, key, text):
            if use_flow:
                kz, kc, kd = jax.random.split(key, 3)
                mu, lv = model.encode(params, text)
                z0 = model.sample_z(kz, mu, lv)
                z, logdet = model.apply_flow(params, z0)
                c = model.sample_c_prior(kc, text.shape[0])
                logits = model.decode_train(params, kd, text, z, c,
                                            train=False)
                return (L.recon_dec(text, logits),
                        L.kl_flow_mc(mu, lv, z0, z, logdet), mu, lv)
            (mu, lv), _, logits = model.forward(
                params, key, text, q_c="prior", sample_z=1, train=False)
            return (L.recon_dec(text, logits), L.kl_gaussianprior(mu, lv),
                    mu, lv)

        @jax.jit
        def fn(params, keys, texts):
            """keys: [n, 2] PRNG keys, texts: [n, B, T]."""
            return jax.vmap(lambda k, t: one(params, k, t))(keys, texts)

        entry = (fn, model)
        _heldout_fns[id(model)] = entry
    return entry[0]


def evaluate_heldout(model, params, dataset, key, n_batches=4,
                     iterator="hld_vae"):
    """Mean heldout recon/KL over a few val batches — the expensive-eval
    hook the reference's train loop truncates (train_vae.py:64-68)."""
    if iterator not in getattr(dataset, "_iters", {}):
        return None
    fn = _heldout_fn(model)
    batches = [dataset.next_batch(iterator).text
               for _ in range(n_batches)]
    keys = [jax.random.fold_in(key, i) for i in range(n_batches)]
    if len({b.shape for b in batches}) == 1:
        # one dispatch, one transfer (see _heldout_fn)
        recons, kls, mus, lvs = jax.device_get(
            fn(params, jnp.stack(keys), jnp.asarray(np.stack(batches))))
        mus, lvs = mus.reshape(-1, mus.shape[-1]), lvs.reshape(-1,
                                                               lvs.shape[-1])
    else:
        # ragged epoch-tail batches (non-weighted iterators): singleton
        # stacks through the same program per shape
        outs = [jax.device_get(fn(params, k[None], jnp.asarray(b[None])))
                for k, b in zip(keys, batches)]
        recons = np.array([o[0][0] for o in outs])
        kls = np.array([o[1][0] for o in outs])
        mus = np.concatenate([o[2][0] for o in outs])
        lvs = np.concatenate([o[3][0] for o in outs])
    # Frobenius(Cov_q(z), I) over the pooled heldout encodings — the
    # posterior-vs-prior covariance health metric (reference computed it
    # only offline, vis/scripts/covar.py:98-102)
    from ..vis.covar import cov_q, frobenius_to_identity
    C, _, _ = cov_q(mus, lvs)
    return {"recon": float(np.mean(recons)), "kl": float(np.mean(kls)),
            "cov_frob": frobenius_to_identity(C)}


def train_vae(cfg, model, dataset, params, logger=None, on_checkpoint=None):
    """Run the phase-1 loop. Returns (params, opt_state, steps_per_sec)."""
    cfgv = cfg.vae
    key = jax.random.PRNGKey(cfg.seed)
    k_rf, k_steps = jax.random.split(key)

    rf_basis = None
    if not cfg.losses.wae_mmd.rf_resample:
        rf_basis = L.init_rf_basis(k_rf, model.z_dim,
                                   cfg.losses.wae_mmd.rf_dim)

    # parallelism over a device mesh: hw.dp (any family; 0 = all devices),
    # hw.tp (transformer, Megatron over a (data, model) mesh), hw.pp
    # (transformer, GPipe over a (data, pipe) mesh). All three compose:
    # tp+pp together select the full 3D ('data', 'pipe', 'model') mesh
    n_dp = int(cfg.hw.get("dp", 1))
    if n_dp == 0:
        n_dp = len(jax.devices())
    n_tp = int(cfg.hw.get("tp", 1) or 1)
    n_pp = int(cfg.hw.get("pp", 1) or 1)
    mesh = None
    tp_init_state = None
    if n_tp > 1:
        from .. import parallel
        dp_eff = max(n_dp, 1)
        assert cfgv.batch_size % dp_eff == 0, (
            f"batch_size {cfgv.batch_size} must divide over {dp_eff} "
            f"data-parallel devices")
        if n_pp > 1:
            # 3D: GPipe stages over 'pipe' (manual shard_map) + Megatron
            # specs over 'model' + batch/grad-psum over 'data' — the PP
            # model drops into the TP step unchanged because shard_map is
            # manual over 'pipe' ONLY, leaving 'model' and 'data' to GSPMD
            mesh = parallel.get_mesh_3d(dp_eff, n_pp, n_tp)
            model = parallel.make_pp_model(model, mesh)
        else:
            mesh = parallel.get_mesh_2d(dp_eff, n_tp)
        train_step, optimizer, tp_init_state = parallel.make_tp_train_step(
            model, cfgv, cfg.losses, rf_basis, mesh,
            donate=cfg.hw.donate_state)
        log.info("tensor-parallel training: (data=%d%s, model=%d) mesh",
                 dp_eff, f", pipe={n_pp}" if n_pp > 1 else "", n_tp)
    elif n_pp > 1:
        from .. import parallel
        pipe_mesh = parallel.get_mesh_pipe(n_pp,
                                           dp=n_dp if n_dp > 1 else 1)
        model = parallel.make_pp_model(model, pipe_mesh)
        if n_dp > 1:
            assert cfgv.batch_size % n_dp == 0, (
                f"batch_size {cfgv.batch_size} must divide over {n_dp} "
                f"devices")
            mesh = pipe_mesh
            train_step, optimizer = parallel.make_dp_train_step(
                model, cfgv, cfg.losses, rf_basis, mesh,
                donate=cfg.hw.donate_state)
        else:
            train_step, optimizer = make_train_step(
                model, cfgv, cfg.losses, rf_basis,
                donate=cfg.hw.donate_state)
        log.info("pipeline-parallel training: pp=%d, dp=%d", n_pp,
                 max(n_dp, 1))
    elif n_dp > 1:
        from .. import parallel
        assert cfgv.batch_size % n_dp == 0, (
            f"batch_size {cfgv.batch_size} must divide over {n_dp} devices")
        mesh = parallel.get_mesh(n_dp, cfg.hw.get("mesh_axis", "data"))
        # rf_basis=None (rf_resample) flows through: make_loss_fn then
        # resamples the basis per step, same objective as dp=1
        if cfg.hw.get("zero", False):
            # ZeRO-1: Adam moments sharded 1/dp; same init_state contract
            # as the TP step, so it rides the tp_init_state plumbing
            train_step, optimizer, tp_init_state = \
                parallel.make_zero_train_step(
                    model, cfgv, cfg.losses, rf_basis, mesh,
                    axis=cfg.hw.get("mesh_axis", "data"),
                    donate=cfg.hw.donate_state)
            log.info("data-parallel training over %d devices "
                     "(ZeRO-1 sharded optimizer state)", n_dp)
        else:
            train_step, optimizer = parallel.make_dp_train_step(
                model, cfgv, cfg.losses, rf_basis, mesh,
                donate=cfg.hw.donate_state)
            log.info("data-parallel training over %d devices", n_dp)
    else:
        train_step, optimizer = make_train_step(
            model, cfgv, cfg.losses, rf_basis, donate=cfg.hw.donate_state)
    opt_state = optimizer.init(params)

    # resume full train state (incl. Adam moments) when a checkpoint exists
    if cfg.loadpath:
        state_tpl = {"params": params, "opt": opt_state}
        state = checkpoints.load(cfg.loadpath, state_tpl, strict=False)
        params, opt_state = state["params"], state["opt"]
        log.info("Loaded train state from %s", cfg.loadpath)
    if tp_init_state is not None:
        # commit under the Megatron PartitionSpecs (loaded moments kept)
        params, opt_state = tp_init_state(params, opt_state)
    elif mesh is not None:
        from .. import parallel
        params = parallel.replicate(mesh, params)
        opt_state = parallel.replicate(mesh, opt_state)

    def place_batch(text):
        if mesh is None:
            return jnp.asarray(text)
        from .. import parallel
        return parallel.shard_batch(mesh, jnp.asarray(text),
                                    cfg.hw.get("mesh_axis", "data"))

    # multi-step unroll: run `unroll` optimizer steps per device dispatch
    # between host/logging boundaries, clamped to stay boundary-aligned
    # (otherwise boundaries land mid-chunk and the loop silently falls
    # back to per-step dispatch for the whole run)
    unroll = aligned_unroll(int(cfg.hw.get("unroll", 1) or 1),
                            int(cfgv.cheaplog_every),
                            int(cfgv.expsvlog_every))
    if rf_basis is None:
        unroll = 1   # per-step basis resampling: no chunking
    if tp_init_state is not None:
        # no TP/ZeRO scan builder: the DP chunk's replicated in_shardings
        # would silently undo the Megatron/ZeRO partitioning
        unroll = 1
    if unroll > 1:
        if mesh is not None:
            from .. import parallel
            train_chunk, _ = parallel.make_dp_train_scan(
                model, cfgv, cfg.losses, rf_basis, mesh, unroll,
                axis=cfg.hw.get("mesh_axis", "data"),
                donate=cfg.hw.donate_state)
        else:
            train_chunk, _ = make_train_scan(model, cfgv, cfg.losses,
                                             rf_basis, unroll,
                                             donate=cfg.hw.donate_state)

    def place_chunk(texts):
        if mesh is None:
            return jnp.asarray(texts)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(None, cfg.hw.get("mesh_axis", "data")))
        return jax.device_put(jnp.asarray(texts), sh)

    def needs_host(j):
        """Step j requires host-side work (logging or checkpoint)."""
        return (j % cfgv.cheaplog_every == 0
                or j % cfgv.expsvlog_every == 0)

    logger = logger or tblog._default_logger
    t_start, it_start = time.time(), cfgv.s_iter
    log.info("Training base vae ...")
    import contextlib
    from ..utils.profiling import trace
    profile_stack = contextlib.ExitStack()
    profile_stack.enter_context(
        trace(cfg.hw.get("profile_dir", ""),
              enabled=bool(cfg.hw.get("profile_dir", ""))))
    # metric/sample fetches are DEFERRED and coalesced
    # (utils.logging.DeferredFetch): the boundary dispatches the log sample
    # asynchronously and queues the device metrics; host round trips happen
    # only once per flush
    def sink(p_it, vals, p_sent):
        if logger is not None:
            for k in ("z_mu_L1", "z_logvar", "z_logvar_L1",
                      "z_logvar_KL_penalty", "L_vae", "L_vae_recon",
                      "L_vae_kl", "L_wae_mmd", "L_wae_mmdrf", "beta"):
                logger.log_value("train_" + k, vals[k], p_it)
        log.info(
            "ITER %d TRAINING (phase 1). loss_vae: %.4f; loss_recon: "
            "%.4f; loss_kl: %.4f; loss_mmd: %.4f; Grad_norm: %.4e",
            p_it, vals["L_vae"], vals["L_vae_recon"], vals["L_vae_kl"],
            vals["L_wae_mmd"], vals["grad_norm"])
        log.info('Sample (cat T=1.0): "%s"',
                 dataset.idx2sentence(p_sent[0]))
        sys.stdout.flush()

    fetch = tblog.DeferredFetch(cfg.hw.get("log_flush_every", 10), sink)

    def do_host(it, metrics):
        cheap = it % cfgv.cheaplog_every == 0
        expsv = it % cfgv.expsvlog_every == 0
        if cheap or expsv:
            sent, _, _ = generate_sentences(
                model, params, jax.random.fold_in(k_steps, 2**31 + it), 1,
                sample_mode="categorical")
            fetch.add(it, metrics, sent, force=expsv)
        if expsv and it > cfgv.s_iter:
            state = {"params": params, "opt": opt_state,
                     "step": jnp.asarray(it)}
            checkpoints.save(cfgv.chkpt_path.format(it), state)
            log.info("Saved model to %s", cfgv.chkpt_path.format(it))
            if cfg.hw.get("heldout_eval", True):
                hld = evaluate_heldout(model, params, dataset,
                                       jax.random.fold_in(k_steps,
                                                          2**30 + it))
                if hld is not None:
                    for k, v in hld.items():
                        if logger is not None:
                            logger.log_value("hld_" + k, v, it)
                    log.info("HELDOUT recon: %.4f kl: %.4f",
                             hld["recon"], hld["kl"])
            if on_checkpoint is not None:
                on_checkpoint(it, params)

    it = cfgv.s_iter
    end_it = cfgv.s_iter + cfgv.n_iter
    while it <= end_it:
        # take an unrolled chunk whenever no step inside it needs the host
        # EXCEPT possibly the last one — its metrics/params come back from
        # the chunk, so host boundaries stay on the chunk program instead
        # of swapping to the single-step executable. RNG streams and batch
        # order are identical either way.
        if (unroll > 1 and it + unroll - 1 <= end_it
                and not any(needs_host(it + j) for j in range(unroll - 1))):
            texts = np.stack([dataset.next_batch("train_vae").text
                              for _ in range(unroll)])
            params, opt_state, metrics = train_chunk(
                params, opt_state, k_steps, place_chunk(texts),
                jnp.asarray(it, jnp.int32))
            it_last = it + unroll - 1
            if needs_host(it_last):
                do_host(it_last, metrics)  # chunk returns last-step metrics
            it += unroll
            continue
        batch = dataset.next_batch("train_vae")
        params, opt_state, metrics = train_step(
            params, opt_state, jax.random.fold_in(k_steps, it),
            place_batch(batch.text), jnp.asarray(it, jnp.int32))
        do_host(it, metrics)
        it += 1

    fetch.flush()
    jax.block_until_ready(params)
    profile_stack.close()
    steps_per_sec = (cfgv.n_iter + 1 - (it_start - cfgv.s_iter)) / max(
        time.time() - t_start, 1e-9)
    if logger is not None:
        logger.log_value("train_steps_per_sec", steps_per_sec, end_it)
    return params, opt_state, steps_per_sec
