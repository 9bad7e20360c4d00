"""Phase-2 controlled-generation training ("full" phase).

The reference released only this phase's CONFIG surface (cfg.py:191-231:
lrE/lrG/lrC, lambda_c/z/e/u, soft-sample kwargs, softmax-temp anneal) and
the soft-sampling machinery that exists to support it (model.py:225-385);
main.py:74 only handles phase 1 and losses.py carries an unimplemented stub
(losses.py:119-123). This module implements the phase following the method
the reference builds on — Hu et al. 2017, "Toward Controlled Generation of
Text" (cited at model.py:18) — wired to exactly those config fields:

per iteration, three jointly-jitted sub-updates:
  1. VAE update (encoder+embedding at lrE, decoder at lrG): recon +
     beta * z_regu + logvar penalties, with c from the classifier;
  2. generator attribute update (decoder at lrG): soft-sample sentences
     from (z, c) ~ priors with G_soft_sample_kwargs / annealed softmax
     temperature; lambda_c * CE(classifier(soft), c)  +
     lambda_z * ||encode(soft).mu - z||^2 (z-space cycle consistency);
  3. classifier update (lrC): CE on labeled minibatches + lambda_u *
     (CE on generated samples with their sampled c as target
      + lambda_e * entropy of the classifier on them).

Everything runs as ONE jitted step (three grad computations, three masked
Adam updates); the host only feeds batches and logs.
"""

import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import losses as L
from ..ops import sampling
from ..utils.annealing import anneal
from ..utils import logging as tblog
from . import checkpoints

log = logging.getLogger(__name__)


def make_full_step(model, cfgf, cfg_losses, rf_basis, donate=True):
    mmd_cfg = cfg_losses.wae_mmd
    opt_E = optax.chain(optax.clip_by_global_norm(cfgf.clip_grad),
                        optax.adam(cfgf.lrE))
    opt_G = optax.chain(optax.clip_by_global_norm(cfgf.clip_grad),
                        optax.adam(cfgf.lrG))
    opt_C = optax.chain(optax.clip_by_global_norm(cfgf.clip_grad),
                        optax.adam(cfgf.lrC))
    soft_mode = cfgf.G_soft_sample_kwargs.get("sample_mode", "none_softmax")
    hard_mode = cfgf.C_hard_sample_kwargs.get("sample_mode", "categorical")

    def vae_loss(params, key, text, beta):
        k_fwd, k_mmd, k_rf = jax.random.split(key, 3)
        (mu, logvar), (z, c), dec_logits = model.forward(
            params, k_fwd, text, q_c="classifier", sample_z=1, train=True)
        recon = L.recon_dec(text, dec_logits)
        kl = L.kl_gaussianprior(mu, logvar)
        mmd = L.wae_mmd_gaussianprior_full(k_mmd, z, mmd_cfg.sigma,
                                           mmd_cfg.kernel)
        rf_w, rf_b = rf_basis
        mmdrf = L.wae_mmd_gaussianprior_rf(k_rf, z, rf_w, rf_b,
                                           mmd_cfg.sigma)
        z_regu = {"kl": kl, "mmd": mmd, "mmdrf": mmdrf}[cfgf.z_regu_loss]
        z_logvar_L1 = jnp.mean(jnp.sum(jnp.abs(logvar), axis=1))
        z_logvar_KL = L.kl_gaussian_sharedmu(mu, logvar)
        loss = (recon + beta * z_regu
                + cfgf.lambda_logvar_L1 * z_logvar_L1
                + cfgf.lambda_logvar_KL * z_logvar_KL)
        return loss, {"L_vae": loss, "L_vae_recon": recon, "L_vae_kl": kl,
                      "L_wae_mmdrf": mmdrf}

    def g_attr_loss(params, key, mb, temp):
        """Soft-sample from priors; attribute + z-cycle losses for G."""
        kz, kc, ks = jax.random.split(key, 3)
        z = model.sample_z_prior(kz, mb)
        c = model.sample_c_prior(kc, mb)
        _, soft = sampling.sample_sentences(
            model, params, ks, z, c, sample_mode=soft_mode, temp=temp)
        clf_logits = model.classify(params, soft)
        target = jnp.argmax(c, axis=1)
        logp = jax.nn.log_softmax(clf_logits, axis=1)
        attr_c = -jnp.mean(jnp.take_along_axis(logp, target[:, None],
                                               axis=1))
        mu_hat, _ = model.encode(params, soft)
        attr_z = jnp.mean(jnp.sum((mu_hat - z) ** 2, axis=1))
        loss = cfgf.lambda_c * attr_c + cfgf.lambda_z * attr_z
        return loss, {"L_attr_c": attr_c, "L_attr_z": attr_z}

    def c_loss(params, key, lab_text, lab_y, temp):
        """Supervised CE + lambda_u * (unsup CE on samples + entropy)."""
        kz, kc, ks = jax.random.split(key, 3)
        logits_s = model.classify(params, lab_text, key=key, train=True)
        logp_s = jax.nn.log_softmax(logits_s, axis=1)
        sup = -jnp.mean(jnp.take_along_axis(
            logp_s, lab_y[:, None].astype(jnp.int32), axis=1))

        mb = lab_text.shape[0]
        z = model.sample_z_prior(kz, mb)
        c = model.sample_c_prior(kc, mb)
        gen = sampling.sample_sentences(model, params, ks, z, c,
                                        sample_mode=hard_mode, temp=temp)
        gen = jax.lax.stop_gradient(gen)
        logits_u = model.classify(params, gen)
        logp_u = jax.nn.log_softmax(logits_u, axis=1)
        unsup = -jnp.mean(jnp.take_along_axis(
            logp_u, jnp.argmax(c, axis=1)[:, None], axis=1))
        ent = -jnp.mean(jnp.sum(jnp.exp(logp_u) * logp_u, axis=1))
        loss = sup + cfgf.lambda_u * (unsup + cfgf.lambda_e * ent)
        acc = jnp.mean((jnp.argmax(logits_s, 1) == lab_y).astype(
            jnp.float32))
        return loss, {"L_clf_sup": sup, "L_clf_unsup": unsup,
                      "clf_entropy": ent, "clf_acc": acc}

    def masked(grads, keep):
        return {k: (g if k in keep else jax.tree.map(jnp.zeros_like, g))
                for k, g in grads.items()}

    def one_iter(params, oE, oG, oC, key, text, lab_text, lab_y, it):
        itf = it.astype(jnp.float32)
        beta = anneal(cfgf.beta, itf)
        temp = anneal(cfgf.softmax_temp, itf)
        k1, k2, k3 = jax.random.split(key, 3)

        # 1) VAE update: encoder group at lrE, decoder group at lrG
        g_vae, m1 = jax.grad(vae_loss, has_aux=True)(params, k1, text,
                                                     beta)
        upd, oE = opt_E.update(masked(g_vae, ("emb", "enc", "flow")), oE,
                               params)
        params = optax.apply_updates(params, upd)
        upd, oG = opt_G.update(masked(g_vae, ("dec",)), oG, params)
        params = optax.apply_updates(params, upd)

        # 2) generator attribute update (decoder only)
        g_attr, m2 = jax.grad(g_attr_loss, has_aux=True)(
            params, k2, text.shape[0], temp)
        upd, oG = opt_G.update(masked(g_attr, ("dec",)), oG, params)
        params = optax.apply_updates(params, upd)

        # 3) classifier update
        g_clf, m3 = jax.grad(c_loss, has_aux=True)(params, k3, lab_text,
                                                   lab_y, temp)
        upd, oC = opt_C.update(masked(g_clf, ("clf",)), oC, params)
        params = optax.apply_updates(params, upd)

        metrics = {**m1, **m2, **m3, "beta": beta, "softmax_temp": temp}
        return params, oE, oG, oC, metrics

    full_step = partial(jax.jit, donate_argnums=(0, 1, 2, 3) if donate
                        else ())(one_iter)
    return full_step, (opt_E, opt_G, opt_C), one_iter


def make_full_scan(model, cfgf, cfg_losses, rf_basis, unroll, donate=True):
    """`unroll` phase-2 iterations in ONE jitted program (same dispatch-
    latency rationale as train_vae.make_train_scan; RNG streams identical
    to the step-by-step path)."""
    _, opts, one_iter = make_full_step(model, cfgf, cfg_losses, rf_basis,
                                       donate=False)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3) if donate else ())
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


def train_full(cfg, model, dataset, params, logger=None,
               lab_iterator="train_amp_lab"):
    """Run the phase-2 loop. Returns (params, steps_per_sec)."""
    cfgf = cfg.full
    key = jax.random.PRNGKey(cfg.seed)
    k_rf, k_steps = jax.random.split(key)
    rf_basis = L.init_rf_basis(k_rf, model.z_dim, cfg.losses.wae_mmd.rf_dim)

    # parallelism selection mirrors the phase-1 loop (train_vae): hw.dp
    # for any family, hw.tp (Megatron) / hw.pp (GPipe) for the transformer
    # family, tp+pp composing into the 3D ('data', 'pipe', 'model') mesh.
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
        assert cfgf.batch_size % dp_eff == 0, (
            f"batch_size {cfgf.batch_size} must divide over {dp_eff} "
            f"data-parallel devices")
        if n_pp > 1:
            tp_mesh = parallel.get_mesh_3d(dp_eff, n_pp, n_tp)
            model = parallel.make_pp_model(model, tp_mesh)
        else:
            tp_mesh = parallel.get_mesh_2d(dp_eff, n_tp)
        full_step, opts, tp_init_state = parallel.make_tp_full_step(
            model, cfgf, cfg.losses, rf_basis, tp_mesh,
            donate=cfg.hw.donate_state)
        log.info("tensor-parallel phase-2 training: (data=%d%s, model=%d) "
                 "mesh", dp_eff, f", pipe={n_pp}" if n_pp > 1 else "", n_tp)
    elif n_pp > 1:
        from .. import parallel
        pipe_mesh = parallel.get_mesh_pipe(n_pp,
                                           dp=n_dp if n_dp > 1 else 1)
        model = parallel.make_pp_model(model, pipe_mesh)
        if n_dp > 1:
            mesh = pipe_mesh
        log.info("pipeline-parallel phase-2 training: pp=%d, dp=%d",
                 n_pp, max(n_dp, 1))
    elif n_dp > 1:
        from .. import parallel
        mesh = parallel.get_mesh(n_dp, cfg.hw.get("mesh_axis", "data"))
    if mesh is not None:
        from .. import parallel
        assert cfgf.batch_size % n_dp == 0, (
            f"batch_size {cfgf.batch_size} must divide over {n_dp} devices")
        full_step, opts, _ = parallel.make_dp_full_step(
            model, cfgf, cfg.losses, rf_basis, mesh,
            axis=cfg.hw.get("mesh_axis", "data"),
            donate=cfg.hw.donate_state)
        log.info("data-parallel phase-2 training over %d devices", n_dp)
    else:
        full_step, opts, _ = make_full_step(model, cfgf, cfg.losses,
                                            rf_basis,
                                            donate=cfg.hw.donate_state)
    oE, oG, oC = (o.init(params) for o in opts)

    # clamp to the largest boundary-aligned chunk width (train_vae policy)
    from .train_vae import aligned_unroll
    unroll = aligned_unroll(int(cfg.hw.get("unroll", 1) or 1),
                            int(cfgf.cheaplog_every),
                            int(cfgf.expsvlog_every))
    if tp_init_state is not None:
        # no TP scan builder: the DP chunk's replicated in_shardings would
        # silently undo the Megatron partitioning (train_vae policy)
        unroll = 1
    if unroll > 1:
        if mesh is not None:
            from .. import parallel
            full_chunk, _ = parallel.make_dp_full_scan(
                model, cfgf, cfg.losses, rf_basis, mesh, unroll,
                axis=cfg.hw.get("mesh_axis", "data"),
                donate=cfg.hw.donate_state)
        else:
            full_chunk, _ = make_full_scan(model, cfgf, cfg.losses,
                                           rf_basis, unroll,
                                           donate=cfg.hw.donate_state)

    if cfg.loadpath:
        params = checkpoints.load(cfg.loadpath, {"params": params},
                                  strict=False)["params"]
        log.info("Loaded params from %s", cfg.loadpath)
    if tp_init_state is not None:
        # commit under the Megatron PartitionSpecs (moments spec'd too)
        params, (oE, oG, oC) = tp_init_state(params, (oE, oG, oC))
    elif mesh is not None:
        from .. import parallel
        params = parallel.replicate(mesh, params)
        oE, oG, oC = (parallel.replicate(mesh, o) for o in (oE, oG, oC))

    logger = logger or tblog._default_logger
    attr_name = dataset.attributes[0][0]
    t_start = time.time()
    log.info("Training full (controlled-generation) phase ...")
    n_done = 0

    def needs_host(j):
        return (j % cfgf.cheaplog_every == 0
                or j % cfgf.expsvlog_every == 0)

    # metric fetches are DEFERRED and coalesced (utils.logging.DeferredFetch)
    def sink(p_it, vals):
        if logger is not None:
            for k, v in vals.items():
                logger.log_value("full_" + k, v, p_it)
        log.info("ITER %d (phase 2). L_vae: %.4f; attr_c: %.4f; "
                 "attr_z: %.4f; clf_sup: %.4f; clf_acc: %.3f",
                 p_it, vals["L_vae"], vals["L_attr_c"],
                 vals["L_attr_z"], vals["L_clf_sup"], vals["clf_acc"])

    fetch = tblog.DeferredFetch(cfg.hw.get("log_flush_every", 10), sink)

    def do_host(it, metrics):
        cheap = it % cfgf.cheaplog_every == 0
        expsv = it % cfgf.expsvlog_every == 0
        if cheap or expsv:
            fetch.add(it, metrics, force=expsv)
        if expsv and it > cfgf.s_iter:
            checkpoints.save(cfgf.chkpt_path.format(it),
                             {"params": params, "step": jnp.asarray(it)})
            log.info("Saved model to %s", cfgf.chkpt_path.format(it))

    it = cfgf.s_iter
    end_it = cfgf.s_iter + cfgf.n_iter
    while it <= end_it:
        # unrolled chunk whenever no step inside it needs the host EXCEPT
        # possibly the last one — its metrics/params come back from the
        # chunk, so host boundaries never fall back to the single-step
        # program (alternating executables costs a program swap on remote
        # backends). RNG streams and batch order identical either way.
        if (unroll > 1 and it + unroll - 1 <= end_it
                and not any(needs_host(it + j) for j in range(unroll - 1))):
            texts, lab_texts, lab_ys = [], [], []
            for _ in range(unroll):
                texts.append(dataset.next_batch("train_vae").text)
                lab = dataset.next_batch(lab_iterator)
                lab_texts.append(lab.text)
                lab_ys.append(np.maximum(getattr(lab, attr_name), 0))
            params, oE, oG, oC, metrics = full_chunk(
                params, oE, oG, oC, k_steps,
                jnp.asarray(np.stack(texts)),
                jnp.asarray(np.stack(lab_texts)),
                jnp.asarray(np.stack(lab_ys)),
                jnp.asarray(it, jnp.int32))
            n_done += unroll
            it_last = it + unroll - 1
            if needs_host(it_last):
                do_host(it_last, metrics)   # chunk returns last-step metrics
            it += unroll
            continue
        batch = dataset.next_batch("train_vae")
        lab = dataset.next_batch(lab_iterator)
        lab_y = np.maximum(getattr(lab, attr_name), 0)
        params, oE, oG, oC, metrics = full_step(
            params, oE, oG, oC, jax.random.fold_in(k_steps, it),
            jnp.asarray(batch.text), jnp.asarray(lab.text),
            jnp.asarray(lab_y), jnp.asarray(it, jnp.int32))
        n_done += 1
        do_host(it, metrics)
        it += 1

    fetch.flush()
    jax.block_until_ready(params)
    return params, n_done / max(time.time() - t_start, 1e-9)
