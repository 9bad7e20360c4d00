"""Cross-framework trajectory parity: the JAX/TPU phase-1 trainer must
track a minimal PyTorch mirror of the reference WAE (same corpus, same
dims/losses/optimizer settings). RNGs differ, so parity is statistical —
matched-iteration recon within tolerance and the same qualitative shape
(recon falls, MMD-RF pinned near 0, KL free to grow)."""

import jax
import jax.numpy as jnp
import numpy as np

import main as main_mod
from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.train.train_vae import (
    make_train_step)

N_ITER = 1500


def run_jax(dataset, cfg, n_iter=N_ITER, log_every=100):
    model = build_model(cfg.model, n_vocab=dataset.n_vocab,
                        max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    cfg.vae.update(cfg.shared)
    cfg.vae.s_iter = 0
    cfg.vae.n_iter = n_iter
    cfg.vae.beta.start.iter = 0
    cfg.vae.beta.end.iter = max(n_iter // 5, 1)
    step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                donate=False)
    o = opt.init(params)
    key = jax.random.PRNGKey(2)
    curve = []
    p = params
    for it in range(n_iter + 1):
        batch = dataset.next_batch("train_vae")
        p, o, m = step(p, o, jax.random.fold_in(key, it),
                       jnp.asarray(batch.text), jnp.asarray(it, jnp.int32))
        if it % log_every == 0:
            curve.append({"it": it, "recon": float(m["L_vae_recon"]),
                          "kl": float(m["L_vae_kl"]),
                          "mmdrf": float(m["L_wae_mmdrf"])})
    return curve


def test_trajectory_parity_with_torch_mirror(tmp_path):
    from tools.parity_torch import train as train_torch

    cfg = C.default_config()
    cfg.dataset = "synthetic"
    cfg.datapath = str(tmp_path / "data")
    C.finalize(cfg)
    cfg.vae.batch_size = 32
    dataset = main_mod.load_dataset(cfg)

    jax_curve = run_jax(dataset, cfg)
    torch_curve = train_torch(n_iter=N_ITER, datapath=cfg.datapath)

    jr = {r["it"]: r for r in jax_curve}
    tr = {r["it"]: r for r in torch_curve}
    # matched-iteration recon within 20% relative after warmup
    for it in (500, 1000, 1500):
        a, b = jr[it]["recon"], tr[it]["recon"]
        assert abs(a - b) / max(b, 1e-6) < 0.20, (it, a, b)
    # same qualitative WAE shape in both frameworks
    for c in (jr, tr):
        assert c[N_ITER]["recon"] < 0.6 * c[0]["recon"]
        assert abs(c[N_ITER]["mmdrf"]) < 0.5        # MMD pinned near 0
        assert c[N_ITER]["kl"] > 10 * max(c[0]["kl"], 1.0)  # KL free
