"""train_vae with hw.dp>1: end-to-end DP loop on the virtual CPU mesh."""

import jax
import numpy as np

import main as main_mod
from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.utils import logging as tblog


def test_train_vae_dp_loop(tmp_path, synthetic_corpus):
    cfg = C.default_config()
    cfg.tiny = True
    cfg.dataset = "synthetic"
    cfg.datapath = str(tmp_path / "d")
    cfg.savepath_toplevel = str(tmp_path / "out")
    cfg.tb_toplevel = str(tmp_path / "tb")
    cfg.runname = "dp"
    cfg.hw.dp = 4
    C.finalize(cfg)
    cfg.vae.n_iter = 20
    cfg.vae.cheaplog_every = 10
    cfg.vae.expsvlog_every = 20
    cfg.vae.batch_size = 8          # 2 rows per device
    cfg.evals.sample_size = 4

    import shutil
    shutil.copytree(synthetic_corpus, str(tmp_path / "d" / "synthetic"))

    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.train import train_vae

    dataset = main_mod.load_dataset(cfg)
    model = build_model(cfg.model, n_vocab=dataset.n_vocab,
                        max_seq_len=cfg.max_seq_len)
    model = build_model(
        C.Bunch(dict(cfg.model, z_dim=12, emb_dim=10,
                     E_args=C.Bunch(dict(cfg.model.E_args, h_dim=8)))),
        n_vocab=dataset.n_vocab, max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))

    tblog.reset()
    logger = tblog.configure(cfg.tbpath, None)
    p, _, sps = train_vae(cfg, model, dataset, params, logger)
    vals = logger.get_last_logged_values()
    assert "train_L_vae" in vals
    assert "hld_recon" in vals            # heldout eval ran at checkpoint
    assert np.isfinite(vals["train_L_vae"])
    leaves = jax.tree_util.tree_leaves(p)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_dp_scan_matches_dp_step_trajectory(synthetic_corpus):
    """make_dp_train_scan must reproduce N make_dp_train_step updates
    exactly (same RNG stream, same batches, same psum reductions)."""
    import jax.numpy as jnp
    from controlled_peptide_generation_tpu import parallel
    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.ops import losses as L

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=14, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    mesh = parallel.get_mesh(4)
    unroll = 4

    step, opt = parallel.make_dp_train_step(model, cfg.vae, cfg.losses,
                                            rf, mesh, donate=False)
    chunk, _ = parallel.make_dp_train_scan(model, cfg.vae, cfg.losses,
                                           rf, mesh, unroll, donate=False)
    key = jax.random.PRNGKey(7)
    texts = jax.random.randint(key, (unroll, 8, 10), 4, 14,
                               jnp.int32).at[..., 0].set(2)

    p1 = parallel.replicate(mesh, params)
    o1 = parallel.replicate(mesh, opt.init(params))
    for it in range(unroll):
        t = parallel.shard_batch(mesh, texts[it])
        p1, o1, m1 = step(p1, o1, jax.random.fold_in(key, it), t,
                          jnp.asarray(it, jnp.int32))

    from jax.sharding import NamedSharding, PartitionSpec as P
    p2 = parallel.replicate(mesh, params)
    o2 = parallel.replicate(mesh, opt.init(params))
    texts_sh = jax.device_put(texts, NamedSharding(mesh, P(None, "data")))
    p2, o2, m2 = chunk(p2, o2, key, texts_sh, jnp.asarray(0, jnp.int32))

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(m1["L_vae"]), float(m2["L_vae"]),
                               rtol=2e-5)


def test_train_vae_dp_loop_with_unroll(tmp_path, synthetic_corpus):
    """End-to-end DP loop with hw.unroll>1: chunked dispatches between
    host boundaries on the 4-device mesh."""
    cfg = C.default_config()
    cfg.tiny = True
    cfg.dataset = "synthetic"
    cfg.datapath = str(tmp_path / "d")
    cfg.savepath_toplevel = str(tmp_path / "out")
    cfg.tb_toplevel = str(tmp_path / "tb")
    cfg.runname = "dpu"
    cfg.hw.dp = 4
    cfg.hw.unroll = 5
    C.finalize(cfg)
    cfg.vae.n_iter = 20
    cfg.vae.cheaplog_every = 10
    cfg.vae.expsvlog_every = 20
    cfg.vae.batch_size = 8
    cfg.evals.sample_size = 4

    import shutil
    shutil.copytree(synthetic_corpus, str(tmp_path / "d" / "synthetic"))

    from controlled_peptide_generation_tpu.models import build_model
    from controlled_peptide_generation_tpu.train import train_vae

    dataset = main_mod.load_dataset(cfg)
    model = build_model(
        C.Bunch(dict(cfg.model, z_dim=12, emb_dim=10,
                     E_args=C.Bunch(dict(cfg.model.E_args, h_dim=8)))),
        n_vocab=dataset.n_vocab, max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))

    tblog.reset()
    logger = tblog.configure(cfg.tbpath, None)
    p, _, sps = train_vae(cfg, model, dataset, params, logger)
    vals = logger.get_last_logged_values()
    assert np.isfinite(vals["train_L_vae"])
    leaves = jax.tree_util.tree_leaves(p)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
