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
