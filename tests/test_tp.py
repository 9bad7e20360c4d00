"""Tensor-parallel transformer training on the 8-device virtual CPU mesh.

The TP step must be a pure re-sharding of the single-device computation:
same loss, same updated params (up to float reduction order), with block
weights genuinely partitioned over the 'model' axis.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu import parallel
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.train import make_train_step

V, T = 14, 10


def tfm_setup(E_class="transformer", G_class="transformer", n_heads=4):
    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 16
    cfg.model.E_args.E_class = E_class
    cfg.model.E_args.T_args.update(d_model=32, n_layers=2, d_ff=64,
                                   n_heads=n_heads)
    cfg.model.G_args.G_class = G_class
    cfg.model.G_args.T_args.update(d_model=32, n_layers=2, d_ff=64,
                                   n_heads=n_heads)
    model = build_model(cfg.model, n_vocab=V, max_seq_len=T)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    return cfg, model, params, rf


def rand_text(key, B):
    toks = jax.random.randint(key, (B, T), 4, V)
    return toks.at[:, 0].set(2).at[:, 7].set(3).astype(jnp.int32)


def test_tp_step_matches_single_device():
    cfg, model, params, rf = tfm_setup()
    mesh = parallel.get_mesh_2d(2, 4)
    text = rand_text(jax.random.PRNGKey(2), 16)
    key = jax.random.PRNGKey(3)
    it = jnp.asarray(0, jnp.int32)

    single_step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                       donate=False)
    p1, o1, m1 = single_step(params, opt.init(params), key, text, it)

    tp_step, _, init_state = parallel.make_tp_train_step(
        model, cfg.vae, cfg.losses, rf, mesh, donate=False)
    p_s, o_s = init_state(params)
    t_s = parallel.shard_batch(mesh, text)
    p2, o2, m2 = tp_step(p_s, o_s, key, t_s, it)

    assert abs(float(m1["L_vae"]) - float(m2["L_vae"])) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert jnp.allclose(a, jax.device_get(b), atol=5e-5), (
            "TP step diverged from the single-device step")

    # a second (donated-shardings-preserving) step still runs and moves
    p3, o3, m3 = tp_step(p2, o2, jax.random.fold_in(key, 1), t_s,
                         jnp.asarray(1, jnp.int32))
    assert float(m3["L_vae"]) > 0


def test_block_weights_are_model_sharded():
    cfg, model, params, rf = tfm_setup()
    mesh = parallel.get_mesh_2d(2, 4)
    _, _, init_state = parallel.make_tp_train_step(
        model, cfg.vae, cfg.losses, rf, mesh, donate=False)
    p_s, o_s = init_state(params)

    qkv = p_s["dec"]["blocks"][0]["qkv"]["w"]
    assert qkv.sharding.spec == P(None, "model")
    # each device holds a 3D/4 column slice — whole heads, no overlap
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(32, 3 * 32 // 4)}
    ff2 = p_s["dec"]["blocks"][1]["ff2"]["w"]
    assert ff2.sharding.spec == P("model", None)
    # adam moments follow the param shardings (GSPMD propagation)
    mu_qkv = o_s[1][0].mu["dec"]["blocks"][0]["qkv"]["w"]
    assert mu_qkv.sharding.spec == P(None, "model")
    # non-transformer leaves stay replicated
    assert p_s["emb"]["w"].sharding.spec in (P(), P(None), P(None, None))


def test_mixed_family_shards_decoder_only():
    cfg, model, params, rf = tfm_setup(E_class="gru")
    specs = parallel.transformer_param_specs(params, n_heads=4, tp=4)
    flat_enc = jax.tree_util.tree_leaves(specs["enc"])
    assert all(s == P() for s in flat_enc)
    assert specs["dec"]["blocks"][0]["qkv"]["w"] == P(None, "model")


def test_tp_divisibility_validated():
    cfg, model, params, rf = tfm_setup(n_heads=2)
    mesh = parallel.get_mesh_2d(2, 4)
    with pytest.raises(AssertionError):
        parallel.make_tp_train_step(model, cfg.vae, cfg.losses, rf, mesh)


def test_tp_cli_end_to_end(tmp_path):
    """main.py --hw.tp 4: phase-1 trains the transformer family with
    Megatron tensor parallelism selected purely via CLI flags; block
    weights must come back finite and the run must produce its artifacts."""
    import os
    import main as main_mod
    import numpy as np

    argv = ["--tiny", "1", "--dataset", "synthetic", "--runname", "tfmtp",
            "--phase", "1", "--hw.tp", "4",
            "--model.E_args.E_class", "transformer",
            "--model.G_args.G_class", "transformer",
            "--model.E_args.T_args.d_model", "32",
            "--model.E_args.T_args.d_ff", "64",
            "--model.G_args.T_args.d_model", "32",
            "--model.G_args.T_args.d_ff", "64",
            "--savepath_toplevel", str(tmp_path / "out"),
            "--tb_toplevel", str(tmp_path / "tb"),
            "--datapath", str(tmp_path / "data")]
    cfg = main_mod.main(argv)
    assert os.path.exists(cfg.vae.gen_samples_path)
    state = np.load(cfg.vae.chkpt_path.format(100), allow_pickle=True)
    # key-paths like ['params']['dec']['blocks'][0]['qkv']['w']; the
    # TP-sharded train state must round-trip as finite global arrays
    assert any("qkv" in k for k in state.files)
    assert all(np.isfinite(state[k]).all() for k in state.files
               if np.issubdtype(state[k].dtype, np.floating))


def full_cfg(cfg):
    cfg.full.update(cfg.shared)
    cfg.full.s_iter = 0
    cfg.full.beta.start.iter = 0
    cfg.full.beta.end.iter = 10
    cfg.full.softmax_temp.start.iter = 0
    cfg.full.softmax_temp.end.iter = 10
    return cfg


def test_tp_full_step_matches_single_device():
    """Phase-2 (three sub-update) TP step == the single-device step on the
    transformer family, with Megatron-sharded params and moments."""
    from controlled_peptide_generation_tpu.train.train_full import (
        make_full_step)

    cfg, model, params, rf = tfm_setup()
    full_cfg(cfg)
    text = rand_text(jax.random.PRNGKey(4), 8)
    lab_text = rand_text(jax.random.PRNGKey(5), 8)
    lab_y = jnp.array([0, 1, 0, 1, 1, 0, 1, 0], jnp.int32)
    key = jax.random.PRNGKey(6)
    it = jnp.asarray(0, jnp.int32)

    step, opts, _ = make_full_step(model, cfg.full, cfg.losses, rf,
                                   donate=False)
    o1 = tuple(o.init(params) for o in opts)
    p1, oE1, oG1, oC1, m1 = step(params, *o1, key, text, lab_text, lab_y,
                                 it)

    mesh = parallel.get_mesh_2d(2, 4)
    tp_step, _, init_state = parallel.make_tp_full_step(
        model, cfg.full, cfg.losses, rf, mesh, donate=False)
    p_s, os_s = init_state(params)
    t_s = parallel.shard_batch(mesh, text)
    lt_s = parallel.shard_batch(mesh, lab_text)
    ly_s = parallel.shard_batch(mesh, lab_y)
    p2, oE2, oG2, oC2, m2 = tp_step(p_s, *os_s, key, t_s, lt_s, ly_s, it)

    for k in ("L_vae", "L_attr_c", "L_clf_sup", "clf_acc"):
        assert abs(float(m1[k]) - float(m2[k])) < 1e-3, k
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert jnp.allclose(a, jax.device_get(b), atol=5e-5), (
            "TP phase-2 step diverged from the single-device step")
    assert p2["dec"]["blocks"][0]["qkv"]["w"].sharding.spec \
        == P(None, "model")
    # each of the three Adam states carries Megatron-sharded moments
    for o in (oE2, oG2, oC2):
        mu = o[1][0].mu["dec"]["blocks"][0]["qkv"]["w"]
        assert mu.sharding.spec == P(None, "model")

    # second step on the updated sharded state runs
    p3, *_, m3 = tp_step(p2, oE2, oG2, oC2, jax.random.fold_in(key, 1),
                         t_s, lt_s, ly_s, jnp.asarray(1, jnp.int32))
    assert float(m3["L_vae"]) > 0


def test_tp_full_phase_cli(tmp_path):
    """main.py --phase -1 --hw.tp 2: BOTH phases train the transformer
    family tensor-parallel from the CLI (phase 2 = make_tp_full_step)."""
    import os
    import main as main_mod

    argv = ["--tiny", "1", "--dataset", "synthetic", "--runname", "tfmtpf",
            "--phase", "-1", "--hw.tp", "2",
            "--full.n_iter", "20", "--full.cheaplog_every", "10",
            "--full.expsvlog_every", "20",
            "--model.E_args.E_class", "transformer",
            "--model.G_args.G_class", "transformer",
            "--model.E_args.T_args.d_model", "32",
            "--model.E_args.T_args.d_ff", "64",
            "--model.G_args.T_args.d_model", "32",
            "--model.G_args.T_args.d_ff", "64",
            "--savepath_toplevel", str(tmp_path / "out"),
            "--tb_toplevel", str(tmp_path / "tb"),
            "--datapath", str(tmp_path / "data")]
    cfg = main_mod.main(argv)
    assert os.path.exists(cfg.full.gen_samples_path)
