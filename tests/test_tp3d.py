"""Full 3D (data, pipe, model) mesh: TP x PP x DP composed on the
8-device virtual CPU mesh.

The GPipe schedule (parallel/pp.py) is manual over 'pipe' ONLY and the
Megatron layout (parallel/tp.py) is pure GSPMD PartitionSpecs, so the two
compose without new communication code: the PP model drops into the TP
train step on a get_mesh_3d(dp, pp, tp) mesh and must reproduce the
single-device trajectory while keeping block weights 'model'-sharded.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from controlled_peptide_generation_tpu import parallel
from test_tp import tfm_setup, rand_text


def test_3d_step_matches_single_device():
    from controlled_peptide_generation_tpu.train import make_train_step

    cfg, model, params, rf = tfm_setup()
    text = rand_text(jax.random.PRNGKey(2), 16)
    key = jax.random.PRNGKey(3)
    it = jnp.asarray(0, jnp.int32)

    single_step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                       donate=False)
    p1, o1, m1 = single_step(params, opt.init(params), key, text, it)

    mesh = parallel.get_mesh_3d(2, 2, 2)
    ppm = parallel.make_pp_model(model, mesh)
    tp_step, _, init_state = parallel.make_tp_train_step(
        ppm, cfg.vae, cfg.losses, rf, mesh, donate=False)
    p_s, o_s = init_state(params)
    t_s = parallel.shard_batch(mesh, text)
    p2, o2, m2 = tp_step(p_s, o_s, key, t_s, it)

    assert abs(float(m1["L_vae"]) - float(m2["L_vae"])) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert jnp.allclose(a, jax.device_get(b), atol=5e-5), (
            "3D step diverged from the single-device step")
    # Megatron partitioning must survive the pipelined step
    assert p2["dec"]["blocks"][0]["qkv"]["w"].sharding.spec \
        == P(None, "model")

    # a second step on the updated (sharded) state still runs and moves
    p3, _, m3 = tp_step(p2, o2, jax.random.fold_in(key, 1), t_s,
                        jnp.asarray(1, jnp.int32))
    assert 0 < float(m3["L_vae"]) < float(m2["L_vae"]) + 1.0


def test_3d_cli_end_to_end(tmp_path):
    """main.py --hw.pp 2 --hw.tp 2: phase-1 trains the transformer family
    on the 3D ('data', 'pipe', 'model') mesh selected purely via CLI
    flags. (dp stays 1 here because the tiny profile pins batch_size=5
    after flag parsing; the 2x2x2 composition is covered above.)"""
    import os
    import numpy as np
    import main as main_mod

    argv = ["--tiny", "1", "--dataset", "synthetic", "--runname", "tfm3d",
            "--phase", "1", "--hw.pp", "2", "--hw.tp", "2",
            "--hw.unroll", "1",
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
    assert all(np.isfinite(state[k]).all() for k in state.files
               if np.issubdtype(state[k].dtype, np.floating))


def test_3d_full_step_runs():
    """Phase-2 three-sub-update step composed on the 3D mesh: the PP
    model's full-seq passes pipeline over 'pipe' while Megatron specs
    shard the blocks over 'model'; must match single-device losses."""
    from controlled_peptide_generation_tpu.train.train_full import (
        make_full_step)
    from test_tp import full_cfg

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
    p1, *_, m1 = step(params, *o1, key, text, lab_text, lab_y, it)

    mesh = parallel.get_mesh_3d(2, 2, 2)
    ppm = parallel.make_pp_model(model, mesh)
    tp_step, _, init_state = parallel.make_tp_full_step(
        ppm, cfg.full, cfg.losses, rf, mesh, donate=False)
    p_s, os_s = init_state(params)
    p2, *_, m2 = tp_step(p_s, *os_s, key,
                         parallel.shard_batch(mesh, text),
                         parallel.shard_batch(mesh, lab_text),
                         parallel.shard_batch(mesh, lab_y), it)
    for k in ("L_vae", "L_attr_c", "L_clf_sup"):
        assert abs(float(m1[k]) - float(m2[k])) < 1e-3, k
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert jnp.allclose(a, jax.device_get(b), atol=5e-5)
