"""ZeRO-1 optimizer-state sharding on the 8-device virtual CPU mesh.

The ZeRO step must be a pure re-sharding of the plain DP computation:
same losses, same updated params (up to float reduction order), with the
Adam moments genuinely partitioned 1/N over the 'data' axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu import parallel
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.train import make_train_step

V, T = 14, 10


def setup():
    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 16
    cfg.model.emb_dim = 12
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=V, max_seq_len=T)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    return cfg, model, params, rf


def rand_text(key, B):
    toks = jax.random.randint(key, (B, T), 4, V)
    return toks.at[:, 0].set(2).at[:, 7].set(3).astype(jnp.int32)


def test_zero_step_matches_single_device():
    cfg, model, params, rf = setup()
    mesh = parallel.get_mesh(8)
    text = rand_text(jax.random.PRNGKey(2), 16)
    key = jax.random.PRNGKey(3)
    it = jnp.asarray(0, jnp.int32)

    single_step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                       donate=False)
    p1, o1, m1 = single_step(params, opt.init(params), key, text, it)

    z_step, _, init_state = parallel.make_zero_train_step(
        model, cfg.vae, cfg.losses, rf, mesh, donate=False)
    p_s, o_s = init_state(params)
    t_s = parallel.shard_batch(mesh, text)
    p2, o2, m2 = z_step(p_s, o_s, key, t_s, it)

    assert abs(float(m1["L_vae"]) - float(m2["L_vae"])) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert jnp.allclose(a, jax.device_get(b), atol=5e-5), (
            "ZeRO step diverged from the single-device step")

    # 3 more steps on the sharded state: still matched
    for i in range(1, 4):
        k = jax.random.fold_in(key, i)
        iti = jnp.asarray(i, jnp.int32)
        p1, o1, m1 = single_step(p1, o1, k, text, iti)
        p2, o2, m2 = z_step(p2, o2, k, t_s, iti)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert jnp.allclose(a, jax.device_get(b), atol=2e-4)


def test_zero_moments_are_sharded():
    cfg, model, params, rf = setup()
    mesh = parallel.get_mesh(8)
    _, _, init_state = parallel.make_zero_train_step(
        model, cfg.vae, cfg.losses, rf, mesh, donate=False)
    p_s, o_s = init_state(params)

    # params stay replicated; moments of a divisible leaf are 1/8 shards
    assert p_s["emb"]["w"].sharding.spec in (P(), P(None), P(None, None))
    adam = o_s[1][0]
    w_mu = adam.mu["enc"]["gru_fwd"]["wh"]      # [h, 3h] = [8, 24]: dim 0
    assert w_mu.sharding.spec == P("data")
    full = w_mu.shape
    shard_shapes = {s.data.shape for s in w_mu.addressable_shards}
    assert shard_shapes == {(full[0] // 8,) + full[1:]}

    # moments keep their sharding across an update (no silent regather)
    z_step, _, _ = parallel.make_zero_train_step(
        model, cfg.vae, cfg.losses, rf, mesh, donate=False)
    t_s = parallel.shard_batch(mesh, rand_text(jax.random.PRNGKey(5), 16))
    _, o2, _ = z_step(p_s, o_s, jax.random.PRNGKey(4), t_s,
                      jnp.asarray(0, jnp.int32))
    assert o2[1][0].mu["enc"]["gru_fwd"]["wh"].sharding.spec == P("data")


def test_zero_spec_fallbacks():
    """Leaves with no dp-divisible axis replicate instead of erroring."""
    specs = parallel.zero_param_specs(
        {"a": jnp.zeros((16, 3)), "b": jnp.zeros((3, 3)),
         "c": jnp.zeros((3, 32))}, 8)
    assert specs["a"] == P("data")
    assert specs["b"] == P()
    assert specs["c"] == P(None, "data")


def test_zero_cli_end_to_end(tmp_path):
    """main.py --hw.dp 5 --hw.zero 1: phase-1 trains with ZeRO-sharded
    moments selected purely via CLI flags."""
    import os
    import main as main_mod

    argv = ["--tiny", "1", "--dataset", "synthetic", "--runname", "zero",
            "--phase", "1", "--hw.dp", "5", "--hw.zero", "1",
            "--savepath_toplevel", str(tmp_path / "out"),
            "--tb_toplevel", str(tmp_path / "tb"),
            "--datapath", str(tmp_path / "data")]
    cfg = main_mod.main(argv)
    assert os.path.exists(cfg.vae.gen_samples_path)
    state = np.load(cfg.vae.chkpt_path.format(100), allow_pickle=True)
    assert all(np.isfinite(state[k]).all() for k in state.files
               if np.issubdtype(state[k].dtype, np.floating))
