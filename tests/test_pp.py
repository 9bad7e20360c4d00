"""Pipeline-parallel transformer training on the 8-device virtual CPU mesh.

The GPipe schedule (parallel/pp.py) must be a pure re-scheduling of the
single-device computation: identical forward activations, identical
gradients, identical train-step trajectory — microbatches are concatenated,
never reduced, so there is no tolerance-eating reduction reorder.
"""

import jax
import jax.numpy as jnp
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu import parallel
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.train import make_train_step
from controlled_peptide_generation_tpu.train.train_vae import make_loss_fn

V, T = 14, 10


def pp_setup(n_layers=4):
    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 16
    cfg.model.E_args.E_class = "transformer"
    cfg.model.E_args.T_args.update(d_model=16, n_layers=n_layers, d_ff=32,
                                   n_heads=4, p_dropout=0.0)
    cfg.model.G_args.G_class = "transformer"
    cfg.model.G_args.T_args.update(d_model=16, n_layers=n_layers, d_ff=32,
                                   n_heads=4, p_dropout=0.0)
    model = build_model(cfg.model, n_vocab=V, max_seq_len=T)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    return cfg, model, params, rf


def rand_text(key, B):
    text = jax.random.randint(key, (B, T), 4, V)
    return text.at[:, 0].set(2).at[:, -1].set(3)


def max_leaf_diff(a, b):
    return jax.tree.reduce(
        max, jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()), a, b))


@pytest.mark.parametrize("pipe,n_micro", [(2, 2), (4, 4), (2, 4)])
def test_pp_forward_matches_single_device(pipe, n_micro):
    cfg, model, params, _ = pp_setup()
    mesh = parallel.get_mesh_pipe(pipe)
    ppm = parallel.make_pp_model(model, mesh, n_micro=n_micro)
    text = rand_text(jax.random.PRNGKey(2), 8)
    key = jax.random.PRNGKey(3)
    (mu, lv), _, logits = model.forward(params, key, text, q_c="prior",
                                        sample_z=1, train=True)
    (mu2, lv2), _, logits2 = ppm.forward(params, key, text, q_c="prior",
                                         sample_z=1, train=True)
    assert float(jnp.abs(mu - mu2).max()) < 1e-5
    assert float(jnp.abs(lv - lv2).max()) < 1e-5
    assert float(jnp.abs(logits - logits2).max()) < 1e-5


def test_pp_gradients_match_single_device():
    cfg, model, params, rf = pp_setup()
    mesh = parallel.get_mesh_pipe(4)
    ppm = parallel.make_pp_model(model, mesh)
    text = rand_text(jax.random.PRNGKey(4), 8)
    key = jax.random.PRNGKey(5)
    beta = jnp.asarray(1.0)
    lf = make_loss_fn(model, cfg.vae, cfg.losses.wae_mmd, rf)
    lf_pp = make_loss_fn(ppm, cfg.vae, cfg.losses.wae_mmd, rf)
    g = jax.jit(jax.grad(lf, has_aux=True))(params, key, text, beta)[0]
    g_pp = jax.jit(jax.grad(lf_pp, has_aux=True))(params, key, text, beta)[0]
    assert max_leaf_diff(g, g_pp) < 1e-5


def test_pp_train_step_trajectory_matches():
    """Three optimizer steps through the unmodified jitted train step,
    pipeline model vs plain model.

    Per-step gradients match to float-reduction noise (~1e-8, asserted at
    1e-5 in test_pp_gradients_match_single_device), but Adam's m/sqrt(v)
    normalization acts like sign(g) while v is tiny, so that noise is
    amplified to ~1e-4 in the params within a few steps — the bound here
    covers the optimizer amplification, not any schedule divergence."""
    cfg, model, params, rf = pp_setup()
    mesh = parallel.get_mesh_pipe(2)
    ppm = parallel.make_pp_model(model, mesh)

    results = []
    for m in (model, ppm):
        step, optimizer = make_train_step(m, cfg.vae, cfg.losses, rf,
                                          donate=False)
        p, o = params, optimizer.init(params)
        for it in range(3):
            key = jax.random.PRNGKey(10 + it)
            text = rand_text(jax.random.PRNGKey(20 + it), 8)
            p, o, metrics = step(p, o, key, text, jnp.asarray(it, jnp.int32))
        results.append((p, float(metrics["L_vae"])))
    (p_ref, l_ref), (p_pp, l_pp) = results
    assert abs(l_ref - l_pp) < 1e-4
    assert max_leaf_diff(p_ref, p_pp) < 2e-3


def test_pp_hybrid_with_data_parallel():
    """dp=4 x pp=2 on the 8-device mesh: the PP model drops into the DP
    train step builder (parallel/mesh.py) unchanged — shard_map is manual
    over 'pipe' only, so GSPMD keeps sharding the microbatch rows over
    'data' and the gradient psum spans the data axis as usual."""
    cfg, model, params, rf = pp_setup()
    text = rand_text(jax.random.PRNGKey(2), 8)
    key = jax.random.PRNGKey(3)

    step, optimizer = make_train_step(model, cfg.vae, cfg.losses, rf,
                                      donate=False)
    p1, _, m1 = step(params, optimizer.init(params), key, text,
                     jnp.asarray(0, jnp.int32))

    mesh = parallel.get_mesh_pipe(2, dp=4)
    ppm = parallel.make_pp_model(model, mesh)
    dp_step, dp_opt = parallel.make_dp_train_step(
        ppm, cfg.vae, cfg.losses, rf, mesh, donate=False)
    p2, _, m2 = dp_step(parallel.replicate(mesh, params),
                        parallel.replicate(mesh, dp_opt.init(params)),
                        key, parallel.shard_batch(mesh, text),
                        jnp.asarray(0, jnp.int32))
    assert abs(float(m1["L_vae"]) - float(m2["L_vae"])) < 1e-4
    # Adam amplifies reduction-order noise (see trajectory test docstring)
    assert max_leaf_diff(p1, p2) < 2e-3


def test_pp_validation_errors():
    cfg, model, params, _ = pp_setup(n_layers=4)
    with pytest.raises(AssertionError, match="not divisible"):
        parallel.make_pp_model(model, parallel.get_mesh_pipe(3))
    # dropout must be off for the pipeline path
    cfg.model.G_args["T_args"]["p_dropout"] = 0.5
    bad = build_model(cfg.model, n_vocab=V, max_seq_len=T)
    with pytest.raises(AssertionError, match="p_dropout"):
        parallel.make_pp_model(bad, parallel.get_mesh_pipe(2))


def test_pp_adapts_microbatch_count_to_odd_batches():
    """A batch that doesn't divide the requested microbatch count adapts
    to gcd(B, M) instead of erroring — same outputs, bigger bubble."""
    _, model, params, _ = pp_setup()
    ppm = parallel.make_pp_model(model, parallel.get_mesh_pipe(4),
                                 n_micro=4)
    for B in (6, 5):   # gcd(6,4)=2 microbatches; gcd(5,4)=1 (sequential)
        text = rand_text(jax.random.PRNGKey(6), B)
        key = jax.random.PRNGKey(7)
        logits = model.forward(params, key, text, q_c="prior",
                               sample_z=1, train=True)[2]
        logits_pp = ppm.forward(params, key, text, q_c="prior",
                                sample_z=1, train=True)[2]
        assert float(jnp.abs(logits - logits_pp).max()) < 1e-5


def test_pp_cli_end_to_end(tmp_path):
    """main.py --hw.pp 2: phase-1 trains the transformer family through
    the GPipe schedule selected purely via CLI flags."""
    import os
    import main as main_mod

    argv = ["--tiny", "1", "--dataset", "synthetic", "--runname", "tfmpp",
            "--phase", "1", "--hw.pp", "2", "--hw.unroll", "1",
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
