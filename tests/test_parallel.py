"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu import parallel
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.train import make_train_step
from controlled_peptide_generation_tpu.latent import gmm, logreg


@pytest.fixture(scope="module")
def setup():
    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=14, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(1), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    return cfg, model, params, rf


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = parallel.get_mesh(8)
    assert mesh.devices.size == 8


def test_dp_step_matches_single_device(setup):
    cfg, model, params, rf = setup
    mesh = parallel.get_mesh(8)
    B = 16
    text = jax.random.randint(jax.random.PRNGKey(2), (B, 10), 4, 14)
    text = text.at[:, 0].set(2).at[:, 7].set(3).astype(jnp.int32)
    key = jax.random.PRNGKey(3)
    it = jnp.asarray(0, jnp.int32)

    single_step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                       donate=False)
    opt_state = opt.init(params)
    p1, o1, m1 = single_step(params, opt_state, key, text, it)

    dp_step, opt2 = parallel.make_dp_train_step(
        model, cfg.vae, cfg.losses, rf, mesh, donate=False)
    p_r = parallel.replicate(mesh, params)
    o_r = parallel.replicate(mesh, opt2.init(params))
    t_s = parallel.shard_batch(mesh, text)
    p2, o2, m2 = dp_step(p_r, o_r, key, t_s, it)

    # identical math: same loss and same updated params across the mesh
    assert abs(float(m1["L_vae"]) - float(m2["L_vae"])) < 1e-4
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_dp_batch_actually_sharded(setup):
    cfg, model, params, rf = setup
    mesh = parallel.get_mesh(8)
    text = jnp.ones((16, 10), jnp.int32)
    t_s = parallel.shard_batch(mesh, text)
    # 8 shards of 2 rows each
    assert len(t_s.addressable_shards) == 8
    assert t_s.addressable_shards[0].data.shape == (2, 10)


def test_sharded_rejection_round():
    mesh = parallel.get_mesh(8)
    D = 12
    q = gmm.GMMParams(weights=jnp.ones((3,)) / 3,
                      means=jnp.zeros((3, D)),
                      covars=jnp.ones((3, D)))
    clf_w = jnp.zeros((2, D))
    clf_b = jnp.array([0.0, 0.0])
    targets = jnp.array([1, 0])
    n = 800
    z, probs, accum, accept = parallel.dp_rejection_round(
        mesh, ("gmm_diag", q), clf_w, clf_b, targets,
        jax.random.PRNGKey(0), n)
    assert z.shape == (n, D)
    assert len(z.addressable_shards) == 8
    # flat heads: p=0.5 each, product 0.25 accept rate
    assert abs(float(jnp.mean(accept)) - 0.25) < 0.05
    np.testing.assert_allclose(np.asarray(accum), 0.25, atol=1e-5)


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert float(out[0]) > 0
    g.dryrun_multichip(8)


def test_dp_fused_round_matches_single_device():
    """The mesh-sharded fused CLaSS round must reproduce the single-device
    fused round exactly (same key -> same draws; per-candidate work has no
    cross-device coupling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu import config as C, parallel
    from controlled_peptide_generation_tpu.latent import (density, fused,
                                                          logreg)
    from controlled_peptide_generation_tpu.models import build_model

    cfg = C.default_config()
    cfg.model.z_dim = 8
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=14, max_seq_len=8)
    params = model.init_params(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)
    mu = 0.3 * jax.random.normal(key, (200, model.z_dim))
    lv = jnp.full((200, model.z_dim), -1.5)
    Q = density.mogQ(np.asarray(mu), np.asarray(lv), n_components=4,
                     z_num_samples=2, covariance_type="diag", key=key)
    w = jnp.zeros(model.z_dim).at[0].set(1.0)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w, b=jnp.asarray(0.1)),
         "tox": logreg.LogRegParams(w=-w, b=jnp.asarray(-0.2))},
        {"amp": 1, "tox": 0})

    n = 64
    z1, s1, a1, t1 = fused.fused_round(model, params, key, Q, n,
                                       decode_dtype="float32")
    mesh = parallel.get_mesh(4)
    z2, s2, a2, t2 = parallel.dp_fused_round(mesh, model, params, key, Q,
                                             n, decode_dtype="float32")
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   atol=1e-6)


def test_dp_compact_round_matches_single_device():
    """Accepted-only decode under the mesh: the sharded compact round must
    reproduce the single-device compact round exactly (the accepted-first
    compaction is a deterministic global sort+gather)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu import config as C, parallel
    from controlled_peptide_generation_tpu.latent import (density, fused,
                                                          logreg)
    from controlled_peptide_generation_tpu.models import build_model

    cfg = C.default_config()
    cfg.model.z_dim = 8
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=14, max_seq_len=8)
    params = model.init_params(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(2)
    mu = 0.3 * jax.random.normal(key, (200, model.z_dim))
    lv = jnp.full((200, model.z_dim), -1.5)
    Q = density.mogQ(np.asarray(mu), np.asarray(lv), n_components=4,
                     z_num_samples=2, covariance_type="diag", key=key)
    w = jnp.zeros(model.z_dim).at[0].set(1.0)
    Q.init_attr_classifiers(
        {"amp": logreg.LogRegParams(w=w, b=jnp.asarray(0.1)),
         "tox": logreg.LogRegParams(w=-w, b=jnp.asarray(-0.2))},
        {"amp": 1, "tox": 0})

    n, cap = 64, 32
    z1, s1, a1, t1, i1, v1 = fused.fused_round(
        model, params, key, Q, n, decode_dtype="float32", capacity=cap)
    mesh = parallel.get_mesh(4)
    z2, s2, a2, t2, i2, v2 = parallel.dp_fused_round(
        mesh, model, params, key, Q, n, decode_dtype="float32",
        capacity=cap)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    m = np.asarray(v1)
    assert m.any(), "test needs at least one accepted candidate"
    np.testing.assert_array_equal(np.asarray(i1)[m], np.asarray(i2)[m])
    np.testing.assert_array_equal(np.asarray(t1)[m], np.asarray(t2)[m])
    np.testing.assert_allclose(np.asarray(z1)[m], np.asarray(z2)[m],
                               atol=1e-6)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k])[m],
                                   np.asarray(s2[k])[m], atol=1e-6)


def test_dp_train_step_resamples_rf_basis():
    """rf_basis=None (losses.wae_mmd.rf_resample) must resample the RF
    basis per step under DP too — identical inputs at different iteration
    keys give different mmdrf values."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controlled_peptide_generation_tpu import config as C, parallel
    from controlled_peptide_generation_tpu.models import build_model

    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=14, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = parallel.get_mesh(4)
    step, opt = parallel.make_dp_train_step(model, cfg.vae, cfg.losses,
                                            None, mesh, donate=False)
    p = parallel.replicate(mesh, params)
    o = parallel.replicate(mesh, opt.init(params))
    text = parallel.shard_batch(
        mesh, jnp.ones((8, 10), jnp.int32).at[:, 0].set(2) * 1 + 3)
    key = jax.random.PRNGKey(5)
    _, _, m1 = step(p, o, jax.random.fold_in(key, 0), text,
                    jnp.asarray(0, jnp.int32))
    _, _, m2 = step(p, o, jax.random.fold_in(key, 1), text,
                    jnp.asarray(0, jnp.int32))
    assert np.isfinite(float(m1["L_wae_mmdrf"]))
    # same params/batch/beta, different key -> different resampled basis
    assert float(m1["L_wae_mmdrf"]) != float(m2["L_wae_mmdrf"])


def test_dp_fused_round_outputs_sharded_per_device():
    """Every device owns exactly its n/D slice of the fused round: the
    output arrays are laid out as one shard per mesh device (no silent
    single-device execution + broadcast)."""
    cfg = C.default_config()
    cfg.model.z_dim = 8
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=14, max_seq_len=8)
    params = model.init_params(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)

    class _Q:
        pass
    Q = _Q()
    w = jnp.zeros(model.z_dim).at[0].set(1.0)
    Q.attr_clfs = {"amp": logreg.LogRegParams(w=w, b=jnp.asarray(0.1))}
    Q.clf_targets = {"amp": 1}
    qp = gmm.GMMParams(weights=jnp.ones((2,)) / 2,
                       means=jnp.zeros((2, model.z_dim)),
                       covars=jnp.ones((2, model.z_dim)))
    Q._sampler = lambda: ("gmm_diag", qp)

    n_dev, n = 8, 64
    mesh = parallel.get_mesh(n_dev)
    z, scores, accept, tokens = parallel.dp_fused_round(
        mesh, model, params, key, Q, n, decode_dtype="float32")
    for name, arr in [("z", z), ("accept", accept), ("tokens", tokens)]:
        shards = arr.addressable_shards
        assert len(shards) == n_dev, (name, len(shards))
        devices = {s.device for s in shards}
        assert len(devices) == n_dev, f"{name} not spread over the mesh"
        for s in shards:
            assert s.data.shape[0] == n // n_dev, (name, s.data.shape)
