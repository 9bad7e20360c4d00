"""Flat-vector Adam (train/opt.py) vs the optax reference chain.

The flat variant computes clip_by_global_norm + adam on one raveled
vector; math is identical up to float re-association (the global norm
sums squares in a different order), so single-step updates agree
tightly and multi-step trajectories drift only at float-noise scale.
Reference optimizer contract: /root/reference/train_vae.py:39-42,
cfg.py:234-236 (Adam lr 1e-3, global-norm clip 5.0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.train.opt import (make_optimizer,
                                                         flat_adam)
from controlled_peptide_generation_tpu.train.train_vae import (
    make_train_step)

pytestmark = pytest.mark.quick


def _quad_setup():
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (64, 32)),
              "b": {"x": jax.random.normal(jax.random.fold_in(key, 1),
                                           (128,)),
                    "y": jax.random.normal(jax.random.fold_in(key, 2),
                                           (7, 3, 5))}}
    tgt = jax.tree.map(lambda p: p * 0.5 + 1.0, params)

    def loss(p):
        diffs = jax.tree.map(lambda a, b: jnp.sum((a - b) ** 2), p, tgt)
        return sum(jax.tree.leaves(diffs))

    return params, loss


@pytest.mark.parametrize("scale", [1.0, 100.0])
def test_matches_optax_chain(scale):
    """Same updates as optax.chain(clip, adam) in both clip regimes
    (scale=100 pushes the global norm far above the 5.0 threshold)."""

    class V:  # minimal cfgv
        lr, clip_grad = 1e-3, 5.0

    params, loss = _quad_setup()
    params = jax.tree.map(lambda p: p * scale, params)
    ref = make_optimizer(V, flat=False)
    fl = make_optimizer(V, flat=True)
    p_r = p_f = params
    s_r, s_f = ref.init(p_r), fl.init(p_f)
    for _ in range(25):
        g_r = jax.grad(loss)(p_r)
        u_r, s_r = ref.update(g_r, s_r, p_r)
        p_r = jax.tree.map(lambda p, u: p + u, p_r, u_r)
        g_f = jax.grad(loss)(p_f)
        u_f, s_f = fl.update(g_f, s_f, p_f)
        p_f = jax.tree.map(lambda p, u: p + u, p_f, u_f)
    for a, b in zip(jax.tree.leaves(p_r), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6 * scale)


def test_flat_state_donatable():
    """init() must produce distinct m/v buffers: the donated train step
    donates every opt-state leaf, and an aliased zeros array trips XLA's
    'donate the same buffer twice' dispatch check (regression: the tiny
    TPU run died with an opaque deferred INVALID_ARGUMENT)."""

    params = {"w": jnp.ones((33,)), "b": jnp.ones((5, 2))}
    tx = flat_adam(1e-3, 5.0)
    st = tx.init(params)
    assert st.m.unsafe_buffer_pointer() != st.v.unsafe_buffer_pointer()

    @jax.jit
    def step(p, s):
        g = jax.tree.map(jnp.ones_like, p)
        u, s = tx.update(g, s, p)
        return jax.tree.map(lambda a, b: a + b, p, u), s

    donated = jax.jit(step.__wrapped__, donate_argnums=(0, 1))
    p2, s2 = donated(params, st)
    jax.block_until_ready((p2, s2))


def test_flat_train_step_trajectory(tmp_path):
    """The real phase-1 train step under hw.flat_optimizer stays on the
    optax trajectory at float-noise scale over 20 steps."""
    cfg = C.default_config()
    cfg.vae.update(cfg.shared)
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=26, max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = L.init_rf_basis(jax.random.PRNGKey(9), model.z_dim,
                         cfg.losses.wae_mmd.rf_dim)
    text = jax.random.randint(jax.random.PRNGKey(4), (8, cfg.max_seq_len),
                              4, 26, jnp.int32)
    text = text.at[:, 0].set(2).at[:, 14].set(3)

    outs = {}
    for flat in (False, True):
        from controlled_peptide_generation_tpu.train import opt as opt_mod
        opt_mod.set_flat_optimizer(flat)
        try:
            step, opt = make_train_step(model, cfg.vae, cfg.losses, rf,
                                        donate=False)
            p = jax.tree.map(jnp.copy, params)
            st = opt.init(p)
            for i in range(20):
                p, st, m = step(p, st, jax.random.PRNGKey(i), text,
                                jnp.asarray(i, jnp.int32))
            outs[flat] = (p, float(m["L_vae"]))
        finally:
            opt_mod.set_flat_optimizer(None)
    p_ref, loss_ref = outs[False]
    p_flat, loss_flat = outs[True]
    assert abs(loss_ref - loss_flat) < 5e-3 * max(abs(loss_ref), 1.0)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_checkpoint_layout_flip_raises(tmp_path):
    """Flipping hw.flat_optimizer across a resume must raise an error
    naming the flag — not an opaque missing-key KeyError (strict) or a
    silent moment reset (strict=False). ADVICE round 4 (train/opt.py:21)."""
    import optax
    from controlled_peptide_generation_tpu.train import checkpoints
    from controlled_peptide_generation_tpu.train.opt import flat_adam

    params = {"enc": {"W": jnp.ones((3, 2))}, "b": jnp.zeros(2)}
    chain = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    flat = flat_adam(1e-3, 5.0)

    path = str(tmp_path / "model_10.npz")
    checkpoints.save(path, {"params": params, "opt": chain.init(params)})
    tmpl_flat = {"params": params, "opt": flat.init(params)}
    for strict in (True, False):
        with pytest.raises(ValueError, match="hw.flat_optimizer"):
            checkpoints.load(path, tmpl_flat, strict=strict)

    # and the mirror direction: flat on disk, optax template
    path2 = str(tmp_path / "model_20.npz")
    checkpoints.save(path2, {"params": params, "opt": flat.init(params)})
    tmpl_chain = {"params": params, "opt": chain.init(params)}
    with pytest.raises(ValueError, match="hw.flat_optimizer"):
        checkpoints.load(path2, tmpl_chain)

    # matching layouts still round-trip in both layouts
    st = checkpoints.load(path, {"params": params,
                                 "opt": chain.init(params)})
    assert st["params"]["enc"]["W"].shape == (3, 2)
    st2 = checkpoints.load(path2, tmpl_flat)
    assert st2["opt"].m.shape == st2["opt"].v.shape
