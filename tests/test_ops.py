"""Kernel-level parity tests: GRU vs torch.nn.GRU, losses vs torch formulas."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.quick
import torch
import torch.nn.functional as F

from controlled_peptide_generation_tpu.ops import gru as G
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.data.vocab import PAD_IDX


def torch_gru_params(tg, h_dim):
    """Copy torch GRU weights into our pre-transposed layout."""
    return {
        "wi": jnp.asarray(tg.weight_ih_l0.detach().numpy().T),
        "wh": jnp.asarray(tg.weight_hh_l0.detach().numpy().T),
        "bi": jnp.asarray(tg.bias_ih_l0.detach().numpy()),
        "bh": jnp.asarray(tg.bias_hh_l0.detach().numpy()),
    }


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_scan_matches_torch(reverse):
    torch.manual_seed(0)
    B, T, D, H = 4, 7, 10, 8
    tg = torch.nn.GRU(D, H, batch_first=True)
    params = torch_gru_params(tg, H)
    x = np.random.default_rng(0).normal(size=(B, T, D)).astype(np.float32)

    xt = torch.from_numpy(x if not reverse else x[:, ::-1].copy())
    with torch.no_grad():
        out_t, h_t = tg(xt, None)
    hs, h_last = G.gru_scan(params, jnp.asarray(x), jnp.zeros((B, H)),
                            reverse=reverse)
    np.testing.assert_allclose(np.asarray(h_last),
                               h_t.squeeze(0).numpy(), atol=1e-5)
    if not reverse:
        np.testing.assert_allclose(np.asarray(hs), out_t.numpy(), atol=1e-5)


def test_gru_cell_single_step():
    torch.manual_seed(1)
    B, D, H = 3, 6, 5
    tg = torch.nn.GRU(D, H, batch_first=True)
    params = torch_gru_params(tg, H)
    x = np.random.default_rng(1).normal(size=(B, 1, D)).astype(np.float32)
    h0 = np.random.default_rng(2).normal(size=(B, H)).astype(np.float32)
    with torch.no_grad():
        _, h_t = tg(torch.from_numpy(x), torch.from_numpy(h0[None]))
    h = G.gru_cell(params, jnp.asarray(x[:, 0]), jnp.asarray(h0))
    np.testing.assert_allclose(np.asarray(h), h_t.squeeze(0).numpy(),
                               atol=1e-5)


def test_recon_dec_matches_torch_ce():
    rng = np.random.default_rng(3)
    B, T, V = 5, 9, 12
    seqs = rng.integers(0, V, size=(B, T)).astype(np.int32)
    seqs[:, -2:] = PAD_IDX
    logits = rng.normal(size=(B, T, V)).astype(np.float32)

    ours = float(L.recon_dec(jnp.asarray(seqs), jnp.asarray(logits)))

    pad_col = np.full((B, 1), PAD_IDX, dtype=np.int64)
    targets = np.concatenate([seqs[:, 1:].astype(np.int64), pad_col], axis=1)
    theirs = F.cross_entropy(
        torch.from_numpy(logits).reshape(-1, V),
        torch.from_numpy(targets).reshape(-1),
        reduction="mean", ignore_index=PAD_IDX).item()
    assert abs(ours - theirs) < 1e-5


def test_kl_closed_forms():
    rng = np.random.default_rng(4)
    mu = rng.normal(size=(6, 10)).astype(np.float32)
    lv = rng.normal(size=(6, 10)).astype(np.float32)
    kl = float(L.kl_gaussianprior(jnp.asarray(mu), jnp.asarray(lv)))
    ref = np.mean(0.5 * np.sum(np.exp(lv) + mu**2 - 1 - lv, axis=1))
    assert abs(kl - ref) < 1e-4
    # mu=0, logvar=0 -> KL = 0
    assert abs(float(L.kl_gaussianprior(jnp.zeros((3, 4)),
                                        jnp.zeros((3, 4))))) < 1e-7
    ks = float(L.kl_gaussian_sharedmu(jnp.asarray(mu), jnp.asarray(lv)))
    refs = np.mean(0.5 * np.sum(np.exp(lv) - 1 - lv, axis=1))
    assert abs(ks - refs) < 1e-4


def test_mmd_full_kernel_reference_quirk():
    """Reproduce the reference formula numerically, including the
    diag-row-broadcast subtraction (losses.py:47-57)."""
    rng = np.random.default_rng(5)
    z1 = rng.normal(size=(8, 4)).astype(np.float32)
    z2 = rng.normal(size=(8, 4)).astype(np.float32)
    sigma = 7.0

    def k(x, y):
        d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
        return np.exp(-d / sigma**2)

    H = k(z1, z1) + k(z2, z2) - 2 * k(z1, z2)
    H = H - np.diag(H)[None, :]          # row-broadcast, like torch.diag(H)
    ref = H.sum() / (8 * 7)
    ours = float(L.mmd_full_kernel(jnp.asarray(z1), jnp.asarray(z2), sigma))
    assert abs(ours - ref) < 1e-5


def test_mmd_statistics():
    """MMD-RF between two large samples of the same distribution ~ 0,
    differing distributions >> 0."""
    key = jax.random.PRNGKey(0)
    k1, k2, k3, kb = jax.random.split(key, 4)
    za = jax.random.normal(k1, (2000, 10))
    zb = jax.random.normal(k2, (2000, 10))
    zc = jax.random.normal(k3, (2000, 10)) * 3.0 + 1.0
    rf_w, rf_b = L.init_rf_basis(kb, 10, 500)
    same = float(L.mmd_rf(za, zb, rf_w, rf_b, sigma=7.0))
    diff = float(L.mmd_rf(za, zc, rf_w, rf_b, sigma=7.0))
    assert same < 0.005
    assert diff > 10 * same


def test_losses_differentiable():
    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (16, 10))
    rf_w, rf_b = L.init_rf_basis(key, 10, 64)

    g1 = jax.grad(lambda z: L.mmd_full_kernel(z, jnp.zeros_like(z), 7.0))(z)
    g2 = jax.grad(lambda z: L.mmd_rf(z, jnp.zeros_like(z), rf_w, rf_b, 7.0))(z)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
