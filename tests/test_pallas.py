"""Pallas kernels vs the XLA reference paths (interpret mode on CPU).

On real TPU the kernels run interpreted here too (interpret=True), but
the XLA reference side executes fp32 matmuls as MXU bf16 passes, so the
comparison carries accumulation noise — tolerances are backend-aware
(same calibration as tests/test_pallas_gru.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from controlled_peptide_generation_tpu.ops import gru as G
from controlled_peptide_generation_tpu.ops import losses as L
from controlled_peptide_generation_tpu.ops import pallas_kernels as PK

_TPU = jax.default_backend() == "tpu"
_TOLS = (dict(rtol=5e-3, atol=3e-3) if _TPU
         else dict(rtol=1e-5, atol=1e-5))


def test_gru_pallas_matches_xla():
    key = jax.random.PRNGKey(0)
    B, T, D, H = 8, 12, 10, 16
    params = G.init_gru_params(key, D, H)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (B, T, D))
    h0 = jnp.zeros((B, H))

    hs_ref, hT_ref = G.gru_scan(params, xs, h0)
    hs_pl, hT_pl = PK.gru_scan_pallas(params, xs, h0, interpret=True)
    np.testing.assert_allclose(np.asarray(hs_pl), np.asarray(hs_ref),
                               **_TOLS)
    np.testing.assert_allclose(np.asarray(hT_pl), np.asarray(hT_ref),
                               **_TOLS)


def test_gru_pallas_reverse():
    key = jax.random.PRNGKey(1)
    B, T, D, H = 4, 7, 6, 8
    params = G.init_gru_params(key, D, H)
    xs = jax.random.normal(jax.random.fold_in(key, 2), (B, T, D))
    h0 = jnp.zeros((B, H))
    hs_ref, hT_ref = G.gru_scan(params, xs, h0, reverse=True)
    hs_pl, hT_pl = PK.gru_scan_pallas(params, xs, h0, reverse=True,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(hT_pl), np.asarray(hT_ref),
                               **_TOLS)
    np.testing.assert_allclose(np.asarray(hs_pl), np.asarray(hs_ref),
                               **_TOLS)


def test_mmd_pallas_matches_xla():
    key = jax.random.PRNGKey(2)
    z1 = jax.random.normal(key, (32, 10))
    z2 = jax.random.normal(jax.random.fold_in(key, 1), (32, 10))
    ref = float(L.mmd_full_kernel(z1, z2, sigma=7.0))
    got = float(PK.mmd_full_pallas(z1, z2, sigma=7.0, interpret=True))
    assert abs(ref - got) < (1e-3 if _TPU else 1e-5)
