"""Whole-scan fused Pallas beam (ops/pallas_beam.py) vs the XLA scan path.

Interpret mode executes the kernel body as plain jnp on CPU, so these run
everywhere; on the TPU backend the same dispatch compiles to Mosaic. The
padding scheme is exact (zero weight columns, -inf logit lanes, gate
sections padded independently), so TOKENS must match the XLA path
exactly. Scores are compared to a last-ulp tolerance: reductions over the
128-lane padded vocab axis group their reduction tree differently than
XLA's V-wide reduce (adding the zero/neg-inf pads is exact, but the
grouping of the real terms shifts), which moves logsumexp by ~1 ulp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import beam as beam_mod
from controlled_peptide_generation_tpu.ops import pallas_beam

pytestmark = pytest.mark.quick

# Kernel-vs-XLA TOKEN equality is an interpret-mode logic invariant: on
# real TPU the MXU's bf16-pass fp32 matmuls give the two arms different
# rounding, so near-tie rows flip (~6% at campaign scale, BENCH_DETAILS
# "divergence" — quality parity, not bit parity). Hardware behavior is
# guarded by tests/test_pallas_beam_tpu.py (structure, score recompute,
# compaction equality, batch-shape invariance) + the divergence protocol.
_interpret_only = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="arm token-equality is interpret-mode-only; hardware guards "
           "live in tests/test_pallas_beam_tpu.py")



@pytest.fixture(scope="module")
def model_and_params():
    cfg = C.default_config()
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=13, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(42))
    return model, params


def _both_paths(model, params, z, c, K, n_best, min_length=1):
    beam_mod.set_pallas_beam(False)
    try:
        ref = beam_mod.beam_search(model, params, z, c, beam_size=K,
                                   n_best=n_best, min_length=min_length)
        ref = jax.tree.map(np.asarray, ref)
    finally:
        beam_mod.set_pallas_beam(None)
    jax.clear_caches()
    beam_mod.set_pallas_beam(True)
    try:
        got = beam_mod.beam_search(model, params, z, c, beam_size=K,
                                   n_best=n_best, min_length=min_length)
        got = jax.tree.map(np.asarray, got)
    finally:
        beam_mod.set_pallas_beam(None)
        jax.clear_caches()
    return ref, got


@pytest.mark.parametrize("seed,K,n_best", [(0, 5, 3), (1, 4, 1), (2, 3, 3)])
@_interpret_only
def test_matches_xla_beam(model_and_params, seed, K, n_best):
    model, params = model_and_params
    kz, kc = jax.random.split(jax.random.PRNGKey(seed))
    B = 9
    z = model.sample_z_prior(kz, B)
    c = model.sample_c_prior(kc, B)
    (h_ref, s_ref), (h_pl, s_pl) = _both_paths(model, params, z, c, K,
                                               n_best)
    np.testing.assert_array_equal(h_ref, h_pl)
    np.testing.assert_allclose(s_ref, s_pl, rtol=1e-5, atol=1e-6)


@_interpret_only
def test_tile_boundary_and_padding(model_and_params):
    """B crossing a 128-lane tile boundary: padded sentences must not
    perturb real ones, and output slicing must drop them exactly."""
    model, params = model_and_params
    kz, kc = jax.random.split(jax.random.PRNGKey(7))
    B = 131
    z = model.sample_z_prior(kz, B)
    c = model.sample_c_prior(kc, B)
    (h_ref, s_ref), (h_pl, s_pl) = _both_paths(model, params, z, c, 5, 3)
    np.testing.assert_array_equal(h_ref, h_pl)
    np.testing.assert_allclose(s_ref, s_pl, rtol=1e-5, atol=1e-6)


@_interpret_only
def test_min_length_blocking(model_and_params):
    model, params = model_and_params
    kz, kc = jax.random.split(jax.random.PRNGKey(11))
    z = model.sample_z_prior(kz, 6)
    c = model.sample_c_prior(kc, 6)
    (h_ref, s_ref), (h_pl, s_pl) = _both_paths(model, params, z, c, 5, 3,
                                               min_length=4)
    np.testing.assert_array_equal(h_ref, h_pl)
    np.testing.assert_allclose(s_ref, s_pl, rtol=1e-5, atol=1e-6)


@_interpret_only
def test_bf16_decode_dtype(model_and_params):
    """The production fused round casts params/latents to bfloat16; both
    paths must agree there too (same matmul/gate dtypes either side)."""
    model, params = model_and_params
    from controlled_peptide_generation_tpu.ops import nn
    kz, kc = jax.random.split(jax.random.PRNGKey(3))
    z = model.sample_z_prior(kz, 8)
    c = model.sample_c_prior(kc, 8)
    p16 = nn.cast_tree(params, jnp.bfloat16)
    z16, c16 = z.astype(jnp.bfloat16), c.astype(jnp.bfloat16)
    (h_ref, s_ref), (h_pl, s_pl) = _both_paths(model, p16, z16, c16, 5, 1)
    np.testing.assert_array_equal(h_ref, h_pl)
    # bf16 matmuls accumulate fp32 on both paths, but the padded
    # contraction may tile differently on real hardware; on CPU interpret
    # they are exact — keep a tolerance so the test also passes on TPU.
    np.testing.assert_allclose(s_ref, s_pl, rtol=2e-2, atol=2e-2)


def test_hw_pallas_beam_cli_flag():
    """--hw.pallas_beam is the user-facing route control: every CLI goes
    through config.finalize, which pushes the tristate into ops.beam."""
    try:
        C.parse_and_finalize(["--hw.pallas_beam", "off"])
        assert beam_mod.pallas_beam_enabled() is False
        C.parse_and_finalize(["--hw.pallas_beam", "on"])
        assert beam_mod.pallas_beam_enabled() is True
        C.parse_and_finalize(["--hw.pallas_beam", "0"])
        assert beam_mod.pallas_beam_enabled() is False
        C.parse_and_finalize(["--hw.pallas_beam", "auto"])
        expect = jax.default_backend() == "tpu"
        assert beam_mod.pallas_beam_enabled() == expect
        with pytest.raises(ValueError):
            C.parse_and_finalize(["--hw.pallas_beam", "maybe"])
    finally:
        beam_mod.set_pallas_beam(None)
        jax.clear_caches()


@_interpret_only
def test_hw_pallas_beam_flag_through_pipeline(model_and_params):
    """Pipeline-level flip: decode_from_z under --hw.pallas_beam off must
    reproduce the oracle-exact XLA tokens bit-for-bit, and under on must
    route through the kernel (interpret mode off-TPU, itself bit-exact)."""
    from controlled_peptide_generation_tpu import pipeline

    class _DS:
        @staticmethod
        def idx2sentences(toks, print_special_tokens=False):
            return [" ".join(map(str, row)) for row in np.asarray(toks)]

    model, params = model_and_params
    z = np.asarray(model.sample_z_prior(jax.random.PRNGKey(5), 12))

    outs = {}
    for mode in ("off", "on"):
        C.parse_and_finalize(["--hw.pallas_beam", mode])
        try:
            jax.clear_caches()
            outs[mode] = pipeline.decode_from_z(
                z, model, params, _DS, chunk=8, beam_size=5)
        finally:
            beam_mod.set_pallas_beam(None)
            jax.clear_caches()
    assert outs["off"] == outs["on"]


def test_applicability_gate():
    cfg = C.default_config()
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    model = build_model(cfg.model, n_vocab=13, max_seq_len=10)
    assert pallas_beam.applicable(model, 5, jnp.float32)
    assert not pallas_beam.applicable(model, 12, jnp.float32)  # K > V-2
    assert not pallas_beam.applicable(model, 5, jnp.float16)
    cfg.model.G_args.GRU_args.skip_connections = True
    model_skip = build_model(cfg.model, n_vocab=13, max_seq_len=10)
    assert not pallas_beam.applicable(model_skip, 5, jnp.float32)
    cfg2 = C.default_config()
    cfg2.model.G_args.G_class = "deconv"
    model_dc = build_model(cfg2.model, n_vocab=13, max_seq_len=10)
    assert not pallas_beam.applicable(model_dc, 5, jnp.float32)


def test_set_block_b_none_restores_default():
    from controlled_peptide_generation_tpu.ops import pallas_gru, pallas_tfm_beam
    default = pallas_beam.BLOCK_B
    try:
        pallas_beam.set_block_b(32)
        assert pallas_beam.BLOCK_B == 32
        pallas_beam.set_block_b(None)
        assert pallas_beam.BLOCK_B == default
        pallas_gru.set_block_b(16)
        pallas_gru.set_block_b(None)
        assert pallas_gru.BLOCK_B == 64
        pallas_tfm_beam.set_block_b(8)
        pallas_tfm_beam.set_block_b(None)
        assert pallas_tfm_beam.BLOCK_B is None  # None = per-dtype auto pick
        assert pallas_tfm_beam.default_block_b(jnp.float32) == 16
        assert pallas_tfm_beam.default_block_b(jnp.bfloat16) == 32
    finally:
        pallas_beam.set_block_b(None)
        pallas_gru.set_block_b(None)
        pallas_tfm_beam.set_block_b(None)
