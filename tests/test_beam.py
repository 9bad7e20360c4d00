"""Batched on-device beam search vs an independent per-sentence oracle.

The oracle is a straightforward numpy implementation of the documented beam
semantics (log-prob accumulation, BOS/EOS blocking, EOS-children blocking,
first-advance-from-beam-0, finished-list with insertion order, eos-top
termination, pad-to-n_best finalization, backpointer walk). It drives the
same jax decoder one sentence at a time, reordering hidden states by origin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops.beam import beam_search
from controlled_peptide_generation_tpu.data.vocab import (
    PAD_IDX, START_IDX, EOS_IDX)

NEG = -1e20


class OracleBeam:
    def __init__(self, K, n_best, min_length=1):
        self.K, self.n_best, self.min_length = K, n_best, min_length
        self.scores = np.zeros(K)
        self.prev_ks = []
        self.next_ys = [np.full(K, PAD_IDX, np.int64)]
        self.next_ys[0][0] = START_IDX
        self.eos_top = False
        self.finished = []

    def advance(self, logp):
        V = logp.shape[1]
        cur_len = len(self.next_ys)
        wp = logp.copy()
        for k in range(self.K):
            if cur_len < self.min_length:
                wp[k][EOS_IDX] = NEG
            wp[k][START_IDX] = NEG
        if self.prev_ks:
            bs = wp + self.scores[:, None]
            for i in range(self.K):
                if self.next_ys[-1][i] == EOS_IDX:
                    bs[i] = NEG
            flat = bs.reshape(-1)
        else:
            flat = wp[0]
        ids = np.argsort(-flat, kind="stable")[:self.K]
        self.scores = flat[ids]
        self.prev_ks.append(ids // V)
        self.next_ys.append(ids % V)
        for i in range(self.K):
            if self.next_ys[-1][i] == EOS_IDX:
                self.finished.append(
                    (self.scores[i], len(self.next_ys) - 1, i))
        if self.next_ys[-1][0] == EOS_IDX:
            self.eos_top = True

    def done(self):
        return self.eos_top and len(self.finished) >= self.n_best

    def origin(self):
        return self.prev_ks[-1]

    def state(self):
        return self.next_ys[-1]

    def sort_finished(self):
        finished = list(self.finished)
        i = 0
        while len(finished) < self.n_best:
            finished.append((self.scores[i], len(self.next_ys) - 1, i))
            i += 1
        finished.sort(key=lambda a: -a[0])
        return finished

    def get_hyp(self, t, k):
        hyp = []
        for j in range(t - 1, -2, -1):
            hyp.append(int(self.next_ys[j + 1][k]))
            k = int(self.prev_ks[j][k])
        return hyp[::-1]


def oracle_decode(model, params, z, c, K, n_best, max_len):
    """Per-sentence beam driver over the jax decoder."""
    B = z.shape[0]
    out_hyps, out_scores = [], []
    for b in range(B):
        zb = jnp.tile(z[b:b + 1], (K, 1))
        cb = jnp.tile(c[b:b + 1], (K, 1))
        h = jnp.tile(model.init_decoder_hidden(params, z[b:b + 1],
                                               c[b:b + 1]), (K, 1))
        beam = OracleBeam(K, n_best)
        for _ in range(max_len):
            if beam.done():
                break
            tok = jnp.asarray(beam.state(), jnp.int32)
            logits, h_new = model.decode_step(params, tok, None, zb, cb, h)
            logp = np.asarray(jax.nn.log_softmax(logits, axis=-1),
                              np.float64)
            beam.advance(logp)
            h = h_new[jnp.asarray(beam.origin())]
        fin = beam.sort_finished()[:n_best]
        hyps = [beam.get_hyp(t, k) for _, t, k in fin]
        padded = np.full((n_best, max_len + 1), PAD_IDX, np.int64)
        for i, hyp in enumerate(hyps):
            padded[i, :len(hyp)] = hyp
        out_hyps.append(padded)
        out_scores.append([s for s, _, _ in fin])
    return np.stack(out_hyps), np.array(out_scores)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = C.default_config()
    cfg.model.z_dim = 12
    cfg.model.emb_dim = 10
    cfg.model.E_args.h_dim = 8
    model = build_model(cfg.model, n_vocab=13, max_seq_len=10)
    params = model.init_params(jax.random.PRNGKey(42))
    return model, params


@pytest.mark.parametrize("seed,K,n_best", [(0, 4, 3), (1, 5, 1), (2, 3, 3)])
def test_beam_matches_oracle(model_and_params, seed, K, n_best):
    model, params = model_and_params
    key = jax.random.PRNGKey(seed)
    kz, kc = jax.random.split(key)
    B = 6
    z = model.sample_z_prior(kz, B)
    c = model.sample_c_prior(kc, B)

    hyps, scores = beam_search(model, params, z, c, beam_size=K,
                               n_best=n_best, max_len=model.max_seq_len)
    ref_hyps, ref_scores = oracle_decode(model, params, z, c, K, n_best,
                                         model.max_seq_len)
    np.testing.assert_array_equal(np.asarray(hyps), ref_hyps)
    np.testing.assert_allclose(np.asarray(scores), ref_scores,
                               rtol=1e-4, atol=1e-5)


def test_beam_output_contract(model_and_params):
    model, params = model_and_params
    key = jax.random.PRNGKey(3)
    z = model.sample_z_prior(key, 4)
    c = model.sample_c_prior(key, 4)
    hyps, scores = beam_search(model, params, z, c, beam_size=5, n_best=3)
    hyps = np.asarray(hyps)
    assert hyps.shape == (4, 3, model.max_seq_len + 1)
    # column 0 is the BOS row token
    assert (hyps[:, :, 0] == START_IDX).all()
    # scores sorted descending per sentence
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # no START generated inside hypotheses
    assert not (hyps[:, :, 1:] == START_IDX).any()


def test_backtrace_matches_numpy_walk():
    """The scan-emitting backtrace must match a plain python/numpy
    pointer walk exactly on random pointer tables."""
    import numpy as np
    from controlled_peptide_generation_tpu.ops.beam import _backtrace
    from controlled_peptide_generation_tpu.data.vocab import PAD_IDX
    rng = np.random.default_rng(0)
    T, K = 9, 4
    for trial in range(5):
        ys = rng.integers(0, 20, (T + 1, K)).astype(np.int32)
        ptrs = rng.integers(0, K, (T, K)).astype(np.int32)
        t = int(rng.integers(0, T + 1))
        k = int(rng.integers(0, K))
        want = np.full(T + 1, PAD_IDX, np.int32)
        k_cur = k
        for p_ in range(t, 0, -1):
            want[p_] = ys[p_, k_cur]
            k_cur = ptrs[p_ - 1, k_cur]
        want[0] = ys[0, k_cur]
        got = np.asarray(_backtrace(jnp.asarray(t), jnp.asarray(k),
                                    jnp.asarray(ys), jnp.asarray(ptrs), T))
        np.testing.assert_array_equal(want, got)
