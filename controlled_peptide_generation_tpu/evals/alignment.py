"""Batched global sequence alignment (Needleman-Wunsch-Gotoh) on device.

Replaces Biopython's pairwise2.align.globalds used by the reference's
similarity eval (evals/peptide_evals.py:199-222): global alignment with the
BLOSUM62 substitution matrix and affine gaps (open -10, extend -1; a gap of
length L costs open + (L-1)*extend; end gaps penalized). Only the optimal
score is computed — the reference consumes scores, not alignments.

The DP is a lax.scan over rows with an inner scan over columns, vmapped over
pairs: ~10^4 25x25 alignments run in one device program.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

AA_ORDER = "ARNDCQEGHILKMFPSTWYV"
AA_TO_IX = {a: i for i, a in enumerate(AA_ORDER)}

# standard BLOSUM62 (half-bit scores), rows/cols in AA_ORDER
BLOSUM62 = np.array([
    [4, -1, -2, -2, 0, -1, -1, 0, -2, -1, -1, -1, -1, -2, -1, 1, 0, -3, -2, 0],
    [-1, 5, 0, -2, -3, 1, 0, -2, 0, -3, -2, 2, -1, -3, -2, -1, -1, -3, -2, -3],
    [-2, 0, 6, 1, -3, 0, 0, 0, 1, -3, -3, 0, -2, -3, -2, 1, 0, -4, -2, -3],
    [-2, -2, 1, 6, -3, 0, 2, -1, -1, -3, -4, -1, -3, -3, -1, 0, -1, -4, -3, -3],
    [0, -3, -3, -3, 9, -3, -4, -3, -3, -1, -1, -3, -1, -2, -3, -1, -1, -2, -2, -1],
    [-1, 1, 0, 0, -3, 5, 2, -2, 0, -3, -2, 1, 0, -3, -1, 0, -1, -2, -1, -2],
    [-1, 0, 0, 2, -4, 2, 5, -2, 0, -3, -3, 1, -2, -3, -1, 0, -1, -3, -2, -2],
    [0, -2, 0, -1, -3, -2, -2, 6, -2, -4, -4, -2, -3, -3, -2, 0, -2, -2, -3, -3],
    [-2, 0, 1, -1, -3, 0, 0, -2, 8, -3, -3, -1, -2, -1, -2, -1, -2, -2, 2, -3],
    [-1, -3, -3, -3, -1, -3, -3, -4, -3, 4, 2, -3, 1, 0, -3, -2, -1, -3, -1, 3],
    [-1, -2, -3, -4, -1, -2, -3, -4, -3, 2, 4, -2, 2, 0, -3, -2, -1, -2, -1, 1],
    [-1, 2, 0, -1, -3, 1, 1, -2, -1, -3, -2, 5, -1, -3, -1, 0, -1, -3, -2, -2],
    [-1, -1, -2, -3, -1, 0, -2, -3, -2, 1, 2, -1, 5, 0, -2, -1, -1, -1, -1, 1],
    [-2, -3, -3, -3, -2, -3, -3, -3, -1, 0, 0, -3, 0, 6, -4, -2, -2, 1, 3, -1],
    [-1, -2, -2, -1, -3, -1, -1, -2, -2, -3, -3, -1, -2, -4, 7, -1, -1, -4, -3, -2],
    [1, -1, 1, 0, -1, 0, 0, 0, -1, -2, -2, 0, -1, -2, -1, 4, 1, -3, -2, -2],
    [0, -1, 0, -1, -1, -1, -1, -2, -2, -1, -1, -1, -1, -2, -1, 1, 5, -2, -2, 0],
    [-3, -3, -4, -4, -2, -2, -3, -2, -2, -3, -2, -3, -1, 1, -4, -3, -2, 11, 2, -3],
    [-2, -2, -2, -3, -2, -1, -2, -3, 2, -1, -1, -2, -1, 3, -3, -2, -2, 2, 7, -1],
    [0, -3, -3, -3, -1, -2, -2, -3, -3, 3, 1, -2, 1, -1, -2, -2, 0, -3, -1, 4],
], np.float32)

NEG = -1e9


def encode_seqs(seqs, max_len):
    """Residue strings -> (int codes [N, max_len], lengths [N])."""
    codes = np.zeros((len(seqs), max_len), np.int32)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        s = s[:max_len]
        lens[i] = len(s)
        for j, a in enumerate(s):
            codes[i, j] = AA_TO_IX[a]
    return codes, lens


def _align_pair(a, b, la, lb, S, L, gap_open, gap_extend):
    """Gotoh global alignment score for one padded pair."""
    j_ix = jnp.arange(L + 1)
    # row 0 boundary
    m0 = jnp.where(j_ix == 0, 0.0, NEG)
    ix0 = jnp.full((L + 1,), NEG)
    iy0 = jnp.where(j_ix == 0, NEG,
                    gap_open + (j_ix - 1) * gap_extend)

    sub_all = S[a][:, b]                       # [L, L] substitution scores

    def row(carry, inp):
        M_prev, Ix_prev, Iy_prev, result = carry
        i, sub_row = inp                        # i in 1..L
        ix_j0 = gap_open + (i - 1) * gap_extend

        def col(c, inp_j):
            m_left, iy_left = c
            mp_jm1, ixp_jm1, iyp_jm1, mp_j, ixp_j, sub = inp_j
            m_ij = jnp.maximum(jnp.maximum(mp_jm1, ixp_jm1), iyp_jm1) + sub
            ix_ij = jnp.maximum(mp_j + gap_open, ixp_j + gap_extend)
            iy_ij = jnp.maximum(m_left + gap_open, iy_left + gap_extend)
            return (m_ij, iy_ij), (m_ij, ix_ij, iy_ij)

        inps = (M_prev[:-1], Ix_prev[:-1], Iy_prev[:-1],
                M_prev[1:], Ix_prev[1:], sub_row)
        # carry = (M(i, j-1), Iy(i, j-1)); both NEG at j=1: column 0 has
        # no match state and no horizontal-gap state (nothing of b is
        # consumed yet) — seeding iy_left with the vertical-gap value
        # ix_j0 would price a vertical->horizontal gap switch as a gap
        # EXTENSION instead of a new open (measured: 'WWWWWWWWWW' vs 'P'
        # scored -20 instead of the affine optimum -22)
        (_, _), (m_r, ix_r, iy_r) = jax.lax.scan(col, (NEG, NEG), inps)
        M_row = jnp.concatenate([jnp.array([NEG]), m_r])
        Ix_row = jnp.concatenate([jnp.array([ix_j0]), ix_r])
        Iy_row = jnp.concatenate([jnp.array([NEG]), iy_r])
        v = jnp.maximum(jnp.maximum(M_row[lb], Ix_row[lb]), Iy_row[lb])
        result = jnp.where(i == la, v, result)
        return (M_row, Ix_row, Iy_row, result), None

    # i == 0 corner: empty vs b[:lb] -> pure gap (or 0 if both empty)
    init_res = jnp.where(lb == 0, 0.0, iy0[lb])
    init_res = jnp.where(la == 0, init_res, NEG)
    (_, _, _, result), _ = jax.lax.scan(
        row, (m0, ix0, iy0, init_res),
        (jnp.arange(1, L + 1), sub_all))
    return result


@partial(jax.jit, static_argnames=("gap_open", "gap_extend"))
def align_scores(a_codes, b_codes, a_lens, b_lens,
                 gap_open=-10.0, gap_extend=-1.0):
    """Batched optimal global alignment scores.

    a_codes/b_codes: [P, L] int residue codes; a_lens/b_lens: [P].
    Returns [P] float scores.
    """
    S = jnp.asarray(BLOSUM62)
    L = a_codes.shape[1]
    fn = partial(_align_pair, S=S, L=L, gap_open=gap_open,
                 gap_extend=gap_extend)
    return jax.vmap(fn)(a_codes, b_codes, a_lens, b_lens)
