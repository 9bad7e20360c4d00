
import pytest

pytestmark = pytest.mark.quick
import numpy as np
import pandas as pd

from controlled_peptide_generation_tpu.evals import alignment, peptide_evals
from controlled_peptide_generation_tpu.evals.peptide_evals import (
    PeptideEvaluator, compute_modlamp)


def align(a, b):
    L = max(len(a), len(b))
    ac, al = alignment.encode_seqs([a], L)
    bc, bl = alignment.encode_seqs([b], L)
    return float(alignment.align_scores(ac, bc, al, bl)[0])


def test_alignment_hand_computed():
    # identical: sum of diagonal BLOSUM62 entries
    assert align("AA", "AA") == 8.0            # A-A = 4
    assert align("ACDE", "ACDE") == 4 + 9 + 6 + 5
    assert align("W", "W") == 11.0
    # one insertion: match + gap open
    assert align("A", "AA") == 4 - 10
    # gap of length 3: open + 2 * extend
    assert align("A", "AAAA") == 4 - 10 - 2
    # mismatch vs gap tradeoff: substitution wins over two gaps
    assert align("AW", "AY") == 4 + 2          # W-Y = 2


def test_alignment_batched_matches_single():
    pairs = [("KKLL", "KKLL"), ("ACD", "WYV"), ("MKT", "MKTAA")]
    L = 8
    ac, al = alignment.encode_seqs([p[0] for p in pairs], L)
    bc, bl = alignment.encode_seqs([p[1] for p in pairs], L)
    batch = np.asarray(alignment.align_scores(ac, bc, al, bl))
    singles = [align(a, b) for a, b in pairs]
    np.testing.assert_allclose(batch, singles)


def _gotoh_reference(a, b, open_=-10.0, ext=-1.0):
    """Plain-python 3-state affine-gap global alignment (textbook Gotoh)."""
    S = alignment.BLOSUM62
    ix = alignment.AA_TO_IX
    n, m = len(a), len(b)
    NEG = float("-inf")
    M = [[NEG] * (m + 1) for _ in range(n + 1)]
    Ix = [[NEG] * (m + 1) for _ in range(n + 1)]   # gap in b (consumes a)
    Iy = [[NEG] * (m + 1) for _ in range(n + 1)]   # gap in a (consumes b)
    M[0][0] = 0.0
    for i in range(1, n + 1):
        Ix[i][0] = open_ + (i - 1) * ext
    for j in range(1, m + 1):
        Iy[0][j] = open_ + (j - 1) * ext
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = float(S[ix[a[i - 1]], ix[b[j - 1]]])
            M[i][j] = max(M[i - 1][j - 1], Ix[i - 1][j - 1],
                          Iy[i - 1][j - 1]) + s
            Ix[i][j] = max(M[i - 1][j] + open_, Ix[i - 1][j] + ext)
            Iy[i][j] = max(M[i][j - 1] + open_, Iy[i][j - 1] + ext)
    return max(M[n][m], Ix[n][m], Iy[n][m])


def test_alignment_gap_direction_switch_not_an_extension():
    """Column-0 boundary regression: a vertical->horizontal gap switch
    must cost a second gap OPEN, not an extension. The buggy carry seed
    scored these -20 / -14 instead of the affine optima -22 / -16."""
    assert align("WWWWWWWWWW", "P") == -22.0
    assert align("PPPP", "W") == -16.0


def test_alignment_matches_bruteforce_gotoh():
    rng = np.random.default_rng(0)
    aas = alignment.AA_ORDER
    pairs = []
    for _ in range(25):
        la = int(rng.integers(1, 12))
        lb = int(rng.integers(1, 12))
        pairs.append(("".join(rng.choice(list(aas), la)),
                      "".join(rng.choice(list(aas), lb))))
    L = 12
    ac, al = alignment.encode_seqs([p[0] for p in pairs], L)
    bc, bl = alignment.encode_seqs([p[1] for p in pairs], L)
    batch = np.asarray(alignment.align_scores(ac, bc, al, bl))
    ref = [_gotoh_reference(a, b) for a, b in pairs]
    np.testing.assert_allclose(batch, ref)


def test_heuristics_degenerate_specials_only():
    """A collapsed model can emit only special-token sequences: every rec
    cleans to '' — must report degenerate stats, not ZeroDivisionError."""
    ev = peptide_evals.PeptideEvaluator()
    stats = ev.heuristics(["<unk> <unk>", "<pad>"])
    assert stats["avg_size"] == 0.0
    assert stats["av_n_p"] == 0.0


def test_slerp_identical_endpoints_no_nan():
    """slerp between parallel endpoints is the omega->0 limit = linear;
    must not emit NaN rows (deviation: reference api.py:189-193 divides
    by sin(0))."""
    from controlled_peptide_generation_tpu.api import interpolate_z
    z = np.random.default_rng(0).normal(size=(1, 16)).astype(np.float32)
    z_list, weights = interpolate_z(z, z, method="slerp", n_samples=3)
    assert np.isfinite(z_list).all()
    np.testing.assert_allclose(z_list, np.repeat(z, 5, axis=0), rtol=1e-6)


def test_clean_sequence_filters_specials():
    assert peptide_evals.clean_sequence("A C K") == "ACK"
    assert peptide_evals.clean_sequence("A <pad> C") == ""
    assert peptide_evals.clean_sequence("<start> A") == ""


def test_charge_and_moment():
    assert peptide_evals.calculate_charge("KKDD") == 0
    assert peptide_evals.calculate_charge("KRKR") == 4
    assert peptide_evals.calculate_charge("AAAA") == 0
    # single residue: moment == |H|
    hv = peptide_evals.assign_hydrophobicity("K")
    assert abs(peptide_evals.calculate_moment(hv) - 1.10) < 1e-6
    # uniform residues along a helix partially cancel
    hv4 = peptide_evals.assign_hydrophobicity("LLLL")
    assert peptide_evals.calculate_moment(hv4) < 0.53


def test_heuristics_aggregate():
    ev = PeptideEvaluator()
    res = ev.heuristics(["K K L L", "A A A A"])
    assert res["avg_size"] == 4.0
    assert 0 < res["av_n_c"] < 1
    comp = ev.aa_composition(["K K L L"])
    assert comp["K"] == 0.5 and comp["L"] == 0.5


def test_similarity_self_vs_random():
    ev = PeptideEvaluator()
    seqs_a = ["K K L L K K L L", "L L K K L L K K"]
    res, av = ev.similarity(seqs_a, seqs_a, matrix_size=2)
    assert len(res["sim"]) > 0
    assert np.isfinite(av)


def test_compute_modlamp_columns():
    df = pd.DataFrame({"peptide": ["K K L L", "", "A C D E"]})
    out = compute_modlamp(df)
    assert set(["H", "uH", "charge"]).issubset(out.columns)
    assert out.loc[0, "charge"] == 2.0
    assert out.loc[1, "H"] == 0.0
    assert out.loc[2, "charge"] == -2.0


def test_modlamp_from_tokens_matches_scalar_path():
    """Vectorized token-matrix physchem == compute_modlamp on the decoded
    strings, row for row (the pipeline's host fast path)."""
    from controlled_peptide_generation_tpu.data import Vocab
    from controlled_peptide_generation_tpu.evals.peptide_evals import (
        modlamp_from_tokens)
    rng = np.random.default_rng(0)
    v = Vocab.build([list("ACDEFGHIKLMNPQRSTVWY")])
    toks = rng.integers(0, len(v), size=(64, 25)).astype(np.int32)
    toks[:, 0] = 2  # START
    toks[5] = 1     # all-PAD row -> empty peptide
    peps = v.to_sentences_batch(toks, print_special_tokens=False)
    ref = compute_modlamp(pd.DataFrame({"peptide": peps}))
    H, uH, charge = modlamp_from_tokens(toks, v.itos)
    np.testing.assert_allclose(H, ref["H"].to_numpy(), atol=1e-12)
    np.testing.assert_allclose(uH, ref["uH"].to_numpy(), atol=1e-12)
    np.testing.assert_allclose(charge, ref["charge"].to_numpy(), atol=0)


def test_to_sentences_batch_matches_per_row():
    from controlled_peptide_generation_tpu.data import Vocab
    rng = np.random.default_rng(1)
    v = Vocab.build([list("ACDEFK")])
    toks = rng.integers(0, len(v), size=(32, 12)).astype(np.int32)
    for pst in (True, False):
        fast = v.to_sentences_batch(toks, print_special_tokens=pst)
        slow = [v.to_sentence(r, print_special_tokens=pst) for r in toks]
        assert fast == slow
