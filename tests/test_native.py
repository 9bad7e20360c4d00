"""Native C tokenizer vs the Python reference path."""

import numpy as np
import pytest

from controlled_peptide_generation_tpu import native
from controlled_peptide_generation_tpu.data.vocab import (
    Vocab, PAD_IDX, START_IDX, EOS_IDX, UNK_IDX)

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native extension not built "
           "(python -m controlled_peptide_generation_tpu.native.build)")


def test_native_matches_python():
    texts = ["K K L L", "A", "", "A C D E F G H I K L M N P Q R S T V W Y",
             "A " * 40]   # includes truncation case
    texts = [t.strip() for t in texts]
    v = Vocab.build([list("ACDEFGHIKLMNPQRSTVWY")])
    nat = native.tokenize_corpus(texts, v.stoi, 25)
    py = np.stack([v.to_ix(t, fix_length=25) for t in texts]).astype(
        np.int32)
    np.testing.assert_array_equal(nat, py)


def test_native_unknown_token():
    v = Vocab.build([["A", "C"]])
    nat = native.tokenize_corpus(["A Z C"], v.stoi, 8)
    assert nat[0, 1] == v.stoi["A"]
    assert nat[0, 2] == UNK_IDX
    assert nat[0, 3] == v.stoi["C"]
    assert nat[0, 4] == EOS_IDX
    assert (nat[0, 5:] == PAD_IDX).all()
    assert nat[0, 0] == START_IDX


def test_native_multichar_token():
    v = Vocab(["<unk>", "<pad>", "<start>", "<eos>", "ALA", "K"])
    nat = native.tokenize_corpus(["ALA K ALA"], v.stoi, 8)
    assert list(nat[0, :5]) == [START_IDX, 4, 5, 4, EOS_IDX]


def test_loader_uses_native(synthetic_corpus):
    from tests.test_data import make_loader
    d = make_loader(synthetic_corpus)
    # parity against the python tokenizer on the same rows
    v = d.vocab
    py = np.stack([v.to_ix(t, fix_length=25) for t in d.df.text]).astype(
        np.int32)
    np.testing.assert_array_equal(d.tokens, py)
