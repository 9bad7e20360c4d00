import numpy as np
import pytest

pytestmark = pytest.mark.quick

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu.data import (
    AttributeDataLoader, Vocab, UNK_IDX, PAD_IDX, START_IDX, EOS_IDX)


def make_loader(path, mbsize=8, max_seq_len=25):
    cfg = C.default_config()
    cfg.dataset = "synthetic"
    spec = C.dataset_spec(cfg)
    spec["data_path"] = path
    return AttributeDataLoader(mbsize=mbsize, max_seq_len=max_seq_len, **spec)


def test_vocab_pinned_specials():
    v = Vocab.build([["A", "C", "A"], ["K", "K", "K"]])
    assert v.itos[:4] == ["<unk>", "<pad>", "<start>", "<eos>"]
    # freq-sorted, ties alphabetical
    assert v.itos[4] == "K"
    assert v.itos[5] == "A"
    assert v.stoi["C"] == 6


def test_vocab_to_ix_fixed_width():
    v = Vocab.build([list("ACK")])
    ixs = v.to_ix("A C K", fix_length=10)
    assert len(ixs) == 10
    assert ixs[0] == START_IDX
    assert ixs[4] == EOS_IDX
    assert all(i == PAD_IDX for i in ixs[5:])
    # truncation to fix_length-2 raw tokens
    long = v.to_ix(["A"] * 30, fix_length=10)
    assert len(long) == 10 and long[-1] == EOS_IDX
    # unknown token -> UNK
    assert v.to_ix("A Z", fix_length=6)[2] == UNK_IDX


def test_vocab_save_load_roundtrip(tmp_path):
    v = Vocab.build([list("ACDEFK")])
    fn = tmp_path / "vocab.dict"
    v.save(str(fn))
    v2 = Vocab.load(str(fn))
    assert v2.itos == v.itos


def test_loader_batches(synthetic_corpus):
    d = make_loader(synthetic_corpus)
    b = d.next_batch("train_vae")
    assert b.text.shape == (8, 25)
    assert b.text.dtype == np.int32
    assert (b.text[:, 0] == START_IDX).all()
    # every row has exactly one EOS (raw seqs <= 23 tokens)
    assert ((b.text == EOS_IDX).sum(axis=1) == 1).all()
    assert b.amp.shape == (8,)
    assert set(np.unique(b.amp)).issubset({-1, 0, 1})


def test_loader_splits_deterministic(synthetic_corpus):
    d1 = make_loader(synthetic_corpus)
    d2 = make_loader(synthetic_corpus)
    assert (d1.df.split == d2.df.split).all()
    frac_train = (d1.df.split == "train").mean()
    assert 0.75 < frac_train < 0.85


def test_subset_minilanguage(synthetic_corpus):
    d = make_loader(synthetic_corpus)
    pos = d.get_subset_indices("amp=amp_posc,amp_posnc")
    neg = d.get_subset_indices("amp=amp_negc,amp_negnc")
    has = d.get_subset_indices("amp")
    lacks = d.get_subset_indices("^amp")
    assert len(pos) + len(neg) == len(has)
    assert len(has) + len(lacks) == len(d.df)
    assert (d.labels["amp"][pos] == 1).all()
    assert (d.labels["amp"][neg] == 0).all()
    assert (d.labels["amp"][lacks] == -1).all()


def test_subset_minilanguage_negated_value_spec(synthetic_corpus):
    """'^col=v1,v2' selects rows NOT in the values (incl. NA rows) — the
    reference's get_mask crashes on this form; silently dropping the '^'
    would select the exact complement of the intent."""
    d = make_loader(synthetic_corpus)
    pos = d.get_subset_indices("amp=amp_posc,amp_posnc")
    notpos = d.get_subset_indices("^amp=amp_posc,amp_posnc")
    assert len(pos) + len(notpos) == len(d.df)
    assert not set(pos) & set(notpos)
    assert (d.labels["amp"][notpos] != 1).all()


def test_empty_subset_fails_loudly(synthetic_corpus):
    """A subset spec matching no rows must raise a descriptive error at
    iterator construction, not numpy's 'probabilities contain NaN' at the
    first next_batch."""
    from controlled_peptide_generation_tpu.data.loader import (
        _WeightedRandomIterator)
    with pytest.raises(ValueError, match="empty or zero-weight subset"):
        _WeightedRandomIterator(np.array([], np.int64), np.array([]),
                                batch_size=4, seed=0)


def test_weighted_upsampling(synthetic_corpus):
    d = make_loader(synthetic_corpus, mbsize=64)
    # labeled rows carry factor 20/10 vs 1 for unlabeled -> labeled must be
    # heavily over-represented vs its base rate
    counts = 0
    for _ in range(30):
        b = d.next_batch("train_vae")
        counts += (b.amp != -1).sum()
    frac_lab_sampled = counts / (30 * 64)
    frac_lab_base = (d.labels["amp"] != -1).mean()
    assert frac_lab_sampled > 2 * frac_lab_base


def test_idx2sentences_nesting(synthetic_corpus):
    d = make_loader(synthetic_corpus)
    b = d.next_batch("train_vae")
    sents = d.idx2sentences(b.text, print_special_tokens=False)
    assert isinstance(sents, list) and isinstance(sents[0], str)
    assert "<pad>" not in sents[0]
    one = d.idx2sentence(b.text[0])
    assert one.startswith("<start>")


def test_amp_corpus_ships_and_loads():
    """The curated real corpus under data/amp/ loads with the full amp spec:
    optional csvs (sol/anticancer/antihypertensive/cell-cell) are absent and
    must be tolerated as all-NA attribute columns (reference cfg.py:339-341
    lists them; create_datasets.py never emits them)."""
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = C.default_config()
    cfg.dataset = "amp"
    cfg.datapath = os.path.join(repo, "data")
    spec = C.dataset_spec(cfg)
    d = AttributeDataLoader(mbsize=8, max_seq_len=25, **spec)
    assert d.n_vocab == 24  # 4 specials + all 20 amino acids
    b = d.next_batch("train_vae")
    assert b.text.shape == (8, 25)
    # never-shipped attributes come through as the 'na' mapping (-1)
    assert (b.sol == -1).all() and (b.anticancer == -1).all()
    # labeled iterators still work
    assert d.subset_sizes["hld_amppos"] > 0
    assert d.subset_sizes["hld_ampneg"] > 0


def test_loader_missing_required_csv_raises(tmp_path):
    cfg = C.default_config()
    cfg.dataset = "synthetic"
    spec = C.dataset_spec(cfg)
    spec["data_path"] = str(tmp_path)  # empty dir
    import pytest
    with pytest.raises(FileNotFoundError):
        AttributeDataLoader(mbsize=4, max_seq_len=25, **spec)
