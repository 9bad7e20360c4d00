"""Host-side data pipeline feeding fixed-shape int32 batches to the device.

Re-implements the reference's data layer (data_processing/dataset.py) without
torchtext: merge N csv files keyed by sequence text, 80/10/10 seeded split,
subset mini-language, per-row sample weights with upsample factors, infinite
weighted-multinomial iterators, and a vocabulary with pinned special indices.

TPU-first departures from the reference:

* every batch is a fixed-shape ``(B, max_seq_len)`` int32 array
  ([START] + <=max_seq_len-2 tokens + [EOS] + PAD), so every downstream jit
  compiles exactly once (the reference got this via torchtext fix_length,
  dataset.py:243);
* the whole corpus is pre-tokenized into one contiguous int32 matrix at load
  time, so drawing a batch is a single fancy-index gather — no per-batch
  Python object churn.
"""

import csv
import io
import logging
import os
import random
from collections import defaultdict
from types import SimpleNamespace

import numpy as np
import pandas as pd

from .vocab import Vocab, PAD_IDX

LOG = logging.getLogger(__name__)

# csv files the amp spec lists but the released curation never emits
# (reference cfg.py:339-341 expects them; create_datasets.py:566-617 only
# writes unlab/amp_lab/tox_lab and, with extra inputs, sol_lab) — absence
# is tolerated with a warning instead of the reference's hard crash
OPTIONAL_CSV_FILES = frozenset({
    "sol_lab.csv", "anticancer.csv", "antihypertensive.csv",
    "cell-cell.csv",
})


class _WeightedRandomIterator:
    """Infinite batches sampled i.i.d. from a multinomial with replacement
    (reference: dataset.py:60-77)."""

    def __init__(self, indices, weights, batch_size, seed, block=128):
        self.indices = np.asarray(indices)
        p = np.asarray(weights, dtype=np.float64)
        if p.size == 0 or p.sum() <= 0.0:
            # fail HERE with the cause, not later inside rng.choice with
            # numpy's opaque 'probabilities contain NaN' (happens when a
            # subset spec matches no rows of a custom corpus)
            raise ValueError(
                "empty or zero-weight subset: the iterator's subset "
                f"specifiers matched {p.size} rows (total weight "
                f"{p.sum() if p.size else 0.0}) — check the subset "
                "mini-language specs and corpus contents")
        self.p = p / p.sum()
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.repeat = True
        # draws are i.i.d. with replacement, so generating `block` batches
        # per rng.choice call is distribution-identical and amortizes the
        # O(N) cumsum that np pays per call (~30x at the reference corpus
        # size; the host must outpace ~1.7k device steps/sec when unrolled)
        self.block = block

    def __iter__(self):
        while True:
            draws = self.rng.choice(
                self.indices, size=(self.block, self.batch_size),
                replace=True, p=self.p)
            yield from draws

    def __len__(self):
        raise TypeError("infinite iterator")


class _ShuffledIterator:
    """Epoch-shuffled batches, optionally repeating (dataset.py:232)."""

    def __init__(self, indices, batch_size, seed, repeat):
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.repeat = repeat

    def __iter__(self):
        while True:
            order = self.rng.permutation(len(self.indices))
            for s in range(0, len(order), self.batch_size):
                yield self.indices[order[s:s + self.batch_size]]
            if not self.repeat:
                return

    def __len__(self):
        return -(-len(self.indices) // self.batch_size)


class AttributeDataLoader:
    """Merged multi-csv corpus with named subset iterators.

    Exposes ``next_batch(name)`` returning a SimpleNamespace with ``.text``
    (np.int32 [B, max_seq_len]) and one np.int64 [B] array per attribute.
    """

    def __init__(self, mbsize=32, max_seq_len=25, data_path=None,
                 csv_files=(), attributes=(), iteratorspecs=None,
                 split_seed=1238, fixed_vocab_path="", iterator_seed=7,
                 **_unused):
        self.mbsize = mbsize
        self.max_seq_len = max_seq_len
        self.attributes = list(attributes)
        self.attr_maps = dict(self.attributes)
        self._iterator_seed = iterator_seed
        self._warned_factors = set()

        self.df = self._read_csvs(data_path, csv_files, max_seq_len)
        self._compute_splits([0.8, 0.1, 0.1], split_seed)

        # vocab: fixed read-only file, or built from the train split
        if fixed_vocab_path:
            self.vocab = Vocab.load(fixed_vocab_path)
        else:
            train_texts = self.df.text[self.df.split == "train"]
            self.vocab = Vocab.build(t.split() for t in train_texts)
        self.n_vocab = len(self.vocab)

        # pre-tokenize the whole corpus once: (N, max_seq_len) int32.
        # The native C tokenizer is ~30x faster on large corpora and
        # byte-identical; the Python path is the always-available fallback
        texts = self.df.text.to_numpy()
        try:
            from ..native import tokenize_corpus
            self.tokens = tokenize_corpus(list(texts), self.vocab.stoi,
                                          max_seq_len)
        except ImportError:
            self.tokens = np.full((len(self.df), max_seq_len), PAD_IDX,
                                  dtype=np.int32)
            for row, text in enumerate(texts):
                self.tokens[row] = self.vocab.to_ix(text,
                                                    fix_length=max_seq_len)
        # integer labels per attribute: (N,) int64, 'na' -> mapped default
        self.labels = {}
        for name, mapping in self.attributes:
            col = self.df[name] if name in self.df.columns else None
            vals = np.empty(len(self.df), dtype=np.int64)
            for row in range(len(self.df)):
                raw = None if col is None else col.iloc[row]
                if raw is None or (isinstance(raw, float) and np.isnan(raw)):
                    raw = "na"
                if raw not in mapping:
                    raise KeyError(
                        f"Key {raw} not in mappingdict for attribute {name}")
                vals[row] = mapping[raw]
            self.labels[name] = vals

        self.iterators = {}
        self.subset_sizes = {}
        if iteratorspecs:
            its, _ = self.get_subset_iterators(iteratorspecs, mbsize)
            self.iterators = its
        self._iters = {k: iter(v) for k, v in self.iterators.items()}

    # ------------------------------------------------------------------
    # corpus construction
    # ------------------------------------------------------------------

    def _read_csvs(self, path, csv_files, max_seq_len):
        data = defaultdict(dict)
        found = 0
        for csv_file in csv_files:
            fn = os.path.join(path, csv_file)
            if not os.path.exists(fn) and csv_file in OPTIONAL_CSV_FILES:
                LOG.warning("optional corpus file %s not found; its "
                            "attribute column will be all-NA", fn)
                continue
            with io.open(fn, encoding="utf8") as f:
                for entry in csv.DictReader(f):
                    key = entry["text"].strip()
                    data[key].update(entry)
            found += 1
        if not found:
            raise FileNotFoundError(
                f"no corpus csv files found under {path} (looked for "
                f"{list(csv_files)})")
        rows = [data[k] for k in sorted(data.keys())]
        df = pd.DataFrame(rows)
        df["lens"] = df.text.apply(lambda x: len(x.strip().split()))
        df = df[df.lens <= max_seq_len].reset_index(drop=True)
        return df

    def _compute_splits(self, ratios, seed):
        # seeded Fisher-Yates over the (alphabetical) index, then contiguous
        # slices — bit-identical to the reference split (dataset.py:139-155)
        assert len(ratios) == 3 and sum(ratios) == 1.0
        n = len(self.df)
        rix = self.df.index.tolist()
        random.Random(seed).shuffle(rix)
        a, b = int(ratios[0] * n), int(ratios[1] * n)
        split = pd.Series(index=self.df.index, dtype=object)
        split.loc[rix[:a]] = "train"
        split.loc[rix[a:a + b]] = "val"
        split.loc[rix[a + b:]] = "test"
        self.df["split"] = split

    # ------------------------------------------------------------------
    # subset mini-language (dataset.py:157-181)
    # ------------------------------------------------------------------

    def get_mask(self, colspecifier):
        df = self.df
        negate = colspecifier.startswith("^")
        key = colspecifier[1:] if negate else colspecifier
        allowed = None
        if "=" in key:
            key, allowed = key.split("=")
        if key not in df.columns:
            # column absent when its (optional) csv was not shipped:
            # behaves as all-NA
            return pd.Series(negate, index=df.index)
        if allowed is not None:
            mask = df[key].isin(allowed.split(","))
            # '^col=v1,v2' = NOT one of the values; an extension of the
            # reference mini-language (its get_mask, dataset.py:170-181,
            # splits on '=' first, so '^col=val' crashes on KeyError
            # there — silently ignoring the '^' would select the exact
            # complement of the intent)
            return ~mask if negate else mask
        return df[key].isna() if negate else df[key].notna()

    def get_subset_indices(self, *colspecifiers):
        mask = pd.Series(True, index=self.df.index)
        for cs in colspecifiers:
            mask = mask & self.get_mask(cs)
        return np.flatnonzero(mask.to_numpy())

    def _sample_weights(self, indices, sample_prob_factors=None):
        """Upsample-factor weights: weight = max over matching factors,
        default 1 (dataset.py:183-199)."""
        w = np.ones(len(self.df), dtype=np.float64)
        if sample_prob_factors:
            for colspecifier, factor in sample_prob_factors.items():
                mask = self.get_mask(colspecifier).to_numpy()
                if not mask.any():
                    # optional attribute never shipped (e.g. 'sol' without
                    # sol_lab.csv): the factor simply has nothing to upsample
                    if colspecifier not in self._warned_factors:
                        self._warned_factors.add(colspecifier)
                        LOG.warning("sample factor %r matches no rows; "
                                    "ignored", colspecifier)
                    continue
                w[mask & (w < factor)] = factor
        return w[indices]

    def get_subset_iterators(self, iteratorspecs, mbsize):
        iterators, subsets = {}, {}
        for i, (name, spec) in enumerate(iteratorspecs.items()):
            spec = dict(spec)
            idx = self.get_subset_indices(*spec.pop("subset"))
            weighted = spec.pop("weighted_random_sample", False)
            repeat = spec.pop("repeat", True)
            seed = self._iterator_seed + 1000 * i
            if weighted:
                w = self._sample_weights(
                    idx, spec.pop("sample_prob_factors", None))
                iterators[name] = _WeightedRandomIterator(idx, w, mbsize,
                                                          seed)
            else:
                iterators[name] = _ShuffledIterator(idx, mbsize, seed, repeat)
            subsets[name] = idx
            self.subset_sizes[name] = len(idx)
        return iterators, subsets

    # ------------------------------------------------------------------
    # batches
    # ------------------------------------------------------------------

    def _make_batch(self, row_indices):
        batch = SimpleNamespace(text=self.tokens[row_indices])
        for name, _ in self.attributes:
            setattr(batch, name, self.labels[name][row_indices])
        return batch

    def next_batch(self, iterator_name):
        return self._make_batch(next(self._iters[iterator_name]))

    def iter_batches(self, iterator_name):
        for row_indices in self.iterators[iterator_name]:
            yield self._make_batch(row_indices)

    def print_stats(self, out=print):
        out(f"Vocab size: {self.n_vocab}")
        out("Vocab (first 50): " + " / ".join(self.vocab.itos[:50]))
        for name, size in self.subset_sizes.items():
            out(f"iterator {name:10s}: subset data size: {size:7d}")

    # ------------------------------------------------------------------
    # index -> text (dataset.py:288-300)
    # ------------------------------------------------------------------

    def idx2sentence(self, idxs, print_special_tokens=True):
        return self.vocab.to_sentence(idxs, print_special_tokens)

    def idx2sentences(self, idxs, print_special_tokens=True):
        idxs = np.asarray(idxs) if not isinstance(idxs, list) else idxs
        if isinstance(idxs, np.ndarray) and idxs.ndim == 2:
            return self.vocab.to_sentences_batch(idxs, print_special_tokens)
        first = idxs[0]
        if np.ndim(first) == 0:
            return self.idx2sentence(idxs, print_special_tokens)
        return [self.idx2sentences(s, print_special_tokens) for s in idxs]

    def idx2attr(self, idx, attr=None):
        name = attr or self.attributes[0][0]
        inv = {v: k for k, v in self.attr_maps[name].items()}
        return inv[idx]

    def idx2label(self, idx):
        return self.idx2attr(idx, self.attributes[0][0])
