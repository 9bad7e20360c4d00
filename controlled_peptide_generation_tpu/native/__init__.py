"""Native (C) host-runtime components with pure-Python fallbacks.

Build once with:  python -m controlled_peptide_generation_tpu.native.build
The loader auto-uses the extension when present; otherwise the Python path
in data/vocab.py runs (identical output, slower on large corpora).
"""

import numpy as np

from ..data.vocab import UNK_IDX, PAD_IDX, START_IDX, EOS_IDX

try:
    from . import _tokenizer as _ext
except ImportError:
    _ext = None


def available():
    return _ext is not None


def tokenize_corpus(texts, stoi, max_len):
    """list[str] (space-separated residue tokens) -> int32 [n, max_len]."""
    if _ext is None:
        raise ImportError(
            "native tokenizer not built; run "
            "python -m controlled_peptide_generation_tpu.native.build")
    raw = _ext.tokenize_corpus(list(texts), dict(stoi), int(max_len),
                               PAD_IDX, START_IDX, EOS_IDX, UNK_IDX)
    arr = np.frombuffer(raw, dtype="<i4").reshape(len(texts), max_len)
    return np.ascontiguousarray(arr)
