"""Host-side artifact IO (reference: utils.py:18-49)."""

import os


def check_dir_exists(fn):
    fn_dir = os.path.dirname(fn)
    if fn_dir and not os.path.exists(fn_dir):
        os.makedirs(fn_dir, exist_ok=True)


def write_gen_samples(samples, fn, c_lab=None):
    """samples: list of strings. c_lab (optional): sequence of labels."""
    check_dir_exists(fn)
    with open(fn, "w+") as f:
        if c_lab is not None:
            assert len(c_lab) == len(samples), "sizes dont match"
            f.writelines(f"label: {y}\n{s}\n" for y, s in zip(c_lab, samples))
        else:
            f.write("\n".join(samples) + "\n")


def save_vocab(vocab, fn):
    """Write 'word ix' lines, the reference vocab file format (utils.py:42)."""
    check_dir_exists(fn)
    with open(fn, "w", encoding="utf-8") as f:
        for word, ix in vocab.stoi.items():
            f.write(f"{word} {ix}\n")


def write_fasta(samples, fn):
    """Write one FASTA record per sample string of residues."""
    check_dir_exists(fn)
    with open(fn, "w") as f:
        for i, s in enumerate(samples):
            s = s.replace(" ", "")
            if s:
                f.write(f"> {i + 1} {len(s)}\n{s}\n")
