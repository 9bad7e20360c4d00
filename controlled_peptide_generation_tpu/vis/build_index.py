"""Latent state dump + exact on-device similarity index.

Reference: vis/scripts/build_index.py — encode up to max_examples per split
with q_c='classifier', sample_z='max' and append (src, z, mu, logvar, label,
split) to gzip'd resizable h5 datasets named states_{split}_{iter}.h5,
consumed by sample_pipeline and the vis scripts.

TPU-first changes: the encode sweep is one jitted batch program; the faiss
inner-product flat index is replaced by exact on-device top-k MIPS — at
z_dim=100 and <=1e6 rows the whole index is a single [Q,D]x[D,N] matmul
(mips_topk below), so there is no approximate-index build step at all.
"""

import logging
import os
from functools import partial

import h5py
import jax
import jax.numpy as jnp
import numpy as np

LOG = logging.getLogger("GenerationAPI")

H5_SETS = ("src", "z", "mu", "logvar", "label", "split")
SPLIT_ENCODING = {"train": 0, "val": 1, "test": 2}


def states_path(base_folder, split, n_iter):
    return os.path.join(base_folder, f"states_{split}_{n_iter}.h5")


def _write_states(path, cfg, n_attrs, rows):
    """rows: dict of stacked arrays keyed by H5_SETS."""
    if os.path.isfile(path):
        os.remove(path)
    with h5py.File(path, "w") as f:
        specs = {
            "src": ((None, cfg.max_seq_len), "int"),
            "z": ((None, cfg.model.z_dim), "float16"),
            "mu": ((None, cfg.model.z_dim), "float16"),
            "logvar": ((None, cfg.model.z_dim), "float16"),
            "label": ((None, n_attrs), "int"),
            "split": ((None, 1), "int"),
        }
        for name, (maxshape, dtype) in specs.items():
            f.create_dataset(name, data=rows[name], maxshape=maxshape,
                             dtype=dtype, compression="gzip",
                             compression_opts=9)


def extract_from_dataset(model, params, vocab, cfg, dataset, base_folder,
                         n_iter_num, max_examples=10000):
    """Encode each split and dump states h5 files. Returns paths dict."""
    assert dict(enumerate(dataset.vocab.itos)) == dict(
        enumerate(vocab.itos)), "dataloader vocab needs to match"

    spec = {
        s: {"subset": [f"split={s}"], "weighted_random_sample": True,
            "sample_prob_factors": _present_factors(cfg, dataset)}
        for s in ("train", "val", "test")
    }
    iterators, _ = dataset.get_subset_iterators(spec, cfg.vae.batch_size)

    @jax.jit
    def encode_batch(text):
        (mu, logvar), (z, c), _ = model.forward(
            params, jax.random.PRNGKey(0), text, q_c="classifier",
            sample_z="max", train=False)
        return mu, logvar, z

    attr_names = [a for a, _ in dataset.attributes]
    paths = {}
    CHUNK = 512   # device dispatch granularity, independent of train mbsize
    for split, iterator in iterators.items():
        LOG.info("Encoding up to %d samples for split %s",
                 max_examples, split)
        # draw the row indices first (host-only), then encode in large
        # fixed-shape chunks: ~20 device dispatches instead of ~2000
        idx_parts, count = [], 0
        for row_idx in iterator:
            idx_parts.append(row_idx[:max_examples - count])
            count += len(idx_parts[-1])
            if count >= max_examples:
                break
        all_idx = np.concatenate(idx_parts)
        batch = dataset._make_batch(all_idx)
        text = batch.text
        mus, logvars, zs = [], [], []
        takes = []
        for s in range(0, len(all_idx), CHUNK):
            chunk = text[s:s + CHUNK]
            pad = CHUNK - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)])
            mu, logvar, z = encode_batch(jnp.asarray(chunk))
            takes.append(CHUNK - pad)
            mus.append(mu)        # stay on device; dispatches queue async
            logvars.append(logvar)
            zs.append(z)
        # one stacked transfer per tensor instead of one per chunk (each
        # host fetch pays a full device round trip)
        mus, logvars, zs = (
            [np.asarray(r)[:t] for r, t in zip(np.asarray(jnp.stack(parts)),
                                               takes)]
            for parts in (mus, logvars, zs))
        labels = np.stack([getattr(batch, a) for a in attr_names], axis=1)
        rows = {
            "src": text,
            "mu": np.concatenate(mus),
            "logvar": np.concatenate(logvars),
            "z": np.concatenate(zs),
            "label": labels,
            "split": np.full((count, 1), SPLIT_ENCODING[split], np.int64),
        }
        path = states_path(base_folder, split, n_iter_num)
        _write_states(path, cfg, len(attr_names), rows)
        paths[split] = path
        LOG.info("Wrote %d states to %s", count, path)
    return paths


def _present_factors(cfg, dataset):
    """Keep only upsample factors whose columns exist in this corpus."""
    cols = set(dataset.df.columns)
    out = {}
    for colspec, f in dict(cfg.amp_sample_prob_factors).items():
        col = colspec.split("=")[0].lstrip("^")
        if col in cols:
            try:
                if dataset.get_mask(colspec).any():
                    out[colspec] = f
            except KeyError:
                continue
    return out


def read_states(path):
    with h5py.File(path, "r") as f:
        return {k: f[k][:] for k in H5_SETS}


# ---------------------------------------------------------------------------
# exact MIPS index (faiss IndexFlatIP replacement)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k",))
def mips_topk(queries, index_z, k=10):
    """Exact inner-product top-k: queries [Q,D] x index [N,D] -> one matmul
    + top_k. Returns (scores [Q,k], indices [Q,k])."""
    sims = queries @ index_z.T
    return jax.lax.top_k(sims, k)


def index_path(base_folder, n_iter):
    """The persisted index artifact for iteration n_iter — the rebuild's
    counterpart of the reference's ``index_{iter}.faiss``
    (reference vis/scripts/build_index.py:174-176). Format deviation
    (MIGRATING.md): a .npz with the fp32 z matrix + schema metadata —
    the index IS one matmul at these shapes, so the artifact stores the
    exact data instead of a faiss graph."""
    return os.path.join(base_folder, f"index_{n_iter}.npz")


class LatentIndex:
    """Exact inner-product index over dumped z states."""

    _SCHEMA = 1

    def __init__(self, z):
        self.z = jnp.asarray(z, jnp.float32)

    @classmethod
    def from_states(cls, path):
        return cls(read_states(path)["z"])

    def save(self, path):
        """Persist so a later process can load without the states h5
        (the reference's faiss.write_index contract,
        vis/scripts/build_index.py:174-176)."""
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez_compressed(
                fh, z=np.asarray(self.z, np.float32),
                schema=np.asarray(self._SCHEMA),
                metric=np.asarray("inner_product"))
        os.replace(tmp, path)
        LOG.info("wrote latent index (%d x %d) to %s",
                 self.z.shape[0], self.z.shape[1], path)
        return path

    @classmethod
    def load(cls, path):
        with np.load(path) as data:
            if int(data["schema"]) != cls._SCHEMA:
                raise ValueError(
                    f"{path}: unsupported index schema "
                    f"{int(data['schema'])} (expected {cls._SCHEMA})")
            return cls(data["z"])

    def search(self, queries, k=10):
        scores, idx = mips_topk(jnp.asarray(queries, jnp.float32),
                                self.z, k=k)
        return np.asarray(scores), np.asarray(idx)
