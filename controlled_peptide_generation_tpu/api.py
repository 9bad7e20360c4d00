"""Inference / eval API (reference: api.py).

Load a trained checkpoint, encode single sequences, sample, reconstruct and
interpolate — the surface consumed by static_eval and the sampling pipeline.
All device math is jitted through the model's pure functions; the z-space
interpolation schemes (linear / tanh / slerp) are pure numpy host math on
tiny arrays, as in the reference (api.py:152-205).
"""

import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from numpy.linalg import norm

from .data.vocab import Vocab
from .models import build_model
from .train import checkpoints
from .generation import generate_sentences

LOG = logging.getLogger("GenerationAPI")


def load_trained_model(model_path, n_vocab, cfg):
    """Returns (model, params). Non-strict load: params missing from the
    checkpoint keep their fresh-init values (reference api.py:91-94)."""
    model = build_model(cfg.model, n_vocab=n_vocab,
                        max_seq_len=cfg.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(cfg.seed))
    params = checkpoints.load(model_path, {"params": params},
                              strict=False)["params"]
    return model, params


def encode_sequence(model, params, vocab, sequence, sample_q="max",
                    key=None):
    """Encode one (string or token-list) sequence to z [n, z_dim]."""
    ixs = jnp.asarray([vocab.to_ix(sequence, fix_length=model.max_seq_len)],
                      jnp.int32)
    mu, logvar = model.encode(params, ixs)
    if sample_q == "max":
        return mu
    key = key if key is not None else jax.random.PRNGKey(0)
    zs = [model.sample_z(jax.random.fold_in(key, i), mu, logvar)
          for i in range(sample_q)]
    return jnp.concatenate(zs, axis=0)


def sample_from_model(model, params, vocab, z=None, c=None, n_samples=2,
                      print_special_tokens=True, key=None, **sample_kwargs):
    """Wrapper over generate_sentences returning word-level predictions
    (reference api.py:118-150)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    samples, z, c = generate_sentences(model, params, key, n_samples,
                                       z=z, c=c, **sample_kwargs)
    samples = np.asarray(samples)
    if sample_kwargs.get("sample_mode") == "beam":
        predictions = [[vocab.to_words(hyp, print_special_tokens)
                        for hyp in sent] for sent in samples]
    else:
        predictions = [[vocab.to_words(s, print_special_tokens)]
                       for s in samples]
    return {"predictions": predictions, "z": z, "c": c}


def interpolate_z(z_start, z_end, c=None, method="linear", n_samples=2):
    """Batch of interpolated z rows between two points + mixing weights."""
    z_start = np.asarray(z_start)
    z_end = np.asarray(z_end)
    z_list = [z_start]
    if method == "linear":
        weights = [1 / (n_samples + 1) * i for i in range(1, n_samples + 1)]
        for w in weights:
            z_list.append((1 - w) * z_start + w * z_end)
    elif method == "tanh":
        weights = np.array([1.0 / (n_samples + 1) * i
                            for i in range(1, n_samples + 1)])
        weights = np.tanh(weights * 4 - 2)
        weights = (weights + 1) / 2
        for w in weights:
            z_list.append((1 - w) * z_start + w * z_end)
        weights = list(weights)
    elif method == "slerp":
        p0, p1 = z_start.squeeze(0), z_end.squeeze(0)
        omega = np.arccos(np.clip(
            np.dot(p0 / norm(p0), p1 / norm(p1)), -1.0, 1.0))
        so = np.sin(omega)
        weights = [1 / (n_samples + 1) * i for i in range(1, n_samples + 1)]
        for w in weights:
            if so < 1e-6:
                # (near-)parallel endpoints: sin(omega) -> 0 and the
                # slerp ratio is 0/0; its omega->0 limit is linear
                # interpolation, so use that instead of emitting NaN rows
                # (deviation: reference api.py:189-193 divides unguarded
                # and returns all-NaN interior points for z_start=z_end)
                interp = (1.0 - w) * p0 + w * p1
            else:
                interp = (np.sin((1.0 - w) * omega) / so * p0
                          + np.sin(w * omega) / so * p1)
            z_list.append(np.expand_dims(interp, 0))
    else:
        raise ValueError("Please use another interpolation method.")
    z_list.append(z_end)
    weights = [0.0] + list(weights) + [1.0]
    return np.vstack(z_list), weights


def generate_interpolated_samples(model, params, vocab, z_start, z_end,
                                  c=None, interpolation_method="linear",
                                  interpolation_samples=2, key=None,
                                  **sample_kwargs):
    z_list, weights = interpolate_z(z_start, z_end, c=c,
                                    method=interpolation_method,
                                    n_samples=interpolation_samples)
    if c is None:
        # fixed c = class 1 for every interpolation point (api.py:224-226)
        c = np.zeros((z_list.shape[0], model.c_dim), np.float32)
        c[:, 1] = 1.0
    samples = sample_from_model(model, params, vocab,
                                z=jnp.asarray(z_list), c=jnp.asarray(c),
                                n_samples=z_list.shape[0], key=key,
                                **sample_kwargs)
    samples["interpolation"] = weights
    return samples


def recon_sequence(model, params, vocab, sequence, sample_q, c, key=None,
                   **mb_sample_kwargs):
    z = encode_sequence(model, params, vocab, sequence, sample_q, key=key)
    n_samples = z.shape[0]
    return sample_from_model(model, params, vocab, z, c, n_samples, key=key,
                             **mb_sample_kwargs)


def interpolate_peptides(model, params, vocab, sequence_start, sequence_end,
                         interpolation_kwargs=None, mb_sample_kwargs=None,
                         key=None):
    z_start = encode_sequence(model, params, vocab, sequence_start, "max")
    z_end = encode_sequence(model, params, vocab, sequence_end, "max")
    return generate_interpolated_samples(
        model, params, vocab, z_start, z_end, key=key,
        **(interpolation_kwargs or {}), **(mb_sample_kwargs or {}))


def pretty_print_samples(samples, print_all_hypotheses=True):
    res = []
    for i, sample in enumerate(samples):
        if len(sample) > 1 and not print_all_hypotheses:
            sample = sample[:1]
        if len(sample) == 1:
            res.append(f"i {i}: {' '.join(sample[0])}")
        else:
            for j, hyp in enumerate(sample):
                res.append(f"i {i} - hyp {j}: {' '.join(hyp)}")
    return "\n".join(res)


def get_model_and_vocab_path(cfg):
    """Final-vae checkpoint path with highest-iter fallback
    (reference api.py:290-305)."""
    base = cfg.savepath
    model_path = os.path.join(base, f"model_{cfg.vae.n_iter}.npz")
    if not os.path.exists(model_path):
        step = checkpoints.latest_step(base)
        if step is None:
            raise FileNotFoundError(f"no model_*.npz under {base}")
        LOG.info("Selected model folder does not have fully trained model! "
                 "Using iteration %s instead", step)
        model_path = os.path.join(base, f"model_{step}.npz")
    vocab_path = os.path.join(base, "vocab.dict")
    LOG.info("api load from rundir=%s model=%s", base, model_path)
    return model_path, vocab_path, base


def get_result_for_model(model_path, print_results=False):
    """Read back this model-iteration's row from result.json
    (reference api.py:308-334)."""
    folder_name = os.path.dirname(model_path)
    with open(os.path.join(folder_name, "result.json")) as f:
        data = json.load(f)
    iteration = os.path.basename(model_path).split(".")[0].split("_")[1]
    model_stats = {}
    for res in data:
        if str(res.get("it")) == str(iteration):
            model_stats = res
    if not model_stats:
        LOG.info("No results for %s found.", model_path)
    if print_results:
        print(f"Results for model {model_path}")
        print(json.dumps(model_stats, indent=2))
    return model_stats


def load_vocab(vocab_path):
    return Vocab.load(vocab_path)
