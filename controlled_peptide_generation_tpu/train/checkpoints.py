"""Checkpointing: params + optimizer state + RNG key + step in one file.

Keeps the reference's filename/auto-resolution contract
(``{savepath}/model_{iter}.npz``; reference mutils.py:11-14, cfg.py:109-117,
api.py:296-301) while fixing its silent Adam-moment reset on resume — the
reference saves only the model state_dict (SURVEY.md §5.4); here the full
train state round-trips.

Format: a single .npz whose keys are the pytree key-paths of the state dict.
Loading is template-based: the caller provides a state pytree of the right
structure (e.g. freshly initialized) and leaves are filled by key-path.
Model-only loading (the api.py strict=False path) passes just the params
subtree as the template.
"""

import os
import re

import jax
import numpy as np


def _flatten(state):
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    return {jax.tree_util.keystr(kp): leaf for kp, leaf in leaves}


def save(path, state):
    """state: arbitrary pytree of arrays/scalars."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {k: np.asarray(v) for k, v in _flatten(state).items()}
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **flat)
    os.replace(tmp, path)


# Optimizer-layout fingerprints in checkpoint key-paths: the flat-vector
# Adam (train/opt.py FlatAdamState) stores raveled `.m`/`.v` vectors; the
# optax chain stores per-leaf `.mu`/`.nu` subtrees (ScaleByAdamState).
# Both are NamedTuple fields, so they appear as `.name` in keystr paths
# (plain-dict param names appear as ['name'] and can't collide).
_FLAT_OPT_PAT = re.compile(r"\.(m|v)$")
_OPTAX_OPT_PAT = re.compile(r"\.(mu|nu)(\W|$)")


def _check_opt_layout(path, tmpl_keys, file_keys):
    """Flipping hw.flat_optimizer across a resume changes the opt-state
    key-paths; without this check that surfaced as an opaque missing-key
    KeyError (strict) or a SILENT moment reset (strict=False). Raise an
    error that names the flag instead."""
    t_flat = any(_FLAT_OPT_PAT.search(k) for k in tmpl_keys)
    t_optax = any(_OPTAX_OPT_PAT.search(k) for k in tmpl_keys)
    f_flat = any(_FLAT_OPT_PAT.search(k) for k in file_keys)
    f_optax = any(_OPTAX_OPT_PAT.search(k) for k in file_keys)
    if ((t_flat and not t_optax and f_optax and not f_flat)
            or (t_optax and not t_flat and f_flat and not f_optax)):
        stored = "optax per-leaf" if f_optax else "flat-vector"
        expected = "flat-vector" if t_flat else "optax per-leaf"
        raise ValueError(
            f"checkpoint {path} stores the {stored} Adam state but this "
            f"run expects the {expected} layout — hw.flat_optimizer was "
            f"flipped across a resume. Resume with the original "
            f"--hw.flat_optimizer setting (or restart training from "
            f"scratch).")


def load(path, template, strict=True):
    """Fill ``template``'s leaves from the file by key-path.

    strict=False ignores missing keys (leaves keep template values) and
    extra keys in the file — the reference's load_state_dict(strict=False).
    A template whose opt-state layout (flat-vector vs optax per-leaf Adam)
    contradicts the file's raises a ValueError naming hw.flat_optimizer,
    in BOTH modes — a silent moment reset is never acceptable.
    """
    data = np.load(path)
    avail = set(data.files)
    tmpl_keys = {jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_flatten_with_path(template)[0]}
    _check_opt_layout(path, tmpl_keys, avail)

    import jax.numpy as jnp

    def fill(kp, leaf):
        key = jax.tree_util.keystr(kp)
        if key in avail:
            arr = data[key]
            return jnp.asarray(arr) if np.ndim(arr) else arr[()]
        if strict:
            raise KeyError(f"checkpoint {path} missing {key}")
        return leaf

    return jax.tree_util.tree_map_with_path(fill, template)


def latest_step(savepath, pattern=r"model_(\d+)\.npz$"):
    """Highest iteration with a saved checkpoint, or None
    (the api.py:296-301 fallback)."""
    if not os.path.isdir(savepath):
        return None
    steps = []
    for name in os.listdir(savepath):
        m = re.search(pattern, name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None
