"""Kim-2014 text-CNN attribute classifier over embeddings.

Reference: models/classifier.py — parallel valid convs of widths 3..5 with
100 filters each, ReLU, max-pool over time, concat, dropout + linear -> 2
logits. Requires seq_len >= max filter width.
"""

import jax
import jax.numpy as jnp

from ..ops import nn


def init(key, emb_dim, min_filter_width=3, max_filter_width=5,
         num_filters=100, dropout=0.5):
    del dropout
    widths = range(min_filter_width, max_filter_width + 1)
    keys = jax.random.split(key, len(list(widths)) + 1)
    params = {}
    for i, w in enumerate(range(min_filter_width, max_filter_width + 1)):
        params[f"conv{w}"] = nn.init_conv1d_seq(keys[i], w, emb_dim,
                                                num_filters)
    n_widths = max_filter_width - min_filter_width + 1
    params["fc"] = nn.init_linear(keys[-1], num_filters * n_widths, 2)
    return params


def apply(params, emb, key=None, train=False,
          min_filter_width=3, max_filter_width=5, dropout=0.5):
    """emb: [B, T, E] -> logits [B, 2]."""
    assert emb.shape[1] >= max_filter_width, (
        f"classifier needs seq_len >= {max_filter_width}")
    feats = []
    for w in range(min_filter_width, max_filter_width + 1):
        conv = jax.nn.relu(nn.conv1d_seq(params[f"conv{w}"], emb))
        feats.append(jnp.max(conv, axis=1))           # max-pool over time
    x = jnp.concatenate(feats, axis=1)
    if key is None:
        key = jax.random.PRNGKey(0)
    x = nn.dropout(key, x, dropout, train)
    return nn.linear(params["fc"], x)
