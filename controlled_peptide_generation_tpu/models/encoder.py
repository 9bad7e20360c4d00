"""Bidirectional GRU encoder -> (mu, logvar).

Reference: models/encoder.py — 1-layer biGRU over embeddings, concat of the
last forward/backward hidden states, two linear heads. Bidirectionality is
two lax.scans (one reversed) sharing the embedded inputs.
"""

import jax
import jax.numpy as jnp

from ..ops.gru import init_gru_params, gru_scan
from ..ops import nn


def init(key, emb_dim, h_dim, z_dim, biGRU=True, layers=1, p_dropout=0.0):
    assert layers == 1, "reference uses 1 layer; stack scans to extend"
    del p_dropout  # single layer: torch applies inter-layer dropout only
    kf, kb, km, kl = jax.random.split(key, 4)
    factor = 2 if biGRU else 1
    params = {
        "gru_fwd": init_gru_params(kf, emb_dim, h_dim),
        "mu": nn.init_linear(km, factor * h_dim, z_dim),
        "logvar": nn.init_linear(kl, factor * h_dim, z_dim),
    }
    if biGRU:
        params["gru_bwd"] = init_gru_params(kb, emb_dim, h_dim)
    return params


def apply(params, emb, h_dim, biGRU=True):
    """emb: [B, T, E] -> (mu [B, Z], logvar [B, Z])."""
    B = emb.shape[0]
    h0 = jnp.zeros((B, h_dim), emb.dtype)
    _, h_fwd = gru_scan(params["gru_fwd"], emb, h0)
    if biGRU:
        _, h_bwd = gru_scan(params["gru_bwd"], emb, h0, reverse=True)
        h = jnp.concatenate([h_fwd, h_bwd], axis=1)
    else:
        h = h_fwd
    return nn.linear(params["mu"], h), nn.linear(params["logvar"], h)
