"""Deconvolutional (non-autoregressive) decoder, G_class='deconv'.

Reference: models/decoder.py DeconvDecoder — a ConvTranspose2d stack from
(z, c) to (max_seq_len, emb_dim), optional batch-norm / final conv / GRU
smoothing, linear head to vocab logits with a temperature. All logits are
emitted at once; free-running generation replays them pointer-wise
(decoder.py:268-271, 316-323) — here that contract is ops/sampling.py's
sample_from_logits + ops/beam.py's beam_search_logits.

At the reference architecture (max_seq_len=25, kernel 4, 3 deconv layers,
100 filters) the spatial sizes are 1 -> 4 -> 11 -> 25. XLA lowers
conv_transpose natively onto the MXU; no custom kernel needed.

Deviations, documented: batch-norm uses batch statistics in both train and
eval (no running-stats state threading — the reference's eval-mode running
stats only matter for its unreleased phase-2 trainer); transposed-conv
kernels are freshly initialized so no spatial flip is needed for torch
weight parity.
"""

import math

import jax
import jax.numpy as jnp

from ..ops import nn


def _sentence_sizes(max_seq_len, kernel_size, num_deconv_layers):
    sizes = [max_seq_len - 1]
    for _ in range(num_deconv_layers - 1):
        sizes.append(int(math.floor((sizes[-1] - kernel_size) / 2) + 1))
    return list(reversed(sizes))


def _conv_t_init(key, kh, kw, c_in, c_out):
    kw_, kb_ = jax.random.split(key)
    bound = 1.0 / (c_in * kh * kw) ** 0.5
    return {"w": nn.uniform(kw_, (kh, kw, c_in, c_out), bound),
            "b": nn.uniform(kb_, (c_out,), bound)}


def _conv_init(key, kh, kw, c_in, c_out, bias=True):
    kw_, kb_ = jax.random.split(key)
    bound = 1.0 / (c_in * kh * kw) ** 0.5
    p = {"w": nn.uniform(kw_, (kh, kw, c_in, c_out), bound)}
    p["b"] = (nn.uniform(kb_, (c_out,), bound) if bias
              else jnp.zeros((c_out,)))
    return p


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def conv_transpose2d(x, p, stride, kh, kw, out_pad=(0, 0)):
    """x: [B, C, H, W]; torch ConvTranspose2d semantics (padding=0):
    out = (in-1)*stride + kernel + output_padding."""
    y = jax.lax.conv_general_dilated(
        x, p["w"],
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1 + out_pad[0]),
                 (kw - 1, kw - 1 + out_pad[1])),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return y + p["b"][None, :, None, None]


def conv2d(x, p, pad_h):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1),
        padding=((pad_h, pad_h), (0, 0)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return y + p["b"][None, :, None, None]


def batchnorm2d(x, p, eps=1e-5):
    mean = x.mean(axis=(0, 2, 3), keepdims=True)
    var = x.var(axis=(0, 2, 3), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * p["scale"][None, :, None, None] \
        + p["bias"][None, :, None, None]


def init(key, h_dim, output_dim, emb_dim, max_seq_len, num_filters=100,
         kernel_size=4, num_deconv_layers=3, useRNN=False, temperature=1.0,
         use_batch_norm=True, num_conv_layers=2,
         add_final_conv_layer=True):
    if num_deconv_layers > 4:
        num_deconv_layers = 4
    if max_seq_len < 30 and kernel_size > 3:
        num_deconv_layers = 3   # reference guard (decoder.py:188-190)
    sizes = _sentence_sizes(max_seq_len, kernel_size, num_deconv_layers)

    keys = jax.random.split(key, 10 + num_conv_layers)
    k = iter(keys)
    params = {
        "deconv0": _conv_t_init(next(k), sizes[0], 1, h_dim,
                                num_filters * 2),
        "bn0": _bn_init(num_filters * 2),
        "deconv1": _conv_t_init(next(k), kernel_size, 1, num_filters * 2,
                                num_filters),
        "bn1": _bn_init(num_filters),
    }
    for i in range(num_conv_layers):
        params[f"conv{i}"] = _conv_init(next(k), 3, 1, num_filters,
                                        num_filters, bias=False)
        params[f"cbn{i}"] = _bn_init(num_filters)
    if num_deconv_layers > 3:
        params["deconv2"] = _conv_t_init(next(k), kernel_size, 1,
                                         num_filters, num_filters)
        params["bn2"] = _bn_init(num_filters)
    params["deconv_out"] = _conv_t_init(next(k), kernel_size, emb_dim,
                                        num_filters, 1)
    params["bn_out"] = _bn_init(1)
    if add_final_conv_layer:
        params["final_conv"] = _conv_init(next(k), 7, emb_dim, 1, emb_dim)
        params["bn_final"] = _bn_init(emb_dim)
    if useRNN:
        from ..ops.gru import init_gru_params
        params["rnn"] = init_gru_params(next(k), emb_dim, emb_dim)
    params["fc"] = nn.init_linear(next(k), emb_dim, output_dim)
    return params


def apply(params, z, c, *, emb_dim, max_seq_len, num_filters=100,
          kernel_size=4, num_deconv_layers=3, useRNN=False, temperature=1.0,
          use_batch_norm=True, num_conv_layers=2,
          add_final_conv_layer=True):
    """(z [B, zd], c [B, cd]) -> logits [B, max_seq_len, V]."""
    if num_deconv_layers > 4:
        num_deconv_layers = 4
    if max_seq_len < 30 and kernel_size > 3:
        num_deconv_layers = 3
    sizes = _sentence_sizes(max_seq_len, kernel_size, num_deconv_layers)

    def bn(x, name):
        return batchnorm2d(x, params[name]) if use_batch_norm else x

    latent = jnp.concatenate([z, c], axis=1)[:, :, None, None]  # [B,H,1,1]
    x = jax.nn.relu(bn(conv_transpose2d(latent, params["deconv0"], 2,
                                        sizes[0], 1), "bn0"))
    x = jax.nn.relu(bn(conv_transpose2d(x, params["deconv1"], 2,
                                        kernel_size, 1, (1, 0)), "bn1"))
    for i in range(num_conv_layers):
        x = jax.nn.relu(bn(conv2d(x, params[f"conv{i}"], pad_h=1),
                           f"cbn{i}"))
    if num_deconv_layers > 3:
        x = jax.nn.relu(bn(conv_transpose2d(x, params["deconv2"], 2,
                                            kernel_size, 1, (1, 0)),
                           "bn2"))
    # -> (B, 1, T, emb)
    x = conv_transpose2d(x, params["deconv_out"], 2, kernel_size, emb_dim,
                         (1, 0))
    x = batchnorm2d(x, params["bn_out"]) if use_batch_norm else x
    if add_final_conv_layer:
        x = jax.nn.relu(x)
        x = conv2d(x, params["final_conv"], pad_h=3)      # (B, emb, T, 1)
        x = batchnorm2d(x, params["bn_final"]) if use_batch_norm else x
        x = jnp.transpose(x, (0, 3, 2, 1))                 # (B, 1, T, emb)
    B = x.shape[0]
    dec = x[:, 0]                                          # (B, T, emb)
    if useRNN:
        from ..ops.gru import gru_scan
        dec, _ = gru_scan(params["rnn"], dec,
                          jnp.zeros((B, emb_dim), dec.dtype))
    logits = nn.linear(params["fc"], dec) / temperature
    return logits                                          # (B, T, V)
