"""Composite sequence autoencoder (reference: models/model.py RNN_VAE).

Owns the shared word embedding, GRU encoder, GRU decoder, CNN classifier and
(optionally) a flow prior. All state lives in one params pytree; every method
is a pure function of (params, rng, inputs) so the whole forward fits in a
single jitted XLA program.

Hyperparameters are plain Python attributes captured at trace time — the
model object itself is static configuration, never traced.
"""

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ..data.vocab import START_IDX
from ..ops import nn
from . import encoder as enc
from . import decoder as dec
from . import deconv as deconv_mod
from . import classifier as clf
from . import flow as flow_mod
from . import transformer as tfm


@dataclass(frozen=True, eq=False)  # identity hash: usable as a jit static arg
class RNNVAE:
    n_vocab: int
    max_seq_len: int = 25
    z_dim: int = 100
    c_dim: int = 2
    emb_dim: int = 150
    freeze_embeddings: bool = False
    flow: int = 0
    flow_type: str = ""
    flow_mode: str = "gen_prior"   # gen_prior (reference) | posterior
    E_args: dict = field(default_factory=dict)
    G_args: dict = field(default_factory=dict)
    C_args: dict = field(default_factory=dict)
    # optional overrides for how transformer block stacks are applied in
    # the full-sequence (teacher-forced) passes; parallel/pp.py installs
    # pipeline-parallel schedules here via dataclasses.replace. Static
    # config like everything else on this object (eq=False identity hash).
    enc_blocks_apply: Any = None
    dec_blocks_apply: Any = None

    @property
    def h_dec(self):
        return self.z_dim + self.c_dim

    @property
    def E_class(self):
        return self.E_args.get("E_class", "gru")

    @property
    def G_class(self):
        return self.G_args.get("G_class", "gru")

    @property
    def gru_args(self):
        return dict(self.G_args.get("GRU_args", {}))

    @property
    def enc_tfm_args(self):
        return dict(self.E_args.get("T_args", {}))

    @property
    def dec_tfm_args(self):
        return dict(self.G_args.get("T_args", {}))

    @property
    def deconv_args(self):
        args = dict(self.G_args.get("deconv_args", {}))
        args["max_seq_len"] = self.max_seq_len
        return args

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def init_params(self, key):
        ke, kenc, kdec, kclf, kflow = jax.random.split(key, 5)
        g_args = self.gru_args
        if self.E_class == "transformer":
            enc_p = tfm.init_encoder(
                kenc, emb_dim=self.emb_dim, z_dim=self.z_dim,
                max_seq_len=self.max_seq_len,
                **{k: v for k, v in self.enc_tfm_args.items()
                   if k in ("d_model", "n_layers", "d_ff", "n_heads",
                            "p_dropout")})
        else:
            enc_p = enc.init(kenc, emb_dim=self.emb_dim, z_dim=self.z_dim,
                             **{k: v for k, v in self.E_args.items()
                                if k not in ("E_class", "T_args")})
        if self.G_class == "gru":
            dec_p = dec.init(
                kdec,
                emb_dim=self.emb_dim + self.z_dim + self.c_dim,
                output_dim=self.n_vocab,
                h_dim=self.h_dec,
                p_word_dropout=g_args.get("p_word_dropout", 0.3),
                p_out_dropout=g_args.get("p_out_dropout", 0.3),
                skip_connections=g_args.get("skip_connections", False))
        elif self.G_class == "transformer":
            t_args = self.dec_tfm_args
            dec_p = tfm.init_decoder(
                kdec, emb_dim=self.emb_dim, z_dim=self.z_dim,
                c_dim=self.c_dim, output_dim=self.n_vocab,
                max_seq_len=self.max_seq_len,
                **{k: v for k, v in t_args.items()
                   if k in ("d_model", "n_layers", "d_ff", "n_heads",
                            "p_dropout")})
        else:
            dec_p = deconv_mod.init(
                kdec, h_dim=self.h_dec, output_dim=self.n_vocab,
                emb_dim=self.emb_dim, **self.deconv_args)
        params = {
            "emb": nn.init_embedding(ke, self.n_vocab, self.emb_dim),
            "enc": enc_p,
            "dec": dec_p,
            "clf": clf.init(kclf, self.emb_dim, **self.C_args),
        }
        if self.flow > 0:
            params["flow"] = flow_mod.init(kflow, self.flow_type, self.flow,
                                           self.z_dim)
        return params

    def vae_param_labels(self, params):
        """'vae' for emb/enc/dec(/flow), 'other' for the classifier —
        the reference's vae_params() optimizer group (model.py:88-94)."""
        return {k: ("vae" if k in ("emb", "enc", "dec", "flow") else "other")
                for k in params}

    # ------------------------------------------------------------------
    # encoder / latent
    # ------------------------------------------------------------------

    def encode(self, params, inputs, key=None, train=False):
        """inputs: [B, T] int tokens or [B, T, V] soft one-hots.

        key/train only matter for the transformer encoder's dropout (the
        GRU encoder has no active dropout: single layer, torch semantics)."""
        from ..data.vocab import PAD_IDX
        if inputs.ndim == 2:
            emb = nn.embed(params["emb"], inputs)
        else:
            emb = nn.soft_embed(params["emb"], inputs)
        if self.E_class == "transformer":
            t_args = self.enc_tfm_args
            if inputs.ndim == 2:
                pad_mask = inputs != PAD_IDX
            else:
                # soft rows: real unless PAD dominates or the row is all
                # zeros (the sampler zeroes post-EOS soft rows,
                # ops/sampling.py — those are padding, not tokens)
                pad_mask = ((inputs[..., PAD_IDX] < 0.5)
                            & (inputs.sum(-1) > 0.5))
            return tfm.apply_encoder(
                params["enc"], emb, pad_mask,
                n_heads=t_args.get("n_heads", 4),
                key=key, train=train,
                p_dropout=t_args.get("p_dropout", 0.0),
                bf16=t_args.get("bf16", False),
                blocks_apply=self.enc_blocks_apply)
        return enc.apply(params["enc"], emb,
                         h_dim=self.E_args.get("h_dim", 80),
                         biGRU=self.E_args.get("biGRU", True))

    def sample_z(self, key, mu, logvar):
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        return mu + jnp.exp(logvar / 2.0) * eps

    def sample_z_prior(self, key, mbsize):
        return jax.random.normal(key, (mbsize, self.z_dim))

    def sample_c_prior(self, key, mbsize):
        """c ~ Cat([0.5, 0.5]) as one-hot rows (model.py:121-126)."""
        ix = jax.random.bernoulli(key, 0.5, (mbsize,)).astype(jnp.int32)
        return nn.onehot(ix, self.c_dim)

    def apply_flow(self, params, z):
        """z -> (z_K, sum log|det J|). Identity when flow == 0."""
        if self.flow == 0:
            return z, jnp.zeros(z.shape[0], z.dtype)
        return flow_mod.apply(params["flow"], self.flow_type, z)

    # ------------------------------------------------------------------
    # decoder / classifier
    # ------------------------------------------------------------------

    def decode_train(self, params, key, tokens, z, c, train=True):
        if self.G_class == "deconv":
            # non-autoregressive: all logits from (z, c), inputs ignored
            # (reference decoder.py:281-334 forward ignores x)
            return deconv_mod.apply(params["dec"], z, c,
                                    emb_dim=self.emb_dim,
                                    **self.deconv_args)
        if self.G_class == "transformer":
            t_args = self.dec_tfm_args
            return tfm.apply_teacher_forced(
                params["dec"], params["emb"], tokens, z, c, key, train,
                n_heads=t_args.get("n_heads", 4),
                p_word_dropout=t_args.get("p_word_dropout", 0.3),
                p_dropout=t_args.get("p_dropout", 0.0),
                bf16=t_args.get("bf16", False),
                blocks_apply=self.dec_blocks_apply)
        g_args = self.gru_args
        return dec.apply_teacher_forced(
            params["dec"], params["emb"], tokens, z, c, key, train,
            p_word_dropout=g_args.get("p_word_dropout", 0.3),
            p_out_dropout=g_args.get("p_out_dropout", 0.3),
            skip_connections=g_args.get("skip_connections", False))

    def decode_logits(self, params, z, c):
        """Deconv path: the full cached-logits block [B, T, V]."""
        assert self.G_class == "deconv"
        return deconv_mod.apply(params["dec"], z, c, emb_dim=self.emb_dim,
                                **self.deconv_args)

    def decode_step(self, params, token_hard, token_soft, z, c, h,
                    key=None, train=False):
        if self.G_class == "transformer":
            t_args = self.dec_tfm_args
            return tfm.apply_step(
                params["dec"], params["emb"], token_hard, token_soft,
                z, c, h, n_heads=t_args.get("n_heads", 4),
                bf16=t_args.get("bf16", False))
        g_args = self.gru_args
        return dec.apply_step(
            params["dec"], params["emb"], token_hard, token_soft, z, c, h,
            key=key, train=train,
            p_out_dropout=g_args.get("p_out_dropout", 0.3),
            skip_connections=g_args.get("skip_connections", False))

    def init_decoder_hidden(self, params, z, c):
        """Initial decoder state pytree; every leaf is batch-leading (the
        sampling scan carries it opaquely, beam reorders per leaf)."""
        if self.G_class == "transformer":
            t_args = self.dec_tfm_args
            return tfm.init_cache(params["dec"], z, c, self.max_seq_len,
                                  n_heads=t_args.get("n_heads", 4),
                                  bf16=t_args.get("bf16", False))
        return dec.init_hidden(z, c)

    def classify(self, params, inputs, key=None, train=False):
        if inputs.ndim == 2:
            emb = nn.embed(params["emb"], inputs)
        else:
            emb = nn.soft_embed(params["emb"], inputs)
        return clf.apply(params["clf"], emb, key=key, train=train,
                         **{k: v for k, v in self.C_args.items()
                            if k != "num_filters"})

    # ------------------------------------------------------------------
    # full forward (teacher-forced), reference model.py:146-195
    # ------------------------------------------------------------------

    def forward(self, params, key, sequences, q_c="prior", sample_z=1,
                labels=None, train=True):
        """Returns ((mu, logvar), (z, c), dec_logits)."""
        kz, kc, kd, ke = jax.random.split(key, 4)
        mbsize = sequences.shape[0]
        mu, logvar = self.encode(params, sequences, key=ke, train=train)
        if sample_z == "max":
            z = mu
        else:
            assert sample_z == 1
            z = self.sample_z(kz, mu, logvar)

        if self.flow > 0 and train:
            raise ValueError(
                "flow prior during training needs the flow-KL loss term; "
                "use apply_flow() explicitly (matches reference "
                "model.py:173-177 which also raises here)")

        if labels is not None:
            c = nn.onehot(labels.astype(jnp.int32), self.c_dim)
        elif q_c == "prior":
            c = self.sample_c_prior(kc, mbsize)
        elif q_c == "classifier":
            c = jax.nn.softmax(self.classify(params, sequences), axis=1)
        else:
            raise ValueError("q_c is not labels, prior, or classifier")

        dec_logits = self.decode_train(params, kd, sequences, z, c,
                                       train=train)
        return (mu, logvar), (z, c), dec_logits

    # starting token row for free-running generation
    def start_tokens(self, mbsize):
        return jnp.full((mbsize,), START_IDX, jnp.int32)


def build_model(cfg_model, n_vocab, max_seq_len) -> RNNVAE:
    """Construct from the cfg.model Bunch (config.py)."""
    return RNNVAE(
        n_vocab=n_vocab,
        max_seq_len=max_seq_len,
        z_dim=cfg_model.z_dim,
        c_dim=cfg_model.c_dim,
        emb_dim=cfg_model.emb_dim,
        freeze_embeddings=cfg_model.freeze_embeddings,
        flow=cfg_model.flow,
        flow_type=cfg_model.flow_type,
        flow_mode=cfg_model.get("flow_mode", "gen_prior"),
        E_args=dict(cfg_model.E_args),
        G_args={k: (dict(v) if isinstance(v, dict) else v)
                for k, v in cfg_model.G_args.items()},
        C_args=dict(cfg_model.C_args),
    )
