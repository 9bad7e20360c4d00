"""Cross-framework parity harness: a minimal PyTorch mirror of the
reference's phase-1 WAE (GRU-VAE + recon/KL/RF-MMD losses, Adam, clip 5.0,
beta anneal) trained on the SAME corpus as the JAX/TPU framework, so loss
trajectories can be compared directly.

The reference's own stack (torch 1.7.1 + torchtext 0.3.1) is not
installable in this container; this mirror re-creates its phase-1 training
semantics (model dims cfg.py:258-300, losses losses.py:8-108, loop
train_vae.py:13-68) on modern torch from the SURVEY analysis — it is an
independent implementation, not copied code. RNGs differ across frameworks,
so parity is statistical: loss curves at matched iterations.

Run: python tools/parity_torch.py --n_iter 2000
"""

import argparse
import json
import math
import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

UNK, PAD, START, EOS = 0, 1, 2, 3


class TorchWAE(nn.Module):
    """Reference phase-1 architecture at exact dims (cfg.py:258-300)."""

    def __init__(self, n_vocab, emb_dim=150, h_enc=80, z_dim=100, c_dim=2,
                 h_dec=None):
        super().__init__()
        self.z_dim, self.c_dim = z_dim, c_dim
        h_dec = h_dec or (z_dim + c_dim)
        self.emb = nn.Embedding(n_vocab, emb_dim, padding_idx=PAD)
        self.enc = nn.GRU(emb_dim, h_enc, batch_first=True,
                          bidirectional=True)
        self.q_mu = nn.Linear(2 * h_enc, z_dim)
        self.q_logvar = nn.Linear(2 * h_enc, z_dim)
        self.dec = nn.GRU(emb_dim + z_dim + c_dim, h_dec, batch_first=True)
        self.out = nn.Linear(h_dec, n_vocab)
        self.word_dropout = 0.3
        self.out_dropout = nn.Dropout(0.3)

    def forward(self, text):
        B, T = text.shape
        emb = self.emb(text)
        _, h = self.enc(emb)                          # [2, B, H]
        hcat = torch.cat([h[0], h[1]], dim=1)
        mu, logvar = self.q_mu(hcat), self.q_logvar(hcat)
        z = mu + torch.exp(logvar / 2) * torch.randn_like(mu)
        c_ix = torch.randint(0, self.c_dim, (B,))
        c = F.one_hot(c_ix, self.c_dim).float()

        # teacher-forced decode with word dropout -> UNK
        drop = torch.rand(B, T) < self.word_dropout
        x = torch.where(drop, torch.full_like(text, UNK), text)
        x_emb = self.emb(x)
        zc = torch.cat([z, c], dim=1)
        inputs = torch.cat(
            [x_emb, zc.unsqueeze(1).expand(B, T, zc.shape[1])], dim=2)
        out, _ = self.dec(inputs, zc.unsqueeze(0).contiguous())
        logits = self.out(self.out_dropout(out))
        return mu, logvar, z, logits


def recon_dec(text, logits):
    """Next-token CE with targets = inputs shifted left + PAD, ignoring
    PAD (reference losses.py:18-31)."""
    targets = torch.cat(
        [text[:, 1:], torch.full_like(text[:, :1], PAD)], dim=1)
    return F.cross_entropy(logits.reshape(-1, logits.shape[-1]),
                           targets.reshape(-1), ignore_index=PAD)


def kl_gaussianprior(mu, logvar):
    return 0.5 * (logvar.exp() + mu ** 2 - 1 - logvar).sum(1).mean()


def kl_gaussian_sharedmu(mu, logvar):
    return 0.5 * (logvar.exp() - 1 - logvar).sum(1).mean()


def mmd_rf(z, rf_w, rf_b, sigma=7.0):
    """Random-features MMD to N(0,I) (reference losses.py:59-93)."""
    z_prior = torch.randn_like(z)

    def mean_emb(x):
        xw = x @ rf_w / (sigma ** 0.5)
        e = math.sqrt(2.0 / rf_w.shape[1]) * torch.cos(xw + rf_b)
        return e.mean(0)

    d = mean_emb(z) - mean_emb(z_prior)
    return (d ** 2).sum()


def train(n_iter=2000, batch_size=32, lr=1e-3, seed=0, datapath=None,
          log_every=100):
    from controlled_peptide_generation_tpu import config as C
    import main as main_mod

    torch.manual_seed(seed)
    cfg = C.default_config()
    cfg.dataset = "synthetic"
    cfg.datapath = datapath or "data"
    C.finalize(cfg)
    cfg.vae.batch_size = batch_size
    dataset = main_mod.load_dataset(cfg)

    model = TorchWAE(dataset.n_vocab)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    rf_w = torch.randn(model.z_dim, cfg.losses.wae_mmd.rf_dim)
    rf_b = torch.rand(cfg.losses.wae_mmd.rf_dim) * 2 * math.pi

    n_anneal = max(n_iter // 5, 1)
    curve = []
    for it in range(n_iter + 1):
        beta = 1.0 + min(it / n_anneal, 1.0)          # 1 -> 2 linear
        batch = dataset.next_batch("train_vae")
        text = torch.from_numpy(np.asarray(batch.text)).long()
        mu, logvar, z, logits = model(text)
        recon = recon_dec(text, logits)
        kl = kl_gaussianprior(mu, logvar)
        mmdrf = mmd_rf(z, rf_w, rf_b, cfg.losses.wae_mmd.sigma)
        loss = (recon + beta * mmdrf
                + 1e-3 * kl_gaussian_sharedmu(mu, logvar))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()
        if it % log_every == 0:
            curve.append({"it": it, "recon": float(recon),
                          "kl": float(kl), "mmdrf": float(mmdrf)})
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_iter", type=int, default=2000)
    ap.add_argument("--datapath", default="data")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    curve = train(n_iter=args.n_iter, datapath=args.datapath)
    out = json.dumps(curve, indent=2)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out)
    print(out)


if __name__ == "__main__":
    main()
