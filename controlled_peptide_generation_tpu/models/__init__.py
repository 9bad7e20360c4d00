from .rnn_vae import RNNVAE, build_model
