from .train_vae import train_vae, make_train_step
from . import checkpoints
