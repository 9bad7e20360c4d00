from .gru import gru_cell, gru_scan, init_gru_params
from . import losses, nn
