from .annealing import interpolate, anneal
from .io import check_dir_exists, write_gen_samples, save_vocab
