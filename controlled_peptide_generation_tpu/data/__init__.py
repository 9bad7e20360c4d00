from .vocab import UNK_IDX, PAD_IDX, START_IDX, EOS_IDX, Vocab
from .loader import AttributeDataLoader
