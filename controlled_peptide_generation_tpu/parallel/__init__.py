from .mesh import (get_mesh, make_dp_train_step, dp_rejection_round,
                   replicate, shard_batch)
