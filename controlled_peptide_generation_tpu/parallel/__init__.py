from .mesh import (get_mesh, make_dp_train_step, make_dp_train_scan,
                   dp_rejection_round, replicate, shard_batch)
