from .mesh import (get_mesh, make_dp_train_step, make_dp_train_scan,
                   dp_rejection_round, dp_fused_round, replicate,
                   shard_batch, initialize_multihost)

__all__ = ["get_mesh", "make_dp_train_step", "make_dp_train_scan",
           "dp_rejection_round", "dp_fused_round", "replicate",
           "shard_batch", "initialize_multihost"]
