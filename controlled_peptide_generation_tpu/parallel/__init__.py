from .mesh import (get_mesh, make_dp_train_step, make_dp_train_scan,
                   make_dp_full_step, make_dp_full_scan,
                   dp_rejection_round, dp_fused_round, replicate,
                   shard_batch, initialize_multihost)
from .tp import (get_mesh_2d, get_mesh_3d, make_tp_train_step,
                 make_tp_full_step, transformer_param_specs, shard_tp)
from .pp import get_mesh_pipe, make_pp_model, make_blocks_apply
from .zero import make_zero_train_step, zero_param_specs

__all__ = ["get_mesh", "make_dp_train_step", "make_dp_train_scan",
           "make_dp_full_step", "make_dp_full_scan",
           "dp_rejection_round", "dp_fused_round", "replicate",
           "shard_batch", "initialize_multihost",
           "get_mesh_2d", "get_mesh_3d", "make_tp_train_step",
           "make_tp_full_step", "transformer_param_specs", "shard_tp",
           "get_mesh_pipe", "make_pp_model", "make_blocks_apply",
           "make_zero_train_step", "zero_param_specs"]
