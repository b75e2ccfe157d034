"""Parallelism: device mesh, TP/DP shardings, pjit training step.

XLA collectives over ICI replace the reference's (nonexistent) NCCL layer;
see SURVEY.md §2.9 for the mapping.
"""

from .mesh import (DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh,
                   make_param_shardings, replicated, shard_params)
from .multislice import (SliceRouter, assert_ici_contained,
                         make_multislice_mesh, slice_groups, slice_of_row)
from .pipeline import (STAGE_AXIS, make_pp_mesh, pipeline_encode,
                       stack_block_params)
from .train import (TrainBatch, aed_loss_fn, ctc_loss_fn, init_training,
                    loss_fn, make_optimizer, make_seq_parallel_loss,
                    make_train_step)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "STAGE_AXIS", "make_mesh",
    "make_param_shardings", "data_sharding", "replicated", "shard_params",
    "make_pp_mesh", "pipeline_encode", "stack_block_params",
    "TrainBatch", "make_optimizer", "make_train_step", "init_training",
    "loss_fn", "ctc_loss_fn", "aed_loss_fn", "make_seq_parallel_loss",
    "SliceRouter", "assert_ici_contained", "make_multislice_mesh",
    "slice_groups", "slice_of_row",
]
