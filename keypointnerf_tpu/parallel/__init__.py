from .mesh import data_sharding, initialize_distributed, make_mesh, replicated
from .train_parallel import (
    make_batch_step_fn,
    make_global_batch,
    make_sharded_eval_step,
    make_sharded_render,
    make_sharded_train_step,
    stack_batch,
)

__all__ = [
    "data_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicated",
    "make_batch_step_fn",
    "make_global_batch",
    "make_sharded_eval_step",
    "make_sharded_render",
    "make_sharded_train_step",
    "stack_batch",
]
