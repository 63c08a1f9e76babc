"""Parallelism: device meshes, sharding rules, and the fused train step.

The reference is strictly single-device (SURVEY.md §2.11); here scaling is
first-class: a (dp, tp) ``jax.sharding.Mesh`` with batch-sharded data
parallelism over ICI and optional tensor parallelism over the wide decoder
FCs, all expressed as shardings on one jitted step — XLA inserts the
collectives (psum for gradients, all-gathers around tp layers).
"""

from cloudaae_tpu.parallel.mesh import make_mesh, shard_batch, shard_params, shard_state
from cloudaae_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    make_train_multistep_from_table,
    make_train_step_from_table,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_params",
    "shard_state",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_train_multistep_from_table",
    "make_train_step_from_table",
    "make_eval_step",
]
