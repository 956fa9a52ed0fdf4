"""Device-mesh parallelism: sharding rules + distributed eval/train steps.

This layer replaces the reference's scaling story — HF accelerate
``device_map`` layer placement with CPU/disk offload (reference
lm_eval/models/huggingface.py:30-54, 232-240; see SURVEY.md §2.4: the
reference has NO tensor/data/pipeline parallel runtime) — with the TPU-native
one: a ``jax.sharding.Mesh`` over ("data", "model") axes, NamedSharding
parameter pytrees, and pjit-compiled steps whose collectives XLA lays onto
ICI.
"""

from .mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    make_mesh,
    param_partition_specs,
    shard_params,
)
from . import multihost
from .checkpoint import restore_checkpoint, save_checkpoint
from .train import make_train_step

__all__ = [
    "restore_checkpoint",
    "save_checkpoint",
    "AXIS_DATA",
    "AXIS_MODEL",
    "make_mesh",
    "param_partition_specs",
    "shard_params",
    "make_train_step",
    "multihost",
]
