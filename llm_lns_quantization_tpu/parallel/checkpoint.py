"""Orbax checkpointing for param/optimizer pytrees (QAT save/resume).

The reference's only persistence is the sqlite request cache and the n-gram
pipeline's file offsets (SURVEY.md §5 checkpoint/resume); its training side
lived outside the repo (the ``llama2_finetune_pile`` LoRA adapter arrived
pre-trained). This module closes that gap TPU-natively: Orbax writes sharded
arrays directly from device memory (each host saves its own shards on a
multi-host mesh) and restores them to a target sharding, so QAT runs
(parallel/train.py) can checkpoint and resume without gathering weights to
one host.

Packed quantized weights (ops/packing wrappers) are ordinary pytree nodes —
their integer code arrays round-trip like any other leaf; restoring with a
``like`` template rebuilds the wrapper classes and shardings.
"""

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, params: Any, opt_state: Optional[Any] = None,
                    step: Optional[int] = None, force: bool = True) -> str:
    """Write ``{"params": ..., "opt_state"?: ..., "step"?: ...}`` to ``path``."""
    path = os.path.abspath(path)
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    # always write a step so the saved structure matches restore_checkpoint's
    # default template (has_step=True) — a step-less save would make the
    # default restore fail on a structure mismatch
    tree["step"] = step if step is not None else 0
    _checkpointer().save(path, tree, force=force)
    return path


def restore_checkpoint(path: str, params_like: Any = None,
                       opt_state_like: Any = None, has_step: bool = True):
    """Restore a checkpoint written by :func:`save_checkpoint`.

    ``params_like`` / ``opt_state_like``: pytrees of arrays (or anything with
    ``.sharding``) matching what was saved. They supply BOTH the pytree
    structure (orbax alone restores custom nodes — packed-weight wrappers,
    optax states — as plain dicts) and the target shardings (arrays land
    directly in the sharded layout on the mesh; each host reads only its
    shards). Without templates, returns orbax's raw nested-dict view.

    Returns the dict ``{"params": ..., ["opt_state": ...,] ["step": ...]}``.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if params_like is None:
        return _checkpointer().restore(path)

    item = {"params": params_like}
    if opt_state_like is not None:
        item["opt_state"] = opt_state_like
    if has_step:
        item["step"] = 0

    def _restore_args(x):
        if hasattr(x, "sharding"):
            return ocp.ArrayRestoreArgs(sharding=x.sharding)
        return ocp.RestoreArgs()

    args = jax.tree_util.tree_map(_restore_args, item)
    return _checkpointer().restore(path, item=item, restore_args=args)
