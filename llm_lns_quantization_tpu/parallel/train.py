"""Sharded QAT-style training step (STE through fake-quant).

The reference only ever *evaluated* quantized models, but its experimental
setup depends on quantization-aware finetuning (the
``pouya-haghi/llama2_finetune_pile`` LoRA adapter, huggingface.py:273-277)
and every quant block carries an STE ``autograd.Function`` for exactly this.
This module supplies the TPU-native counterpart: a pjit-sharded train step
whose forward fake-quantizes activations with identity (STE) gradients and
whose gradient/optimizer math XLA distributes over the ("data", "model")
mesh.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models import ModelBundle
from ..quant.apply import ActQuantizer
from ..quant.config import QuantConfig
from .mesh import AXIS_DATA, data_sharding, param_partition_specs

from jax.sharding import NamedSharding, PartitionSpec as P


def make_train_step(
    bundle: ModelBundle,
    mesh,
    quant: Optional[QuantConfig] = None,
    learning_rate: float = 1e-4,
    tx: Optional[optax.GradientTransformation] = None,
):
    """Return (sharded_train_step, init_opt_state).

    train_step(params, opt_state, tokens, targets) -> (params, opt_state, loss)
    with params/opt_state sharded per the family rules, batch on ``data``.
    ``tx`` overrides the default adamw (scripts/train_checkpoint.py passes a
    warmup-cosine schedule with gradient clipping).
    """
    actq = ActQuantizer(quant or QuantConfig(), use_ste=True)
    cfg = bundle.cfg
    forward = bundle.forward
    tx = optax.adamw(learning_rate) if tx is None else tx

    def loss_fn(params, tokens, targets):
        logits = forward(params, cfg, tokens, actq).astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(logz - gold)

    def train_step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_opt_state(params):
        # optimizer moments are created from the (already-sharded) params and
        # inherit their shardings leaf by leaf (zeros_like preserves
        # NamedSharding). Fresh scalars (optax step counters) come out
        # single-device instead; pin them to a replicated mesh sharding so
        # the state is a valid orbax restore template — a checkpoint restored
        # onto a single-device-committed counter conflicts with the
        # mesh-sharded params inside the jitted train step.
        replicated = NamedSharding(mesh, P())

        def _pin(x):
            if hasattr(x, "sharding") and not isinstance(
                x.sharding, NamedSharding
            ):
                return jax.device_put(x, replicated)
            return x

        return jax.tree_util.tree_map(_pin, tx.init(params))

    # shardings are carried by the arguments themselves (params via
    # parallel.shard_params, tokens via parallel.data_sharding); jit
    # propagates them and GSPMD inserts the collectives
    jitted = jax.jit(train_step, donate_argnums=(0, 1))
    return jitted, init_opt_state
