"""Bisect the sharded-vs-single int4gk forward divergence (VERDICT r2 #2)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")

from llm_lns_quantization_tpu.models import build_model
from llm_lns_quantization_tpu.parallel import make_mesh, shard_params
from llm_lns_quantization_tpu.parallel.mesh import data_sharding
from llm_lns_quantization_tpu.quant import QuantConfig

mesh = make_mesh(shape=(2, 4))
tokens = jnp.asarray(np.random.default_rng(4).integers(0, 250, (4, 16)).astype(np.int32))


def run(label, replicate):
    quant = QuantConfig.parse(label) if label else None
    bundle = build_model(
        family="llama", preset="tiny",
        config_overrides=dict(hidden_size=128, intermediate_size=256),
        quant=quant,
    )
    single = bundle.forward(bundle.params, bundle.cfg, tokens)
    if replicate:
        sp = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), bundle.params)
    else:
        sp = shard_params(bundle.params, bundle, mesh)
    fwd = jax.jit(lambda p, t: bundle.forward(p, bundle.cfg, t))
    sharded = fwd(sp, jax.device_put(tokens, data_sharding(mesh)))
    d = np.abs(np.asarray(single) - np.asarray(sharded))
    mode = "replicated" if replicate else "tp-sharded"
    print(f"{label or 'dense':18s} {mode:10s} max={d.max():.3e} mean={d.mean():.3e}")


for label in ["", "w:int4g;pallas", "w:lns4;pallas"]:
    for replicate in (False, True):
        run(label, replicate)
