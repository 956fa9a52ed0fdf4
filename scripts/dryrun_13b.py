"""EXECUTED 13B dryrun: config #4's literal spec on the (2,4) CPU mesh.

`scripts/audit_70b.py --preset llama2_13b` proves the 13B forward/decode
COMPILE through the SPMD partitioner; this script additionally EXECUTES one
sharded forward at real 13B dims with `w:mx;a:vsquant` (BASELINE config
#4's spec): 13.0B bf16 parameters are materialized leaf-by-leaf on the
8-process virtual CPU mesh (cheap deterministic fill — execution validity
and finiteness are the claims, not throughput), MX-fake-quantized through
the production `quantize_weights` path, sharded with the production
NamedSharding rules, and run through `llama.forward` with the vsquant
activation quantizer at every site. Appends an `executed_dryrun` record to
AUDIT_13B.json.

Usage: python scripts/dryrun_13b.py   (CPU-only; ~26 GB host RAM, minutes)
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_lns_quantization_tpu.models import llama  # noqa: E402
from llm_lns_quantization_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    param_partition_specs,
)
from llm_lns_quantization_tpu.quant import QuantConfig  # noqa: E402
from llm_lns_quantization_tpu.quant.apply import (  # noqa: E402
    ActQuantizer,
    quantize_weights,
)


def main():
    t00 = time.time()
    mesh = make_mesh(shape=(2, 4))
    cfg = llama.LlamaConfig.llama2_13b(dtype=jnp.bfloat16)
    sds = jax.eval_shape(
        lambda k: llama.init_params(k, cfg), jax.random.PRNGKey(0)
    )

    @jax.jit
    def _fill(i, sds_like):
        # varied, deterministic, cheap: ramp mod a prime, centered, small
        n = int(np.prod(sds_like.shape))
        v = (jnp.arange(n, dtype=jnp.float32) + i * 131.0) % 997.0
        return ((v - 498.0) * 1e-4).astype(sds_like.dtype).reshape(
            sds_like.shape)

    quant = QuantConfig.parse("w:mx;a:vsquant")
    i = [0]

    def materialize(_name, leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            i[0] += 1
            return _fill(i[0], leaf)
        return leaf

    t0 = time.time()
    qparams = quantize_weights(sds, quant, materialize=materialize)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(qparams))
    gen_s = time.time() - t0
    print(f"# materialized+mx-quantized {n_params/1e9:.1f}B params "
          f"in {gen_s:.0f}s", flush=True)

    specs = param_partition_specs(qparams, "llama", mesh.shape["model"])
    t0 = time.time()
    qparams = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), qparams, specs
    )
    jax.block_until_ready(qparams)
    shard_s = time.time() - t0
    print(f"# sharded onto {dict(mesh.shape)} in {shard_s:.0f}s", flush=True)

    actq = ActQuantizer(quant)
    toks = jax.device_put(
        np.arange(8, dtype=np.int32).reshape(2, 4) % cfg.vocab_size,
        NamedSharding(mesh, P("data", None)),
    )

    def fwd(params, tokens):
        return llama.forward(params, cfg, tokens, actq)

    t0 = time.time()
    with mesh:
        logits = jax.jit(fwd)(qparams, toks)
        logits = jax.device_get(logits)
    fwd_s = time.time() - t0
    finite = bool(np.isfinite(np.asarray(logits, np.float32)).all())
    rec = {
        "spec": "w:mx;a:vsquant", "mesh": "(2,4)", "n_params": n_params,
        "logits_shape": list(np.asarray(logits).shape),
        "finite": finite, "materialize_s": round(gen_s, 1),
        "shard_s": round(shard_s, 1), "forward_s": round(fwd_s, 1),
        "total_s": round(time.time() - t00, 1), "ts": int(time.time()),
    }
    print(json.dumps(rec), flush=True)
    assert finite

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AUDIT_13B.json")
    try:
        with open(out_path) as f:
            audit = json.load(f)
    except (OSError, json.JSONDecodeError):
        audit = {}
    audit["executed_dryrun"] = rec
    with open(out_path, "w") as f:
        json.dump(audit, f, indent=1)
    print("updated", out_path)


if __name__ == "__main__":
    main()
