"""Mesh construction and per-architecture parameter sharding rules.

Sharding strategy (the standard megatron-style layout):
  * attention QKV / MLP up projections: output dim on ``model``
  * attention out / MLP down projections: input dim on ``model``
  * embeddings / lm_head: hidden or vocab dim on ``model``
  * norms, biases: replicated
  * batch dim of activations: ``data``

With this layout each transformer block needs exactly one all-reduce after
the attention-out and MLP-down matmuls — XLA/GSPMD inserts them from the
parameter shardings alone (no hand-written collectives, unlike the
reference's nothing-at-all: SURVEY.md §2.4).
"""

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"


def make_mesh(shape: Optional[Tuple[int, int]] = None, devices=None) -> Mesh:
    """Build a ("data", "model") mesh.

    Default shape heuristic: prefer model parallelism up to 8-way, then scale
    the data axis (a 7B-70B-serving-friendly default for v5e/v5p slices).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        model = 1
        while model < 8 and model * 2 <= n and n % (model * 2) == 0:
            model *= 2
        shape = (n // model, model)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL))


# Per-family rules: list of (param-path regex, PartitionSpec). First match
# wins; anything unmatched is replicated.
_RULES = {
    "gpt2": [
        (r"wte$", P(None, AXIS_MODEL)),
        (r"wpe$", P(None, AXIS_MODEL)),
        (r"c_attn_w$", P(None, AXIS_MODEL)),
        (r"c_attn_b$", P(AXIS_MODEL)),
        (r"attn/c_proj_w$", P(AXIS_MODEL, None)),
        (r"c_fc_w$", P(None, AXIS_MODEL)),
        (r"c_fc_b$", P(AXIS_MODEL)),
        (r"mlp/c_proj_w$", P(AXIS_MODEL, None)),
    ],
    "llama": [
        # untied embedding table: shard the VOCAB axis (megatron
        # VocabParallelEmbedding). The lookup's all-reduce sums one owning
        # shard's row with zeros — exact in any order — whereas hidden-axis
        # sharding makes the first rms_norm reduce over a sharded axis, and
        # that psum's f32 reduction-order noise (~1e-7) is amplified to
        # ~4e-4 by the bf16 casts + 4-bit weight grid of the packed-tier
        # matmuls (root cause of the round-2 sharded int4gk forward
        # divergence; with vocab sharding the sharded forward is bitwise
        # equal to single-device for the whole packed tier).
        (r"embed$", P(AXIS_MODEL, None)),
        (r"lm_head$", P(None, AXIS_MODEL)),
        # fused serving layouts (llama.fuse_projections) get explicit rules:
        # they used to shard only via the coincidental 'v_proj'/'up_proj'
        # suffix matches below, which any rule anchoring would silently break
        # (ADVICE.md r3)
        (r"qkv_proj$", P(None, AXIS_MODEL)),
        (r"gateup_proj$", P(None, AXIS_MODEL)),
        (r"[qkv]_proj$", P(None, AXIS_MODEL)),
        (r"o_proj$", P(AXIS_MODEL, None)),
        (r"(gate|up)_proj$", P(None, AXIS_MODEL)),
        (r"down_proj$", P(AXIS_MODEL, None)),
    ],
    "t5": [
        (r"shared$", P(None, AXIS_MODEL)),
        (r"lm_head$", P(None, AXIS_MODEL)),
        (r"/[qkv]$", P(None, AXIS_MODEL)),
        (r"/c[qkv]$", P(None, AXIS_MODEL)),
        (r"/o$", P(AXIS_MODEL, None)),
        (r"/co$", P(AXIS_MODEL, None)),
        (r"wi(_[01])?$", P(None, AXIS_MODEL)),
        (r"wo$", P(AXIS_MODEL, None)),
    ],
    "gptj": [
        (r"wte$", P(None, AXIS_MODEL)),
        (r"lm_head/w$", P(None, AXIS_MODEL)),
        (r"lm_head/b$", P(AXIS_MODEL)),
        (r"[qkv]_proj$", P(None, AXIS_MODEL)),
        (r"out_proj$", P(AXIS_MODEL, None)),
        (r"fc_in/w$", P(None, AXIS_MODEL)),
        (r"fc_in/b$", P(AXIS_MODEL)),
        (r"fc_out/w$", P(AXIS_MODEL, None)),
    ],
    "neo": [
        (r"wte$", P(None, AXIS_MODEL)),
        (r"wpe$", P(None, AXIS_MODEL)),
        (r"[qkv]_proj$", P(None, AXIS_MODEL)),
        (r"out_proj/w$", P(AXIS_MODEL, None)),
        (r"c_fc/w$", P(None, AXIS_MODEL)),
        (r"c_fc/b$", P(AXIS_MODEL)),
        (r"c_proj/w$", P(AXIS_MODEL, None)),
    ],
    "neox": [
        (r"embed_in$", P(None, AXIS_MODEL)),
        (r"embed_out$", P(None, AXIS_MODEL)),
        (r"qkv_w$", P(None, AXIS_MODEL)),
        (r"qkv_b$", P(AXIS_MODEL)),
        (r"dense_w$", P(AXIS_MODEL, None)),
        (r"fc_w$", P(None, AXIS_MODEL)),
        (r"fc_b$", P(AXIS_MODEL)),
        (r"proj_w$", P(AXIS_MODEL, None)),
    ],
    "bloom": [
        # tied embed/lm_head: hidden dim on the model axis (the tied-head
        # matmul contracts over it -> psum, same as gpt2's wte)
        (r"embed$", P(None, AXIS_MODEL)),
        (r"qkv_w$", P(None, AXIS_MODEL)),
        (r"qkv_b$", P(AXIS_MODEL)),
        (r"dense_w$", P(AXIS_MODEL, None)),
        (r"fc_w$", P(None, AXIS_MODEL)),
        (r"fc_b$", P(AXIS_MODEL)),
        (r"proj_w$", P(AXIS_MODEL, None)),
    ],
    "opt": [
        (r"embed$", P(None, AXIS_MODEL)),
        (r"embed_pos$", P(None, AXIS_MODEL)),
        (r"[qkv]_proj/w$", P(None, AXIS_MODEL)),
        (r"[qkv]_proj/b$", P(AXIS_MODEL)),
        (r"out_proj/w$", P(AXIS_MODEL, None)),
        (r"fc1/w$", P(None, AXIS_MODEL)),
        (r"fc1/b$", P(AXIS_MODEL)),
        (r"fc2/w$", P(AXIS_MODEL, None)),
    ],
}


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))) for k in path
    )


def param_partition_specs(params, family: str, model_axis_size: int = 1):
    """PartitionSpec pytree mirroring ``params`` for the given family.

    A dim whose size is not divisible by ``model_axis_size`` falls back to
    replication (keeps tiny test configs valid on any mesh).
    """
    rules = [(re.compile(pat), spec) for pat, spec in _RULES[family]]

    def spec_for(path, leaf):
        name = _path_str(path)
        # Packed (Pallas-tier) weights are pytree wrappers whose leaves sit one
        # key below the param name (q_proj/codes, q_proj/scale, q_proj/packed)
        # — match the rule on the wrapper's path, then place the spec on the
        # inner array (ops/packing.py LNSWeight / Int8Weight / LNS4Weight).
        packed_kind = None
        for kind in ("codes", "scale", "packed", "bscale", "zero"):
            if name.endswith("/" + kind):
                packed_kind = kind
                name = name[: -len(kind) - 1]
                break
        for pat, spec in rules:
            if pat.search(name):
                if packed_kind in ("scale", "zero") and leaf.ndim >= 2:
                    # Int4GroupWeight halves-aligned side bands share the
                    # NF4 bscale layout [K/group, 2, N/2]; Int4GroupKWeight
                    # kpair bands [K/group, N] share the MX bscale layout
                    packed_kind = "bscale"
                if packed_kind == "bscale":
                    wdims = tuple(spec) + (None,) * (2 - len(tuple(spec)))
                    if leaf.ndim == 3:
                        # NF4 halves-aligned scales [K/block, 2, N/2]: axis 0
                        # tracks the weight's K, axis 2 its (halved) N
                        dims = [wdims[0], None, wdims[1]]
                    else:
                        # MX block scales [K/block, N]: weight layout
                        dims = list(wdims[:2])
                    dims = [
                        None
                        if (d is not None
                            and leaf.shape[i] % model_axis_size != 0)
                        else d
                        for i, d in enumerate(dims)
                    ]
                    return P(*dims)
                if packed_kind == "scale":
                    # per-output-column scale [N]: shard iff the weight's
                    # output dim (spec dim 1) is sharded
                    d = tuple(spec)[1] if len(tuple(spec)) > 1 else None
                    if d is not None and leaf.shape[0] % model_axis_size == 0:
                        return P(d)
                    return P()
                dims = list(tuple(spec) + (None,) * (leaf.ndim - len(spec)))
                dims = [
                    None
                    if (d is not None and leaf.shape[i] % model_axis_size != 0)
                    else d
                    for i, d in enumerate(dims[: leaf.ndim])
                ]
                return P(*dims)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, family_or_bundle, mesh: Mesh):
    """device_put the param pytree with NamedShardings from the family rules."""
    family = (
        family_or_bundle
        if isinstance(family_or_bundle, str)
        else family_or_bundle.family
    )
    specs = param_partition_specs(params, family, mesh.shape[AXIS_MODEL])
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch-dim sharding for token arrays [B, T] (data parallel)."""
    return NamedSharding(mesh, P(AXIS_DATA, *([None] * (ndim - 1))))
