"""Applying quantizers to parameter pytrees and activation sites.

Replaces the reference's two interception mechanisms:

* weight path — an in-place ``named_parameters()`` rewrite loop skipping
  ``"norm"`` params (reference lm_eval/models/huggingface.py:1740-1762)
  becomes a pure ``jax.tree_util`` map over the param pytree;
* activation path — ``register_forward_hook`` on every leaf module except
  containers/LayerNorm/Dropout/activations (e.g. huggingface.py:672-676)
  becomes explicit ``ActQuantizer.__call__`` sites inside the model code (JAX
  has no module hooks; an explicit site list per architecture is the
  documented translation, see each model's ``QUANT_SITES``).

``ste`` gives every fake-quant function a straight-through-estimator gradient
(identity backward), matching the reference's ``STEFunction_structured``
autograd functions (e.g. huggingface.py:663-666) so QAT-style training steps
differentiate through quantization.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import QuantConfig


def ste(quant_fn: Callable) -> Callable:
    """Wrap a fake-quant fn with a straight-through (identity) gradient."""

    @jax.custom_vjp
    def _q(x):
        return quant_fn(x)

    def _fwd(x):
        return quant_fn(x), None

    def _bwd(_, g):
        return (g,)

    _q.defvjp(_fwd, _bwd)
    return _q


def _is_skipped(path: str, patterns) -> bool:
    low = path.lower()
    return any(p in low for p in patterns)


# weight names eligible for packed (Pallas real-quant) storage: matmul
# operands only — embeddings/lm_head stay fake-quantized (they're gathers /
# shared weights, not K x N matmul weights)
_PACKABLE = (
    "c_attn_w", "c_proj_w", "c_fc_w",                      # gpt2
    "q_proj", "k_proj", "v_proj", "o_proj",                # llama
    "gate_proj", "up_proj", "down_proj",
    "qkv_proj", "gateup_proj",  # llama fused serving layout (explicit, not
                                # just the v_proj/up_proj suffix coincidence)
    "out_proj/w", "fc1/w", "fc2/w",                        # opt
    "/q", "/k", "/v", "/o", "/cq", "/ck", "/cv", "/co",    # t5 attention
    "/wi", "/wi_0", "/wi_1", "/wo",                        # t5 ffn
    "qkv_w", "dense_w", "fc_w", "proj_w",                  # neox
    "out_proj", "fc_in/w", "fc_out/w",                     # gptj
    "c_fc/w", "c_proj/w",                                  # gpt-neo mlp
)

# format name -> (frac_bits, man_bits) for byte-code LNS packing. lns4 is
# NOT here: quantize_weights routes it to nibble packing first and uses
# _LNS4_BYTE_FALLBACK for odd-N weights (keeping it in this dict too made
# the dict entry dead code that could silently diverge from the fallback).
_LNS_PACK = {"lns8": (3, 4)}
_LNS4_BYTE_FALLBACK = (1, 2)  # (frac_bits, man_bits) when N is odd
# only w8a8 gets the packed per-column-absmax int8 serving tier: the other
# int formats (zeroquant/vsquant/llm_int8) have materially different grids
# (per-row power-of-2 scales, outlier-column passthrough) — silently packing
# them would make the fake and real tiers of the same spec disagree, so with
# ;pallas their weights stay faithful fake-quant instead
_INT8_PACK = ("w8a8",)
# format name -> (exp_bits, man_bits, clamp_up_mul, clamp_down_mul) for
# scale-free custom-float packing (quant.formats.fp_quant grid)
_FP8_PACK = {
    "fp8": (4, 3, 0.5, 10.0),       # reference active E4M3 variant
    "fp8_e4m3": (4, 3, 0.5, 10.0),
    "fp8_e5m2": (5, 2, 1.0, 1.0),
}
# format name -> (block_size, exp_bits, man_bits) for MX packing
_MX_PACK = {
    "mx": (16, 5, 2),
    "mx16_e5m2": (16, 5, 2),
    "mx32_e4m3": (32, 4, 3),
}


def quantize_weights(params, config: QuantConfig, materialize=None):
    """Quantize every eligible leaf of a param pytree.

    Fake-quant tier (default): mirrors the reference weight-quantization loop
    (huggingface.py:1740-1762) — every parameter whose path does not match a
    skip pattern (reference: ``"norm" not in name``) and with rank >= 2 is
    mapped through ``config.weight_fn``.

    Real-quant tier (``config.use_pallas``): matmul weights are instead
    packed into integer codes (ops.packing) consumed by the dequant-fused
    Pallas kernels; non-matmul weights fall back to fake-quant.

    ``materialize(path_str, leaf) -> Array``: optional lazy-leaf hook. When
    given, ``params`` leaves may be ``jax.ShapeDtypeStruct`` placeholders;
    each is materialized right before its quantization and freed as soon as
    the packed result exists — so packing an N-billion-param model never
    holds the full bf16 tree (peak memory = packed tree + one bf16 leaf).
    Benchmarks use this to generate random 7B/13B weights directly on the
    TPU (no 13.5 GB host->device tunnel transfer, scripts/bench_serving_7b).
    """
    fn = config.weight_fn
    if fn is None:
        return params

    pack = None
    if config.use_pallas:
        from ..ops.packing import pack_int8, pack_lns

        if config.weights == "lns4":
            from ..ops.packing import pack_lns4, pack_lns4k

            # true 4-bit nibble packing: kpair layout (adjacent K rows per
            # byte — the 0.5 B/elem tier, ops/matmul.py) when K is even,
            # halves-N when only N is, byte codes otherwise
            _f4, _m4 = _LNS4_BYTE_FALLBACK
            pack = lambda w: (  # noqa: E731
                pack_lns4k(w) if w.shape[0] % 2 == 0
                else pack_lns4(w) if w.shape[1] % 2 == 0
                else pack_lns(w, frac_bits=_f4, man_bits=_m4)
            )
        elif config.weights in _LNS_PACK:
            f, m = _LNS_PACK[config.weights]
            pack = lambda w: pack_lns(w, frac_bits=f, man_bits=m)  # noqa: E731
        elif config.weights in _INT8_PACK:
            pack = pack_int8
        elif config.weights in ("fp4", "fp4_e2m1"):
            from ..ops.packing import pack_fp4, pack_fp4k

            # true 4-bit nibble packing: kpair when K is even, halves-N when
            # only N is, fake-quant fallback otherwise
            pack = lambda w: (  # noqa: E731
                pack_fp4k(w) if w.shape[0] % 2 == 0
                else pack_fp4(w) if w.shape[1] % 2 == 0
                else fn(w)
            )
        elif config.weights == "int4g":
            from ..ops.packing import pack_int4gk

            # group-affine nibbles + (scale, zero)/group (the GPTQ grid):
            # kpair layout (true 0.5625 B/elem; K % group == 0 already
            # implies the even K kpair needs). The group is ADAPTIVE per
            # weight — the largest of 128/64/32 dividing K — so shapes like
            # GPT-2 XL's K=1600 (1600 % 128 = 64) still pack at group 64
            # instead of silently running dense bf16; without this, 2/3 of
            # the XL block's weight bytes fell to the fake-quant fallback
            # and the round-2 "int4g 1.344x decode" row mostly measured
            # bf16 (advisor finding, ADVICE.md r2). Finer groups are
            # strictly more accurate; the fake tier keeps the uniform
            # g=128 + edge-padded tail convention, so fake<->packed bitwise
            # parity holds exactly on K % 128 == 0 layers (the parity-test
            # shapes). Layers whose K divides none of 128/64/32 fall back
            # to fake-quant. The halves-N packer stays available for
            # direct use only.
            def pack(w):
                for g in (128, 64, 32):
                    if w.shape[0] % g == 0:
                        return pack_int4gk(w, group_size=g)
                return fn(w)
        elif config.weights in ("nf4", "nf4_dq"):
            from ..ops.packing import pack_nf4k

            # nibble codes + per-K-block absmax: kpair layout (true 0.5625
            # B/elem; K % 64 == 0 implies the even K kpair needs); layers
            # that don't divide the 64-block fall back to fake-quant. The
            # halves-N packer stays available for direct use only.
            _dq = config.weights == "nf4_dq"
            pack = lambda w: (  # noqa: E731
                pack_nf4k(w, double_quant=_dq)
                if w.shape[0] % 64 == 0
                else fn(w)
            )
        elif config.weights in _FP8_PACK:
            from ..ops.packing import pack_fp8

            e, m, upm, dnm = _FP8_PACK[config.weights]
            pack = lambda w: pack_fp8(  # noqa: E731
                w, exp_bits=e, man_bits=m, clamp_up_mul=upm,
                clamp_down_mul=dnm,
            )
        elif config.weights in _MX_PACK:
            from ..ops.packing import pack_mx

            bs, e, m = _MX_PACK[config.weights]
            # K must divide the block; small/odd layers fall back to fake
            pack = lambda w: (  # noqa: E731
                pack_mx(w, bs, e, m) if w.shape[0] % bs == 0 else fn(w)
            )

    # One compiled dispatch per leaf (cached per shape): the packers are
    # ~15-20 elementwise ops each, and dispatching them op-by-op both
    # round-trips through the runtime per op and — on the axon-tunneled
    # TPU — leaks host RAM in the tunnel client per dispatch (a 7B int4g
    # pack measured >125 GB host RSS unjitted: OOM; jitted it is one RPC
    # per leaf). Shape-dependent layout branches in `pack` stay Python-level
    # and resolve at trace time.
    if pack is not None:
        pack = jax.jit(pack)
    quant_leaf = jax.jit(fn)

    def leaf_fn(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if materialize is not None:
            leaf = materialize(name, leaf)
        if _is_skipped(name, config.skip_weight_patterns):
            return leaf
        if getattr(leaf, "ndim", 0) < 2:
            return leaf
        if pack is not None and any(name.endswith(p) for p in _PACKABLE):
            return pack(leaf)
        return quant_leaf(leaf)

    return jax.tree_util.tree_map_with_path(leaf_fn, params)


def packed_leaf_report(params) -> dict:
    """Audit a quantized param pytree: how much of the matmul-eligible
    weight volume actually landed in the packed (real-quant) tier.

    Returns ``{"packed_leaves", "fallback_leaves", "packed_elems",
    "fallback_elems"}`` where *fallback* counts `_PACKABLE`-named rank>=2
    leaves that stayed plain arrays (fake-quant — dense bf16 at runtime).
    Benchmarks record this so a row labeled "packed tier" cannot silently
    measure mostly-unpacked weights (advisor finding, ADVICE.md r2: at
    GPT-2 XL K=1600 the old fixed g=128 gate left ~2/3 of block weight
    bytes unpacked while the bench row claimed the kpair tier)."""
    from ..ops.packing import PACKED_WEIGHT_TYPES

    leaves = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: isinstance(x, PACKED_WEIGHT_TYPES)
    )[0]
    rep = {"packed_leaves": 0, "fallback_leaves": 0,
           "packed_elems": 0, "fallback_elems": 0}
    for path, leaf in leaves:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        if not any(name.endswith(p) for p in _PACKABLE):
            continue
        if isinstance(leaf, PACKED_WEIGHT_TYPES):
            rep["packed_leaves"] += 1
            rep["packed_elems"] += int(np.prod(leaf.shape))
        elif getattr(leaf, "ndim", 0) >= 2:
            rep["fallback_leaves"] += 1
            rep["fallback_elems"] += int(np.prod(leaf.shape))
    return rep


class ActQuantizer:
    """Callable activation-quant site: ``x = actq("site_name", x)``.

    One instance is threaded through a model's forward pass; each call site
    corresponds to a leaf-module output the reference would have hooked. With
    no activation format configured it is the identity (and compiles away).
    """

    def __init__(self, config: Optional[QuantConfig] = None, use_ste: bool = False):
        self.config = config or QuantConfig()
        fn = self.config.act_fn
        if fn is not None and use_ste:
            fn = ste(fn)
        self._fn = fn

    def __call__(self, site: str, x: jnp.ndarray) -> jnp.ndarray:
        if self._fn is None:
            return x
        if site == "embed" and not self.config.quantize_embedding_acts:
            return x
        if site in self.config.skip_act_sites:
            # opt-out per site (askip:...): e.g. dropping lm_head recovers
            # 22 points of emulation throughput (BASELINE.md round 3)
            return x
        return self._fn(x)

    @property
    def enabled(self) -> bool:
        return self._fn is not None


NULL_ACT_QUANT = ActQuantizer(QuantConfig())
