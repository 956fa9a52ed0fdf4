"""Typed, flag-driven quantization configuration + format registry.

This replaces the reference's configuration mechanism — manually uncommenting
one ``# PH: start``/``# PH: end`` block per experiment inside
``HuggingFaceAutoLM.__init__`` (reference lm_eval/models/huggingface.py:273-1763,
vestigial ``quant_format`` kwarg commented at :110, :268-272) — with a single
dataclass selectable from the CLI (``--model_args quant=lns8,...``).
"""

from dataclasses import dataclass, field, replace
from typing import Callable, Dict, Optional

import jax

from . import formats

# name -> fake-quant fn (Array -> Array). Names cover every reference block.
FORMAT_REGISTRY: Dict[str, Callable] = {
    "fp8": formats.fp8_e4m3,          # reference float8 active variant (E4M3)
    "fp8_e4m3": formats.fp8_e4m3,
    "fp8_e5m2": formats.fp8_e5m2,
    "fp4": formats.fp4_e2m1,
    "fp4_e2m1": formats.fp4_e2m1,
    "lns8": formats.lns8,
    "lns4": formats.lns4,
    "lns8_dynamic": formats.lns8_dynamic,
    "lns8_dynamic_pervec": formats.lns8_dynamic_pervec,
    "lns4_dynamic": formats.lns4_dynamic,
    "lns4_dynamic_pervec": formats.lns4_dynamic_pervec,
    "zeroquant": formats.zeroquant,
    "vsquant": formats.vsquant,
    "w8a8": formats.w8a8,
    "smoothquant": formats.smoothquant,
    "llm_int8": formats.llm_int8,
    "mx": formats.mx16_e5m2,          # reference MX active variant
    "mx16_e5m2": formats.mx16_e5m2,
    "mx32_e4m3": formats.mx32_e4m3,
    "nf4": formats.nf4,               # bnb 4-bit NF4 (reference load_in_4bit)
    "nf4_dq": formats.nf4_dq,         # + bnb_4bit_use_double_quant
    "int4g": formats.int4g,           # GPTQ-grid group-affine INT4 (g=128)
}


def get_format(name: str) -> Callable:
    try:
        return FORMAT_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown quant format {name!r}; available: {sorted(FORMAT_REGISTRY)}"
        ) from None


@dataclass(frozen=True)
class QuantConfig:
    """What to quantize and how.

    ``weights``/``acts`` name a format from :data:`FORMAT_REGISTRY` (or None
    to leave that path unquantized). The reference's experiments were either
    activation-path (hooks on every leaf module) or weight-path (the dynamic
    LNS4 per-vector block, huggingface.py:1726-1763); both compose here.

    ``skip_weight_patterns`` reproduces the weight path's ``"norm" not in
    name`` filter (huggingface.py:1741); embedding/norm params are skipped by
    default. ``quantize_embedding_acts`` controls whether embedding outputs
    count as activation-quant sites (the reference's hook walk covers
    ``nn.Embedding`` leaves, so True matches it).
    """

    weights: Optional[str] = None
    acts: Optional[str] = None
    kv_cache: Optional[str] = None  # "int8" / "fp8" for the decode cache
    skip_weight_patterns: tuple = ("norm", "ln_", "layernorm")
    quantize_embedding_acts: bool = True
    use_pallas: bool = False  # route matmuls through fused Pallas kernels
    # activation-quant sites to leave unquantized (exact site names from the
    # model's QUANT_SITES). Motivated by the fake-quant tax attribution
    # (BASELINE.md round 3): the lm_head site quantizes the [B, T, vocab]
    # logits — ~40% of all activation elements — and alone costs 22 points
    # of emulation throughput (0.63x -> 0.85x bf16 without it).
    skip_act_sites: tuple = ()
    # serve with q/k/v (and gate/up) packed as ONE concatenated weight each:
    # 7 matmul dispatches per llama block become 4, and the shared x is read
    # once per fused group — the decode regime's fixed per-dispatch cost was
    # the measured blocker for the 4-bit tiers (BASELINE.md round 2).
    # Weight-only: requires acts=None (activation-site semantics would change
    # otherwise); concatenation along N leaves every format's quantization
    # grid bitwise identical (groups/blocks/scales all run along K or N
    # columns, never across the concat boundary).
    fuse_proj: bool = False

    @property
    def weight_fn(self):
        return get_format(self.weights) if self.weights else None

    @property
    def act_fn(self):
        return get_format(self.acts) if self.acts else None

    def with_updates(self, **kw) -> "QuantConfig":
        return replace(self, **kw)

    @classmethod
    def parse(cls, spec: Optional[str]) -> "QuantConfig":
        """Parse CLI specs like ``"w:lns4_dynamic_pervec;a:fp8;kv:int8"``.

        A bare format name quantizes activations only (matching how the
        reference's hook blocks were used); ``w:``/``a:``/``kv:`` prefixes
        select the path.
        """
        if not spec:
            return cls()
        weights = acts = kv = None
        use_pallas = False
        fuse_proj = False
        skip_sites = ()
        for part in spec.split(";"):
            part = part.strip()
            if not part:
                continue
            if part == "pallas":
                use_pallas = True
            elif part == "fuse":
                fuse_proj = True
            elif part.startswith("askip:"):
                skip_sites = tuple(
                    s for s in part[6:].split("|") if s)
            elif part.startswith("w:"):
                weights = part[2:]
            elif part.startswith("a:"):
                acts = part[2:]
            elif part.startswith("kv:"):
                kv = part[3:]
            else:
                acts = part
        for name in (weights, acts):
            if name is not None:
                get_format(name)  # validate eagerly
        if kv is not None and kv not in ("int8", "fp8"):
            # init_cache branches on the string: anything truthy that is not
            # "fp8" would silently select the int8 cache
            raise ValueError(f"unknown kv cache mode {kv!r}; have: int8, fp8")
        if fuse_proj and acts is not None:
            raise ValueError(
                "fuse collapses the attn_q/k/v and mlp_gate/up activation "
                "sites into one matmul each, changing activation-quant "
                "semantics; use fuse only with weight-only specs")
        return cls(weights=weights, acts=acts, kv_cache=kv,
                   use_pallas=use_pallas, fuse_proj=fuse_proj,
                   skip_act_sites=skip_sites)

    def describe(self) -> str:
        parts = []
        if self.weights:
            parts.append(f"w:{self.weights}")
        if self.acts:
            parts.append(f"a:{self.acts}")
        if self.kv_cache:
            parts.append(f"kv:{self.kv_cache}")
        if self.use_pallas:
            # the real-quant tier has materially different numerics than the
            # fake tier of the same formats — a config record that drops it
            # conflates the two (and parse(describe(cfg)) must round-trip)
            parts.append("pallas")
        if self.fuse_proj:
            parts.append("fuse")
        if self.skip_act_sites:
            parts.append("askip:" + "|".join(self.skip_act_sites))
        return ";".join(parts) or "none"
