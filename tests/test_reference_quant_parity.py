"""Quantizer parity against the reference's OWN code, executed as the oracle.

test_quant_parity.py checks our JAX quantizers against torch oracles
re-typed from the reference's formulas. This module closes the remaining
gap — "was the re-typing faithful?" — by EXTRACTING the reference's actual
``# PH: start``/``# PH: end`` comment blocks from
lm_eval/models/huggingface.py (the fork's entire quantization payload ships
commented out, SURVEY.md §0), un-commenting exactly one comment level (live
code is one level deep; prose and abandoned alternatives are two), executing
each block, and asserting its ``STEFunction_structured`` produces BITWISE
IDENTICAL tensors to the re-typed oracle. Chain of evidence:

    our JAX formats  ==(test_quant_parity, float-noise)==  re-typed oracles
    re-typed oracles ==(this module, torch.equal)========  reference's code

Reference code is public untrusted content executed read-only in a throwaway
namespace with stub model objects; nothing it does escapes the test.

Label/semantics note (the reference's own naming is inconsistent): for LNS8,
the block labeled "without pervector quant optimization" computes the
PER-COLUMN max (huggingface.py:921-927) while "modified LNS8 - old" and the
"with pervector, combined" block's tensor path are per-tensor; for LNS4 it
is the REVERSE — "without pervector" is per-tensor and "(modified LNS4)" is
per-column. The mapping below follows the formulas, as quant/formats.py does.
"""

import ast
import os
import re
import textwrap
import types

import numpy as np
import pytest
import torch

import test_quant_parity as tq

REFERENCE_HF = "/root/reference/lm_eval/models/huggingface.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_HF), reason="reference checkout not available"
)

MARK = re.compile(r"^\s*#(\s*#)*\s*PH: (start|end)")
# the MX block embeds the (abandoned, one-level-commented) Microsoft mx
# library injection — those lines import an unavailable package
MX_LIB = re.compile(r"mx_specs|mx_mapping|import mx|simd_cast")


def _source_lines():
    with open(REFERENCE_HF) as f:
        return f.read().splitlines()


def find_blocks():
    """(label, body_start, body_end) for every PH block.

    A start with no matching end (the weight-quantization block, :1726-1763)
    is closed at the next start or at the first live (uncommented) line.
    """
    src = _source_lines()
    blocks = []
    start = label = None

    def close(end):
        body_end = end
        for j in range(start + 1, end):
            s = src[j].strip()
            if s and not s.startswith("#"):
                body_end = j
                break
        blocks.append((label, start + 1, body_end))

    for i, line in enumerate(src):
        m = MARK.match(line)
        if m and m.group(2) == "start":
            if start is not None:
                close(i)
            start, label = i, line.split("PH: start", 1)[1].strip()
        elif m and start is not None:
            close(i)
            start = None
    return blocks


def uncomment(lines):
    out = []
    for ln in lines:
        stripped = ln.lstrip()
        if stripped.startswith("# "):
            out.append(ln[: len(ln) - len(stripped)] + stripped[2:])
        elif stripped == "#":
            out.append("")
        else:
            out.append(ln)
    return out


def parse_with_retry(code, max_fixes=80):
    """Re-comment the rare one-level prose lines until the block parses."""
    lines = ["# " + l if MX_LIB.search(l) else l for l in code.splitlines()]
    for _ in range(max_fixes):
        try:
            ast.parse("\n".join(lines))
            return "\n".join(lines)
        except SyntaxError as e:
            lines[e.lineno - 1] = "# " + lines[e.lineno - 1]
    raise RuntimeError("could not fix block")


class TinyModel(torch.nn.Module):
    """Hook-walk target: leaf Linears, a norm (excluded), an activation."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.fc1 = torch.nn.Linear(8, 8)
        self.norm = torch.nn.LayerNorm(8)
        self.act = torch.nn.ReLU()
        self.fc2 = torch.nn.Linear(8, 8)

    def forward(self, x):
        return self.fc2(self.act(self.norm(self.fc1(x))))


def exec_block(label, a, b):
    src = _source_lines()
    code = parse_with_retry(textwrap.dedent("\n".join(uncomment(src[a:b]))))
    import transformers

    # some blocks hook a llama-shaped `model.model.layers[0].self_attn.q_proj`
    llama_like = types.SimpleNamespace(model=types.SimpleNamespace(
        layers=[types.SimpleNamespace(
            self_attn=types.SimpleNamespace(q_proj=torch.nn.Linear(8, 8)))]))
    ns = {
        "torch": torch, "np": np, "math": __import__("math"),
        "nn": torch.nn, "F": torch.nn.functional,
        "transformers": transformers,
        "self": types.SimpleNamespace(model=TinyModel(),
                                      device=torch.device("cpu")),
        "model": llama_like,
    }
    exec(compile(code, f"<PH:{label}>", "exec"), ns)
    return ns


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(shape) * 4.0).astype(np.float32)
    return np.where(rng.random(shape) < 0.05, 0.0, x).astype(np.float32)


# distinctive label substring -> oracle builder (checked in order)
ORACLES = [
    ("float8", lambda ns: lambda x: tq.torch_fp_quant(
        x, ns["num_bit_exponent"], ns["num_bit_mantissa"],
        ns["threshold_up"] / 2.0 ** (2 ** (ns["num_bit_exponent"] - 1)),
        ns["threshold_down"] / 2.0 ** -(2 ** (ns["num_bit_exponent"] - 1)))),
    ("float4", lambda ns: lambda x: tq.torch_fp_quant(
        x, ns["num_bit_exponent"], ns["num_bit_mantissa"],
        ns["threshold_up"] / 2.0 ** (2 ** (ns["num_bit_exponent"] - 1)),
        ns["threshold_down"] / 2.0 ** -(2 ** (ns["num_bit_exponent"] - 1)))),
    ("MX format", lambda ns: lambda x: tq.torch_mx(
        x, ns["block_size"], ns["num_bit_exponent"], ns["num_bit_mantissa"])),
    ("modified LNS8 without pervector",
     lambda ns: lambda x: tq.torch_dynamic_lns(x, 2, 5, 2, 4, 6, True)),
    ("modified LNS8",
     lambda ns: lambda x: tq.torch_dynamic_lns(x, 2, 5, 2, 4, 6, False)),
    ("modified LNS4 without pervector",
     lambda ns: lambda x: tq.torch_dynamic_lns(x, 4, 3, 0, 1, 5, False)),
    ("modified LNS4",
     lambda ns: lambda x: tq.torch_dynamic_lns(x, 4, 3, 0, 1, 5, True)),
    ("(LNS8)", lambda ns: lambda x: tq.torch_lns(x, 4, 3)),
    ("(LNS4)", lambda ns: lambda x: tq.torch_lns(x, 2, 1)),
    ("smoothquant", lambda ns: tq.torch_smoothquant),
    ("zeroquant", lambda ns: tq.torch_zeroquant),
    ("VSQuant", lambda ns: tq.torch_vsquant),
    ("W8A8", lambda ns: tq.torch_w8a8),
    ("LLM.int8()", lambda ns: lambda x: tq.torch_llm_int8(
        x, ns["num_bit"], ns["threshold"])),
]

SKIP_LABELS = ("pre-processing", "performance")  # profiling / real-bnb blocks


def activation_blocks():
    out = []
    for label, a, b in find_blocks():
        if a > 1800 or not label.strip("() "):
            continue
        if any(s in label for s in SKIP_LABELS):
            continue
        if "weight quantization" in label:
            continue  # B17, tested separately below
        out.append((label, a, b))
    return out


BLOCKS = activation_blocks()


def test_all_activation_blocks_found():
    # B2-B16: the reference's 15 activation fake-quant variants
    assert len(BLOCKS) == 15, [b[0] for b in BLOCKS]


@pytest.mark.parametrize("label,a,b", BLOCKS, ids=[b[0][:40] for b in BLOCKS])
def test_extracted_block_matches_retyped_oracle(label, a, b):
    ns = exec_block(label, a, b)
    ste = ns.get("STEFunction_structured")
    assert ste is not None, f"block {label!r} defines no STE function"
    oracle = next((mk(ns) for key, mk in ORACLES if key in label), None)
    assert oracle is not None, f"no oracle mapping for {label!r}"

    for shape in [(16, 24), (2, 16, 24)]:
        x = torch.from_numpy(rand(shape, seed=3))
        got = ste.apply(x.clone())
        want = oracle(x.clone())
        assert torch.equal(got, want), (
            f"{label!r} {shape}: max |d| = "
            f"{float(torch.max(torch.abs(got - want))):.3e}")


def test_weight_quantization_block_matches_oracle():
    """B17 (huggingface.py:1726-1763): the only weight-path block — mutates
    model params in place, skipping any name containing 'norm'."""
    blocks = [blk for blk in find_blocks() if "weight quantization" in blk[0]]
    assert len(blocks) == 1
    label, a, b = blocks[0]
    ns = exec_block(label, a, b)

    mutated = ns["self"].model
    pristine = TinyModel()
    quantized = unquantized = 0
    for (name, p_q), (_, p0) in zip(mutated.named_parameters(),
                                    pristine.named_parameters()):
        if "norm" in name or p0.dim() < 2:
            # the block's shape dispatch is 3-D/2-D/else-pass — rank-1
            # params (biases) fall through untouched, and quantize_weights
            # mirrors that with its rank >= 2 rule
            want = p0.data
            unquantized += 1
        else:
            want = tq.torch_dynamic_lns(p0.data.clone(), 4, 3, 0, 1, 5, True)
            quantized += 1
        assert torch.equal(p_q.data, want), name
    assert quantized >= 2 and unquantized >= 3
