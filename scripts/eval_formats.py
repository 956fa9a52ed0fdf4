"""End-to-end accuracy table: real checkpoint x quantization format -> ppl.

The experiment the reference existed to run (SURVEY.md §0: PTQ emulation ppl
measurements through the harness; reference huggingface.py:273-1763 +
main.py:47-101), as one command. For each quant spec it rebuilds the engine
from the checkpoint, runs rolling perplexity through the full harness
(task -> evaluator -> TPULM), and emits a markdown table of ppl + Δ vs the
unquantized baseline (written to --out, default RESULTS.md section).

Works on any checkpoint staged per docs/checkpoints.md; with none on disk,
scripts/train_checkpoint.py produces one locally. Config state: results are
appended to <out>.jsonl as each format completes, so a killed run resumes by
skipping finished specs.

Usage:
    python scripts/eval_formats.py \
        --pretrained checkpoints/gpt2-124m-local \
        --corpus-json corpus/test.json --split test \
        --limit 64 --out RESULTS.md
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default sweep: the reference's fake-quant zoo (SURVEY.md §2.3) in its two
# modes (w = weight path, a = activation hooks) plus this framework's packed
# real-quant serving tier (';pallas' routes matmuls through packed weights —
# bit-identical grids, so ppl must match the fake tier; running both proves
# it end-to-end on real weights).
DEFAULT_SPECS = [
    ("bf16 baseline", None),
    # weight-path fake quant (reference B17 analogue per format)
    ("w:lns8", "w:lns8"),
    ("w:lns4", "w:lns4"),
    ("w:lns4_dynamic_pervec", "w:lns4_dynamic_pervec"),  # reference B17 itself
    ("w:fp8", "w:fp8"),
    ("w:fp4", "w:fp4"),
    ("w:mx", "w:mx"),
    ("w:w8a8", "w:w8a8"),
    ("w:nf4", "w:nf4"),
    ("w:int4g", "w:int4g"),
    # activation-path fake quant (reference's forward-hook mode)
    ("a:lns8", "a:lns8"),
    ("a:lns8_dynamic_pervec", "a:lns8_dynamic_pervec"),
    ("a:fp8", "a:fp8"),
    ("a:w8a8", "a:w8a8"),
    ("a:smoothquant", "a:smoothquant"),
    ("a:zeroquant", "a:zeroquant"),
    ("a:llm_int8", "a:llm_int8"),
    ("a:vsquant", "a:vsquant"),
    ("a:mx", "a:mx"),
    # combined + packed serving tier
    ("w:lns8;a:lns8", "w:lns8;a:lns8"),
    ("w:w8a8;a:w8a8", "w:w8a8;a:w8a8"),
    ("w:lns8 packed", "w:lns8;pallas"),
    ("w:w8a8;a:w8a8 packed", "w:w8a8;a:w8a8;pallas"),
]


def run_one(pretrained, family, dtype, task_name, spec, limit, batch_size):
    from llm_lns_quantization_tpu.harness.evaluator import simple_evaluate

    margs = f"family={family},pretrained={pretrained},tokenizer={pretrained},dtype={dtype},batch_size={batch_size}"
    if spec:
        margs += f",quant={spec}"
    out = simple_evaluate(
        model="tpu", model_args=margs, tasks=[task_name], num_fewshot=0,
        no_cache=True, bootstrap_iters=0, limit=limit,
    )
    return out["results"][task_name]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", required=True)
    ap.add_argument("--family", default="gpt2")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--corpus-json", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--text-key", default="text")
    ap.add_argument("--limit", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--specs", default=None,
                    help="comma-separated quant specs overriding the default "
                         "sweep; 'baseline' = unquantized")
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    task_name = f"json={args.split}:{args.text_key}:{os.path.abspath(args.corpus_json)}"
    if args.specs:
        specs = [(s, None if s == "baseline" else s)
                 for s in args.specs.split(",")]
    else:
        specs = DEFAULT_SPECS

    state_path = args.out + ".jsonl"
    done = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["label"]] = rec

    for label, spec in specs:
        if label in done:
            print(f"skip (done): {label}", flush=True)
            continue
        t0 = time.time()
        res = run_one(args.pretrained, args.family, args.dtype, task_name,
                      spec, args.limit, args.batch_size)
        rec = {"label": label, "spec": spec,
               "word_perplexity": res["word_perplexity"],
               "byte_perplexity": res["byte_perplexity"],
               "bits_per_byte": res["bits_per_byte"],
               "seconds": round(time.time() - t0, 1)}
        done[label] = rec
        with open(state_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        gc.collect()

    base = done.get("bf16 baseline") or done.get("baseline")
    lines = [
        "| quant spec | byte ppl | bits/byte | Δ bits/byte vs baseline | word ppl |",
        "|---|---|---|---|---|",
    ]
    for label, _ in specs:
        r = done.get(label)
        if not r:
            continue
        d = (r["bits_per_byte"] - base["bits_per_byte"]) if base else float("nan")
        lines.append(
            f"| {label} | {r['byte_perplexity']:.4f} | {r['bits_per_byte']:.4f} "
            f"| {d:+.4f} | {r['word_perplexity']:.1f} |"
        )
    table = "\n".join(lines)
    print(table)
    with open(args.out + ".table.md", "w") as f:
        f.write(table + "\n")


if __name__ == "__main__":
    main()
