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


def run_one(pretrained, family, dtype, task_name, spec, limit, batch_size,
            data_dir=None, stderr_docs=False):
    from llm_lns_quantization_tpu.harness.evaluator import simple_evaluate

    margs = f"family={family},pretrained={pretrained},tokenizer={pretrained},dtype={dtype},batch_size={batch_size}"
    # ';cscore' pseudo-flag (sweep-local, not a QuantConfig field): route
    # scoring through the KV cache in 64-token chunks (TPULM score_chunk) so
    # kv:int8/kv:fp8 specs measure the cache quantization's accuracy cost;
    # 'cscore' alone is the same-path bf16 baseline those rows pair against
    if spec and "cscore" in spec:
        parts = [p for p in spec.split(";") if p and p != "cscore"]
        spec = ";".join(parts) or None
        margs += ",score_chunk=64"
    if spec:
        margs += f",quant={spec}"
    kwargs = {}
    out_dir = None
    if stderr_docs:
        # per-doc (ll, weight) pairs ride the existing --write_out surface;
        # bootstrap CIs are computed here rather than in the harness because
        # the reference's stderr_for_metric (metrics.py:176-181) deliberately
        # excludes the weighted perplexity family and the result-dict shape
        # is a pinned behavioral contract (goldens + oracle parity)
        import tempfile

        out_dir = tempfile.mkdtemp(prefix="evalfmt_writeout_")
        kwargs = {"write_out": True, "output_base_path": out_dir}
    out = simple_evaluate(
        model="tpu", model_args=margs, tasks=[task_name], num_fewshot=0,
        no_cache=True, bootstrap_iters=0, limit=limit, data_dir=data_dir,
        **kwargs,
    )
    res = dict(out["results"][task_name])
    if stderr_docs:
        res.update(_bootstrap_ppl_stderr(out_dir, task_name))
    return res


def _bootstrap_ppl_stderr(out_dir, task_name, iters=10000, seed=17):
    """Bootstrap stderr of the weighted perplexity family over documents.

    Reads the per-doc metric tuples (``(ll, words)`` / ``(ll, bytes)``) the
    evaluator wrote via ``--write_out`` and resamples documents: the
    aggregate is exp(-sum ll / sum w) (harness/metrics.py
    weighted_perplexity), so the doc is the exchangeable unit.
    """
    import ast
    import glob
    import math

    import numpy as np

    path = glob.glob(os.path.join(out_dir, f"{task_name}*write_out_info.json"))
    if not path:
        return {}
    with open(path[0]) as f:
        docs = json.load(f)
    pairs = {"word_perplexity": [], "byte_perplexity": []}
    for doc in docs.values() if isinstance(docs, dict) else docs:
        for metric in pairs:
            if metric in doc:
                pairs[metric].append(ast.literal_eval(doc[metric]))
    out = {}
    rng = np.random.default_rng(seed)
    for metric, vals in pairs.items():
        if len(vals) < 2:
            continue
        ll = np.asarray([v[0] for v in vals])
        w = np.asarray([float(v[1]) for v in vals])
        n = len(vals)
        idx = rng.integers(0, n, size=(iters, n))
        agg = np.exp(-ll[idx].sum(axis=1) / w[idx].sum(axis=1))
        out[metric + "_stderr"] = float(np.std(agg))
        if metric == "byte_perplexity":
            # bits_per_byte = log2(byte_perplexity)
            out["bits_per_byte_stderr"] = float(np.std(np.log2(agg)))
    out["stderr_docs"] = len(pairs["byte_perplexity"])
    # per-doc (ll, bytes) pairs ride the jsonl record so Δ-vs-baseline gets
    # a PAIRED bootstrap (same docs across formats => the marginal stderr
    # wildly overstates the uncertainty of the difference)
    bp = pairs["byte_perplexity"]
    out["doc_ll"] = [round(v[0], 4) for v in bp]
    out["doc_bytes"] = [int(v[1]) for v in bp]
    return out


def paired_delta_bpb_stderr(rec_a, rec_b, iters=10000, seed=23):
    """Bootstrap stderr of (bits_per_byte_a - bits_per_byte_b) resampling
    DOCUMENTS jointly — both formats scored the same docs, so the per-doc
    lls are highly correlated and the paired stderr is far tighter than the
    marginal ones."""
    import numpy as np

    la = np.asarray(rec_a["doc_ll"])
    lb = np.asarray(rec_b["doc_ll"])
    w = np.asarray(rec_a["doc_bytes"], float)
    n = len(la)
    if len(lb) != n:
        return None
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, size=(iters, n))
    ws = w[idx].sum(axis=1)
    d = (-la[idx].sum(axis=1) / ws + lb[idx].sum(axis=1) / ws) / np.log(2.0)
    return float(np.std(d))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", required=True)
    ap.add_argument("--family", default="gpt2")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--corpus-json", default=None,
                    help="json= corpus-file route (round-2 style)")
    ap.add_argument("--task", default=None,
                    help="evaluate through a REGISTERED task class instead "
                         "of the json= route (e.g. wikitext with --data_dir "
                         "staging the docs; the round-3 default experiment)")
    ap.add_argument("--data_dir", default=None,
                    help="offline task-data dir for --task")
    ap.add_argument("--stderr", action="store_true",
                    help="bootstrap per-document error bars for the "
                         "perplexity family (resamples docs, 10k iters)")
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

    if args.task:
        task_name = args.task
    else:
        assert args.corpus_json, "need --task or --corpus-json"
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
                      spec, args.limit, args.batch_size,
                      data_dir=args.data_dir, stderr_docs=args.stderr)
        rec = {"label": label, "spec": spec,
               "word_perplexity": res["word_perplexity"],
               "byte_perplexity": res["byte_perplexity"],
               "bits_per_byte": res["bits_per_byte"],
               "seconds": round(time.time() - t0, 1)}
        for k in ("word_perplexity_stderr", "byte_perplexity_stderr",
                  "bits_per_byte_stderr", "stderr_docs", "doc_ll",
                  "doc_bytes"):
            if k in res:
                rec[k] = res[k]
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
        bpb = f"{r['bits_per_byte']:.4f}"
        if "bits_per_byte_stderr" in r:
            bpb += f" ± {r['bits_per_byte_stderr']:.4f}"
        lines.append(
            f"| {label} | {r['byte_perplexity']:.4f} | {bpb} "
            f"| {d:+.4f} | {r['word_perplexity']:.1f} |"
        )
    table = "\n".join(lines)
    print(table)
    with open(args.out + ".table.md", "w") as f:
        f.write(table + "\n")


if __name__ == "__main__":
    main()
