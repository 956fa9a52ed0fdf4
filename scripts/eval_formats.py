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
    # activation-path fake quant (reference's forward-hook mode) — every
    # reference method family B2-B17 represented (VERDICT r3 weak #3)
    ("a:lns8", "a:lns8"),                                # B4
    ("a:lns8_dynamic", "a:lns8_dynamic"),                # B5/B7
    ("a:lns8_dynamic_pervec", "a:lns8_dynamic_pervec"),  # B6
    ("a:lns4", "a:lns4"),                                # B14
    ("a:lns4_dynamic", "a:lns4_dynamic"),                # B15
    ("a:lns4_dynamic_pervec", "a:lns4_dynamic_pervec"),  # B16
    ("a:fp8", "a:fp8"),                                  # B2
    ("a:fp4", "a:fp4"),                                  # B13
    ("a:w8a8", "a:w8a8"),                                # B10
    ("a:smoothquant", "a:smoothquant"),                  # B11
    ("a:zeroquant", "a:zeroquant"),                      # B8
    ("a:llm_int8", "a:llm_int8"),                        # B12
    ("a:vsquant", "a:vsquant"),                          # B9
    ("a:mx", "a:mx"),                                    # B3
    # combined + packed serving tier
    ("w:lns8;a:lns8", "w:lns8;a:lns8"),
    ("w:w8a8;a:w8a8", "w:w8a8;a:w8a8"),
    ("w:mx;a:vsquant", "w:mx;a:vsquant"),  # BASELINE config #4's literal spec
    ("w:lns8 packed", "w:lns8;pallas"),
    ("w:int4g packed", "w:int4g;pallas"),
    ("w:w8a8;a:w8a8 packed", "w:w8a8;a:w8a8;pallas"),
    # KV-cache quantization accuracy (BASELINE config #3's INT8-KV spec):
    # scoring routed through the decode cache in 64-token chunks, paired
    # against the same-path bf16-cache baseline
    ("bf16 cachescore", "cscore"),
    ("kv:int8", "kv:int8;cscore"),
    ("kv:fp8", "kv:fp8;cscore"),
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
        res.update(_bootstrap_doc_stderr(out_dir, task_name))
    return res


def _bootstrap_doc_stderr(out_dir, task_name, iters=10000, seed=17):
    """Bootstrap stderr over documents for every per-doc metric.

    Reads the per-doc metric values the evaluator wrote via ``--write_out``
    and resamples documents (the exchangeable unit). Two metric shapes:

    * tuples ``(ll, words)`` / ``(ll, bytes)`` — the weighted perplexity
      family: aggregate is exp(-sum ll / sum w) (harness/metrics.py);
    * scalars (``acc``, ``acc_norm``, lambada ``ppl`` lls) — mean-aggregated
      (``ppl`` is exp(-mean ll), harness/metrics.py perplexity).

    Per-doc vectors ride the jsonl record (``doc_<metric>``) so Δ-vs-baseline
    gets a PAIRED bootstrap — same docs across formats, so the marginal
    stderr wildly overstates the uncertainty of the difference.
    """
    import ast
    import glob

    import numpy as np

    # the evaluator flattens path-bearing task names (json=...:/path) into
    # one component the same way
    safe = task_name.replace("/", "_")
    path = glob.glob(os.path.join(out_dir, f"{safe}*write_out_info.json"))
    if not path:
        return {}
    with open(path[0]) as f:
        docs = json.load(f)
    vals = {}
    skip = {"doc_id", "prompt_0", "truth"}
    for doc in docs.values() if isinstance(docs, dict) else docs:
        for metric, raw in doc.items():
            if metric in skip or metric.startswith(("prompt_", "logit_")):
                continue
            try:
                v = ast.literal_eval(raw) if isinstance(raw, str) else raw
            except (ValueError, SyntaxError):
                continue
            vals.setdefault(metric, []).append(v)
    out = {}
    rng = np.random.default_rng(seed)
    n_docs = 0
    for metric, mv in vals.items():
        if len(mv) < 2:
            continue
        n_docs = max(n_docs, len(mv))
        n = len(mv)
        idx = rng.integers(0, n, size=(iters, n))
        if isinstance(mv[0], tuple):
            ll = np.asarray([v[0] for v in mv])
            w = np.asarray([float(v[1]) for v in mv])
            agg = np.exp(-ll[idx].sum(axis=1) / w[idx].sum(axis=1))
            out[metric + "_stderr"] = float(np.std(agg))
            if metric == "byte_perplexity":
                # bits_per_byte = log2(byte_perplexity)
                out["bits_per_byte_stderr"] = float(np.std(np.log2(agg)))
                out["doc_ll"] = [round(v, 4) for v in ll]
                out["doc_bytes"] = [int(x) for x in w]
        else:
            x = np.asarray(mv, float)
            if metric == "ppl":  # lambada: per-doc lls, exp(-mean ll)
                agg = np.exp(-x[idx].mean(axis=1))
            else:
                agg = x[idx].mean(axis=1)
            out[metric + "_stderr"] = float(np.std(agg))
            out[f"doc_{metric}"] = [round(float(v), 4) for v in x]
    out["stderr_docs"] = n_docs
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


def paired_delta_mean_stderr(rec_a, rec_b, key, iters=10000, seed=29):
    """Paired bootstrap stderr of a mean-aggregated per-doc metric Δ
    (``doc_acc`` / ``doc_acc_norm`` / lambada ``doc_ppl`` lls): both formats
    scored the same docs, so documents resample jointly."""
    import numpy as np

    if key not in rec_a or key not in rec_b:
        return None
    xa = np.asarray(rec_a[key], float)
    xb = np.asarray(rec_b[key], float)
    n = len(xa)
    if len(xb) != n or n < 2:
        return None
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, size=(iters, n))
    if key == "doc_ppl":  # per-doc lls: Δ of exp(-mean ll)
        d = np.exp(-xa[idx].mean(axis=1)) - np.exp(-xb[idx].mean(axis=1))
    else:
        d = xa[idx].mean(axis=1) - xb[idx].mean(axis=1)
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
        rec = {"label": label, "spec": spec, "task": task_name,
               "seconds": round(time.time() - t0, 1)}
        for k, v in res.items():
            if isinstance(v, (int, float)) or k.startswith("doc_"):
                rec[k] = v
        done[label] = rec
        with open(state_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        gc.collect()

    base = done.get("bf16 baseline") or done.get("baseline")
    if base and "bits_per_byte" in base:
        lines = [
            "| quant spec | byte ppl | bits/byte | Δ bits/byte vs baseline | word ppl |",
            "|---|---|---|---|---|",
        ]
        for label, _ in specs:
            r = done.get(label)
            if not r or "bits_per_byte" not in r:
                continue
            d = r["bits_per_byte"] - base["bits_per_byte"]
            bpb = f"{r['bits_per_byte']:.4f}"
            if "bits_per_byte_stderr" in r:
                bpb += f" ± {r['bits_per_byte_stderr']:.4f}"
            dcell = f"{d:+.4f}"
            if r is not base:
                pse = paired_delta_bpb_stderr(r, base)
                if pse is not None:
                    dcell += f" ± {pse:.4f}"
            lines.append(
                f"| {label} | {r['byte_perplexity']:.4f} | {bpb} "
                f"| {dcell} | {r['word_perplexity']:.1f} |"
            )
    else:
        # accuracy-style tasks (lambada/hellaswag): generic metric columns
        # with paired Δ stderrs where per-doc vectors exist
        metrics = [k for k, v in (base or {}).items()
                   if isinstance(v, float) and not k.endswith("_stderr")
                   and not k.startswith("doc_") and k != "seconds"]
        hdr = " | ".join(
            f"{m} (Δ vs baseline ±paired)" for m in metrics)
        lines = [f"| quant spec | {hdr} |",
                 "|---" * (1 + len(metrics)) + "|"]
        for label, _ in specs:
            r = done.get(label)
            if not r:
                continue
            cells = []
            for m in metrics:
                v = r.get(m)
                if v is None:
                    cells.append("—")
                    continue
                cell = f"{v:.4f}"
                if r is not base and base and m in base:
                    d = v - base[m]
                    se = paired_delta_mean_stderr(r, base, "doc_" + m)
                    cell += (f" ({d:+.4f} ± {se:.4f})" if se is not None
                             else f" ({d:+.4f})")
                cells.append(cell)
            lines.append(f"| {label} | " + " | ".join(cells) + " |")
    table = "\n".join(lines)
    print(table)
    with open(args.out + ".table.md", "w") as f:
        f.write(table + "\n")


if __name__ == "__main__":
    main()
