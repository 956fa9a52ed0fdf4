"""Post-hoc attach per-doc (ll, bytes) pairs + paired-Δ stderrs to a sweep.

The round-3 sweep ran before eval_formats.py learned to store per-doc pairs
in its jsonl records, but every spec's --write_out temp dir
(/tmp/evalfmt_writeout_*) persists for the session. This maps those dirs to
the jsonl records by mtime order (the sweep is strictly sequential),
verifies the mapping via the byte-count vector (identical doc set across
specs), rewrites <out>.jsonl with doc_ll/doc_bytes attached, and prints the
paired Δ-bits/byte ± stderr table vs the baseline record.

Usage: python scripts/salvage_paired_stderr.py --jsonl RESULTS.md.jsonl
"""

import argparse
import ast
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from eval_formats import paired_delta_bpb_stderr  # noqa: E402


def extract_pairs(write_out_dir, task="wikitext"):
    path = glob.glob(os.path.join(write_out_dir, f"{task}*write_out_info.json"))
    if not path:
        return None
    with open(path[0]) as f:
        docs = json.load(f)
    pairs = []
    for doc in (docs.values() if isinstance(docs, dict) else docs):
        if "byte_perplexity" in doc:
            pairs.append(ast.literal_eval(doc["byte_perplexity"]))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default="RESULTS.md.jsonl")
    ap.add_argument("--tmpglob", default="/tmp/evalfmt_writeout_*")
    args = ap.parse_args()

    recs = [json.loads(l) for l in open(args.jsonl)]
    dirs = sorted(glob.glob(args.tmpglob), key=os.path.getmtime)
    assert len(dirs) >= len(recs), (len(dirs), len(recs))
    dirs = dirs[-len(recs):]  # the sweep's dirs are the most recent ones

    ref_bytes = None
    for rec, d in zip(recs, dirs):
        if "doc_ll" not in rec:
            pairs = extract_pairs(d)
            assert pairs, d
            rec["doc_ll"] = [round(p[0], 4) for p in pairs]
            rec["doc_bytes"] = [int(p[1]) for p in pairs]
        # validate pre-populated records too: a record carrying doc_ll from a
        # different doc set would silently yield se=None below (ADVICE.md r3)
        if ref_bytes is None:
            ref_bytes = rec["doc_bytes"]
        else:
            assert rec["doc_bytes"] == ref_bytes, (
                "doc set mismatch — mtime mapping wrong for " + rec["label"])

    base = next(r for r in recs if r["label"] in ("baseline", "bf16 baseline"))
    print("| spec | bits/byte | Δ vs baseline (paired) |")
    print("|---|---|---|")
    for rec in recs:
        if rec is base:
            print(f"| {rec['label']} | {rec['bits_per_byte']:.4f} "
                  f"± {rec.get('bits_per_byte_stderr', float('nan')):.4f} | — |")
            continue
        se = paired_delta_bpb_stderr(rec, base)
        d = rec["bits_per_byte"] - base["bits_per_byte"]
        rec["delta_bpb_vs_baseline"] = round(d, 6)
        rec["delta_bpb_paired_stderr"] = round(se, 6) if se else None
        se_txt = f"{se:.4f}" if se is not None else "n/a"
        print(f"| {rec['label']} | {rec['bits_per_byte']:.4f} | "
              f"{d:+.4f} ± {se_txt} |")

    with open(args.jsonl, "w") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")
    print(f"rewrote {args.jsonl} with per-doc pairs + paired stderrs")


if __name__ == "__main__":
    main()
