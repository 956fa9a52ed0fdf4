"""Corpus statistics for the decontamination pipeline.

Parity target: reference scripts/clean_training_data/investigate_pile.py —
scans a directory of *.jsonl.zst training shards and writes
``pile_statistics.json`` with the same schema the reference checks in at its
repo root (pile_statistics.json:1-10): document count, total characters, and
the per-file document start offsets stage 1 (generate_13_grams.py) uses to
assign stable global document ids.

The reference fans out over tqdm_multiprocess with hardcoded paths; here the
scan is a plain sequential stream (the zstd read is IO-bound either way) and
the corpus directory / output path are arguments.

Usage: python investigate_pile.py -dir <corpus_dir> [-o pile_statistics.json]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from llm_lns_quantization_tpu.decontamination.archiver import Reader


def file_stats(path):
    """(document_count, total_chars) for one jsonl.zst shard."""
    docs = 0
    chars = 0
    for document in Reader().read(path):
        docs += 1
        chars += len(document)
    return docs, chars


def corpus_stats(corpus_dir):
    files = sorted(glob.glob(os.path.join(corpus_dir, "*.jsonl.zst*")))
    if not files:
        raise SystemExit(f"no *.jsonl.zst shards under {corpus_dir}")
    per_file = []
    for path in files:
        print(f"scanning {path}", file=sys.stderr)
        per_file.append(file_stats(path))

    start_offsets = []
    offset = 0
    for docs, _ in per_file:
        start_offsets.append(offset)
        offset += docs
    total_docs = sum(d for d, _ in per_file)
    total_chars = sum(c for _, c in per_file)
    return total_docs, total_chars, start_offsets


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-dir", "--directory", default="pile")
    parser.add_argument("-o", "--output", default="pile_statistics.json")
    args = parser.parse_args()

    if os.path.exists(args.output):
        stats = json.load(open(args.output))
    else:
        docs, chars, offsets = corpus_stats(args.directory)
        stats = {
            "Data": "Pile statistics",
            "Document Count": docs,
            "Total Pile Characters": chars,
            "File Start Offsets": offsets,
        }
        with open(args.output, "w") as f:
            json.dump(stats, f, indent=4)

    print(f"document_count: {stats['Document Count']}")
    print(f"total_chars: {stats['Total Pile Characters']}")
    print(f"start_offsets: {stats['File Start Offsets']}")


if __name__ == "__main__":
    main()
