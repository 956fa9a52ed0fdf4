"""Render saved result JSONs as one markdown table.

Parity target: reference scripts/make_table_results.py.

Usage: python scripts/make_table_results.py <results_dir_or_json> [...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llm_lns_quantization_tpu.harness.evaluator import make_table


def main():
    paths = sys.argv[1:]
    files = []
    for p in paths:
        if os.path.isdir(p):
            files += [
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".json")
            ]
        else:
            files.append(p)
    for f in files:
        with open(f, encoding="utf-8") as fh:
            results = json.load(fh)
        print(f"### {os.path.basename(f)}\n")
        print(make_table(results))


if __name__ == "__main__":
    main()
