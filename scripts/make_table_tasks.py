"""Dump the task registry as a markdown table.

Parity target: reference scripts/make_table_tasks.py.

Usage: python scripts/make_table_tasks.py [--output tasks.md]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llm_lns_quantization_tpu.tasks import TASK_REGISTRY


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    lines = ["| Task Name | Version | Dataset |", "|---|---|---|"]
    for name in sorted(TASK_REGISTRY):
        cls = TASK_REGISTRY[name]
        version = getattr(cls, "VERSION", "")
        dataset = getattr(cls, "DATASET_PATH", "") or ""
        ds_name = getattr(cls, "DATASET_NAME", None)
        if ds_name:
            dataset = f"{dataset}/{ds_name}"
        lines.append(f"| {name} | {version} | {dataset} |")
    table = "\n".join(lines)
    if args.output:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(table + "\n")
    else:
        print(table)
    print(f"\n{len(TASK_REGISTRY)} tasks registered", file=sys.stderr)


if __name__ == "__main__":
    main()
