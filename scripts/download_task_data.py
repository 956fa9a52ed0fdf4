"""Fetch task datasets into the offline --data_dir layout.

Run this once on a machine WITH network access; copy the resulting directory
to the air-gapped TPU host and pass it as --data_dir. (The reference instead
relies on HF's cache being warm; this makes the offline contract explicit.)

Usage: python scripts/download_task_data.py --tasks piqa,boolq --out /data/tasks
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llm_lns_quantization_tpu import tasks as task_lib
from llm_lns_quantization_tpu import utils


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tasks", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--limit", type=int, default=None,
                        help="cap docs per split (for smoke-test bundles)")
    args = parser.parse_args()

    names = utils.pattern_match(args.tasks.split(","), task_lib.ALL_TASKS)
    for name in names:
        print(f"downloading {name} ...")
        task = task_lib.get_task(name)()  # hits the HF hub
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        # dump EVERY split the dataset ships — tasks read names beyond
        # train/validation/test (MMLU/C-Eval/CMMLU dev, C-Eval val, ANLI
        # train_r1..test_r3) and the offline loader keys splits by file stem
        try:
            splits = list(task.dataset.keys())
        except Exception:
            splits = ["train", "validation", "test"]
        for split in splits:
            try:
                rows = task.dataset[split] if split in task.dataset else None
            except Exception:
                rows = None
            if rows is None:
                continue
            rows = list(rows)
            if args.limit:
                rows = rows[: args.limit]
            with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
                json.dump(rows, f, ensure_ascii=False)
            print(f"  {split}: {len(rows)} docs")
    print("done")


if __name__ == "__main__":
    main()
