"""Dump the few-shot prompts the harness would send, without running a model.

Parity target: reference scripts/write_out.py:25-81 (per-task files of
rendered contexts for prompt debugging).

Usage: python scripts/write_out.py --tasks piqa,boolq --num_fewshot 2 \
           --num_examples 5 --output_base_path /tmp/prompts
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llm_lns_quantization_tpu import tasks as task_lib
from llm_lns_quantization_tpu import utils

EXAMPLE_DIVIDER = "!!@@##@@!! -- Example {i}\n"


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_base_path", required=True)
    parser.add_argument("--tasks", default="all_tasks")
    parser.add_argument("--sets", type=str, default="val")  # example: val,test
    parser.add_argument("--num_fewshot", type=int, default=1)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_examples", type=int, default=1)
    parser.add_argument("--description_dict_path", default=None)
    parser.add_argument("--data_dir", default=None,
                        help="offline task data dir (as main.py --data_dir)")
    return parser.parse_args()


def main():
    args = parse_args()
    if args.tasks == "all_tasks":
        task_names = task_lib.ALL_TASKS
    else:
        task_names = utils.pattern_match(args.tasks.split(","), task_lib.ALL_TASKS)
    task_dict = task_lib.get_task_dict(task_names, data_dir=args.data_dir)

    description_dict = {}
    if args.description_dict_path:
        import json

        with open(args.description_dict_path, "r") as f:
            description_dict = json.load(f)

    os.makedirs(args.output_base_path, exist_ok=True)
    for task_name, task in task_dict.items():
        rnd = random.Random()
        rnd.seed(args.seed)

        iters = []
        for set_ in args.sets.split(","):
            docs = None
            if set_ == "train" and task.has_training_docs():
                docs = task.training_docs()
            if set_ == "val" and task.has_validation_docs():
                docs = task.validation_docs()
            if set_ == "test" and task.has_test_docs():
                docs = task.test_docs()
            if docs is not None:
                iters.append(docs)

        if not iters:
            continue
        docs = list(utils.join_iters(iters))

        description = description_dict.get(task_name, "")
        with open(
            os.path.join(args.output_base_path, task_name),
            "w",
            encoding="utf8",
        ) as f:
            for i, doc in (
                zip(range(args.num_examples), docs)
                if args.num_examples > 0
                else enumerate(docs)
            ):
                f.write(EXAMPLE_DIVIDER.format(i=i))
                ctx = task.fewshot_context(
                    doc=doc,
                    num_fewshot=args.num_fewshot,
                    rnd=rnd,
                    description=description,
                )
                f.write(ctx + "\n")

    print(f"prompts written to {args.output_base_path}")


if __name__ == "__main__":
    main()
