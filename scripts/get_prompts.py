"""Print a few example (context, target) pairs per task for quick inspection.

Parity target: reference scripts/get_prompts.py.

Usage: python scripts/get_prompts.py --tasks piqa,boolq [--num 2] [--data_dir DIR]
"""

import argparse
import os
import random
import sys
from itertools import islice

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llm_lns_quantization_tpu import tasks as task_lib
from llm_lns_quantization_tpu import utils


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tasks", required=True)
    parser.add_argument("--num", type=int, default=1)
    parser.add_argument("--data_dir", default=None)
    args = parser.parse_args()

    names = utils.pattern_match(args.tasks.split(","), task_lib.ALL_TASKS)
    ctx_len = 0
    for name, task in task_lib.get_task_dict(names, data_dir=args.data_dir).items():
        rnd = random.Random(42)
        docs = task.validation_docs() if task.has_validation_docs() else task.test_docs()
        for i, doc in enumerate(islice(docs, args.num)):
            ctx = task.fewshot_context(doc=doc, num_fewshot=0, rnd=rnd)
            print(f"========= {name} [{i}] =========")
            print(ctx, end="")
            print(f"|{task.doc_to_target(doc)}|")
            ctx_len = max(ctx_len, len(ctx))
    print(f"\nmax context chars: {ctx_len}", file=sys.stderr)


if __name__ == "__main__":
    main()
