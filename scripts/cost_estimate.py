"""Estimate API token cost of an eval run without calling any API.

Parity target: reference scripts/cost_estimate.py (DryrunLM token counting).
Runs the full evaluator loop against a token-counting fake LM and reports
tokens per task.

Usage: python scripts/cost_estimate.py --tasks piqa --limit 100
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llm_lns_quantization_tpu import tasks as task_lib
from llm_lns_quantization_tpu import utils
from llm_lns_quantization_tpu.harness import evaluate
from llm_lns_quantization_tpu.harness.api import LM


class DryrunLM(LM):
    """Counts tokens (whitespace-word approximation * 1.3, the reference's
    GPT-2-ish fudge) instead of scoring."""

    def __init__(self):
        super().__init__()
        self.tokencost = 0

    def tok_count(self, string: str) -> int:
        return int(len(string.split()) * 1.3) + 1

    def loglikelihood(self, requests):
        res = []
        for ctx, cont in requests:
            res.append((-1.0, False))
            self.tokencost += self.tok_count(ctx + cont)
        return res

    def greedy_until(self, requests):
        res = []
        for ctx, _ in requests:
            res.append("lol")
            self.tokencost += self.tok_count(ctx) + 256
        return res

    def loglikelihood_rolling(self, requests):
        res = []
        for (s,) in requests:
            res.append(-1.0)
            self.tokencost += self.tok_count(s)
        return res


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tasks", default="all_tasks")
    parser.add_argument("--num_fewshot", type=int, default=0)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--data_dir", default=None,
                        help="offline task data dir (as main.py --data_dir)")
    args = parser.parse_args()

    if args.tasks == "all_tasks":
        task_names = task_lib.ALL_TASKS
    else:
        task_names = utils.pattern_match(args.tasks.split(","), task_lib.ALL_TASKS)

    values = []
    for taskname in task_names:
        lm = DryrunLM()
        task_dict = task_lib.get_task_dict([taskname], data_dir=args.data_dir)
        evaluate(
            lm=lm, task_dict=task_dict, num_fewshot=args.num_fewshot,
            limit=args.limit, bootstrap_iters=10,
        )
        print(taskname, lm.tokencost)
        values.append([taskname, lm.tokencost])

    print("Total tokens:", sum(v[1] for v in values))


if __name__ == "__main__":
    main()
