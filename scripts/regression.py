"""Cross-commit regression sweep: run a model x task matrix per git ref and
diff the metrics.

Parity target: reference scripts/regression.py:11-80+ (sequential
``git checkout`` + full main.py runs over its model/task matrix, then a
markdown comparison table).

Usage: python scripts/regression.py --branches main mybranch \
           --models tpu --tasks piqa,boolq --limit 32
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.join(os.path.dirname(__file__), "..")

# the reference's default regression set (scripts/regression.py:21-26)
DEFAULT_TASKS = "boolq,lambada_openai,winogrande,hellaswag,openbookqa,piqa,wikitext"


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--branches", nargs="+", default=[])
    parser.add_argument("--models", nargs="+", default=["tpu"])
    parser.add_argument("--model_args", default="family=gpt2,preset=tiny,dtype=float32")
    parser.add_argument("--tasks", default=DEFAULT_TASKS)
    parser.add_argument("--limit", type=float, default=16)
    parser.add_argument("--quant", default=None)
    parser.add_argument("--out_dir", default="regression_results")
    return parser.parse_args()


def run_eval(model, model_args, tasks, limit, quant, out_path):
    cmd = [
        sys.executable, os.path.join(REPO_ROOT, "main.py"),
        "--model", model,
        "--model_args", model_args,
        "--tasks", tasks,
        "--limit", str(limit),
        "--no_cache",
        "--output_path", out_path,
    ]
    if quant:
        cmd += ["--quant", quant]
    subprocess.run(cmd, check=True)


def current_ref():
    return subprocess.run(
        ["git", "rev-parse", "--abbrev-ref", "HEAD"],
        capture_output=True, text=True, cwd=REPO_ROOT, check=True,
    ).stdout.strip()


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    branches = args.branches or [current_ref()]
    initial = current_ref()

    results = {}
    try:
        for branch in branches:
            if branch != initial:
                subprocess.run(["git", "checkout", branch], cwd=REPO_ROOT, check=True)
            for model in args.models:
                out_path = os.path.join(
                    args.out_dir, f"{branch.replace('/', '-')}_{model}.json"
                )
                t0 = time.time()
                run_eval(model, args.model_args, args.tasks, args.limit, args.quant, out_path)
                with open(out_path) as f:
                    results[(branch, model)] = {
                        "results": json.load(f)["results"],
                        "seconds": time.time() - t0,
                    }
    finally:
        subprocess.run(["git", "checkout", initial], cwd=REPO_ROOT, check=True)

    # markdown comparison
    tasks = sorted({t for r in results.values() for t in r["results"]})
    keys = sorted(results)
    print("| task/metric | " + " | ".join(f"{b}:{m}" for b, m in keys) + " |")
    print("|---" * (len(keys) + 1) + "|")
    for task in tasks:
        metrics = sorted(
            {
                m
                for r in results.values()
                for m in r["results"].get(task, {})
                if not m.endswith("_stderr")
            }
        )
        for metric in metrics:
            row = [
                f"{results[k]['results'].get(task, {}).get(metric, float('nan')):.4f}"
                for k in keys
            ]
            print(f"| {task}/{metric} | " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
