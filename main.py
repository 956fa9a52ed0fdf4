"""CLI entry point: evaluate a (quantized) model on a set of tasks.

Mirrors the reference's main.py:11-105 flag set, plus first-class ``--quant``
(the replacement for the reference's comment-block toggling — SURVEY.md §0).

Example:
  python main.py --model tpu \
      --model_args family=llama,pretrained=/ckpts/llama-2-7b,quant=w:lns4_dynamic_pervec \
      --tasks wikitext,hellaswag --num_fewshot 0
"""

import argparse
import json
import logging
import os

from llm_lns_quantization_tpu import tasks as task_lib
from llm_lns_quantization_tpu import utils
from llm_lns_quantization_tpu.harness import evaluator
from llm_lns_quantization_tpu.quant.config import FORMAT_REGISTRY


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--model_args", default="")
    parser.add_argument(
        "--tasks", default=None, choices=utils.MultiChoice(task_lib.ALL_TASKS)
    )
    # deprecated no-op kept for CLI compatibility (reference main.py:18,50
    # asserts it is unset; description_dict replaced it)
    parser.add_argument("--provide_description", action="store_true")
    parser.add_argument("--num_fewshot", type=int, default=0)
    parser.add_argument("--batch_size", type=str, default=None)
    parser.add_argument("--max_batch_size", type=int, default=None)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--output_path", default=None)
    parser.add_argument(
        "--limit",
        type=float,
        default=None,
        help="Limit #examples per task (<1 = fraction). Only for testing.",
    )
    # parsed-but-unused in the reference too (main.py:36); accepted so
    # reference invocations run unchanged
    parser.add_argument("--data_sampling", type=float, default=None)
    parser.add_argument("--no_cache", action="store_true")
    parser.add_argument(
        "--bootstrap_iters",
        type=int,
        default=100000,
        help="Iterations for bootstrap stderr estimates.",
    )
    parser.add_argument(
        "--quant",
        default=None,
        help=f"Quantization spec, e.g. 'w:lns8' or 'w:lns4_dynamic_pervec;a:fp8;kv:int8'. "
        f"Formats: {sorted(set(FORMAT_REGISTRY))}",
    )
    parser.add_argument(
        "--data_dir",
        default=None,
        help="Offline task data: directory of <task>/{split}.json[l] files "
        "(bypasses HF datasets).",
    )
    parser.add_argument("--decontamination_ngrams_path", default=None)
    parser.add_argument("--description_dict_path", default=None)
    parser.add_argument("--check_integrity", action="store_true")
    parser.add_argument("--write_out", action="store_true")
    parser.add_argument(
        "--trace",
        default=None,
        help="Write per-phase timing JSON to this path after the run.",
    )
    parser.add_argument(
        "--jax_profile",
        default=None,
        help="Capture a jax.profiler device trace into this directory.",
    )
    parser.add_argument("--output_base_path", type=str, default=None)
    return parser.parse_args()


def main():
    args = parse_args()

    assert not args.provide_description, (
        "--provide_description is deprecated (and was never implemented in "
        "the reference, main.py:50); use --description_dict_path"
    )

    if args.limit:
        print("WARNING: --limit SHOULD ONLY BE USED FOR TESTING. "
              "REAL METRICS SHOULD NOT BE COMPUTED USING LIMIT.")

    if args.tasks is None:
        task_names = task_lib.ALL_TASKS
    else:
        task_names = utils.pattern_match(args.tasks.split(","), task_lib.ALL_TASKS)
    print(f"Selected Tasks: {task_names}")

    description_dict = {}
    if args.description_dict_path:
        with open(args.description_dict_path, "r", encoding="utf-8") as f:
            description_dict = json.load(f)

    from llm_lns_quantization_tpu.harness import tracing

    tracer = tracing.enable() if args.trace else None
    with tracing.device_trace(args.jax_profile):
        results = evaluator.simple_evaluate(
            model=args.model,
            model_args=args.model_args,
            tasks=task_names,
            num_fewshot=args.num_fewshot,
            batch_size=args.batch_size,
            max_batch_size=args.max_batch_size,
            device=args.device,
            no_cache=args.no_cache,
            limit=args.limit,
            bootstrap_iters=args.bootstrap_iters,
            description_dict=description_dict,
            decontamination_ngrams_path=args.decontamination_ngrams_path,
            check_integrity=args.check_integrity,
            write_out=args.write_out,
            output_base_path=args.output_base_path,
            quant=args.quant,
            data_dir=args.data_dir,
        )

    if tracer is not None:
        tracer.dump(args.trace)
        print(f"trace written to {args.trace}")

    dumped = json.dumps(results, indent=2)
    print(dumped)

    if args.output_path:
        dirname = os.path.dirname(args.output_path)
        if dirname:
            os.makedirs(dirname, exist_ok=True)
        with open(args.output_path, "w", encoding="utf-8") as f:
            f.write(dumped)

    print(
        f"{args.model} ({args.model_args}), quant: {args.quant}, "
        f"limit: {args.limit}, num_fewshot: {args.num_fewshot}, "
        f"batch_size: {args.batch_size}"
    )
    print(evaluator.make_table(results))


if __name__ == "__main__":
    logging.getLogger("openai").setLevel(logging.WARNING)
    main()
