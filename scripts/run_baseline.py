"""Run the BASELINE.json evaluation configs.

Each config maps to a main.py invocation; checkpoints and task data must be
local (no-network environment — see scripts/download_task_data.py). Configs
needing hardware that isn't attached (multi-host for #5) print the command
instead of running it.

Usage:
  python scripts/run_baseline.py --config 1 \
      --checkpoint /ckpts/gpt2-124m --data_dir /data/tasks
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

CONFIGS = {
    # BASELINE.json "configs" 1-5
    1: dict(
        desc="GPT-2 124M, LNS8 weight-only fake-quant, WikiText ppl",
        family="gpt2", quant="w:lns8", tasks="wikitext",
    ),
    2: dict(
        desc="OPT-1.3B, dynamic per-block LNS4 + FP8 weight-only, lambada/hellaswag",
        family="opt", quant="w:lns4_dynamic_pervec", tasks="lambada_openai,hellaswag",
    ),
    3: dict(
        desc="Llama-2-7B, SmoothQuant W8A8 + INT8 KV-cache",
        family="llama", quant="a:smoothquant;w:w8a8;kv:int8",
        tasks="wikitext,hellaswag",
    ),
    4: dict(
        desc="Llama-2-13B, MX block floating-point + VSQuant, tensor-sharded",
        family="llama", quant="w:mx;a:vsquant", tasks="wikitext",
        extra_model_args="shard=True",
    ),
    5: dict(
        desc="Llama-2-70B, LNS4 weights + FP8 acts + INT8 KV, N>=2 hosts",
        family="llama", quant="w:lns4_dynamic_pervec;a:fp8;kv:int8",
        tasks="wikitext", multihost=True,
    ),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, required=True, choices=sorted(CONFIGS))
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--limit", type=float, default=None)
    parser.add_argument("--output_path", default=None)
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()

    cfg = CONFIGS[args.config]
    model_args = f"family={cfg['family']},pretrained={args.checkpoint},batch_size=auto"
    if cfg.get("extra_model_args"):
        model_args += "," + cfg["extra_model_args"]

    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--model", "tpu",
        "--model_args", model_args,
        "--quant", cfg["quant"],
        "--tasks", cfg["tasks"],
        "--no_cache",
    ]
    if args.data_dir:
        cmd += ["--data_dir", args.data_dir]
    if args.limit:
        cmd += ["--limit", str(args.limit)]
    if args.output_path:
        cmd += ["--output_path", args.output_path]

    print(f"# config {args.config}: {cfg['desc']}")
    print(" ".join(cmd))
    if cfg.get("multihost"):
        print("# NOTE: launch this same command on every host of the pod "
              "slice (jax.distributed auto-initializes on TPU pods).")
    if args.dry_run or cfg.get("multihost"):
        return
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
