"""Quantization-aware finetuning CLI over the sharded QAT train step.

The reference's quantized-eval experiments lean on a QAT-finetuned LoRA
adapter trained OUTSIDE the repo (``pouya-haghi/llama2_finetune_pile``,
reference lm_eval/models/huggingface.py:273-277; every quant block carries an
STE ``autograd.Function`` for exactly this). This script closes that loop
in-framework: next-token finetuning with fake-quantized (STE) activations on
a ("data", "model") mesh, orbax checkpointing with resume, and the trained
params loadable straight into the eval engine.

Examples:

    # smoke: tiny random GPT-2 on synthetic text, 20 steps
    python scripts/train_qat.py --family gpt2 --preset tiny --steps 20

    # QAT a local checkpoint with LNS8 act quant, checkpoint + resume
    python scripts/train_qat.py --family llama --pretrained /ckpts/llama-2-7b \
        --quant "a:lns8" --data /data/pile_slice.txt --seq_len 2048 \
        --batch_size 8 --steps 1000 --ckpt_dir /ckpts/qat --save_every 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="gpt2")
    p.add_argument("--preset", default="tiny")
    p.add_argument("--pretrained", default=None,
                   help="local HF checkpoint dir (omit for a random preset)")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--quant", default="a:lns8",
                   help='QuantConfig spec for QAT, e.g. "a:lns8" or "a:fp8"')
    p.add_argument("--data", default=None,
                   help="text file (or JSONL with a 'text' field); omit for "
                        "deterministic synthetic tokens")
    p.add_argument("--seq_len", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--mesh", default=None,
                   help='"dp,tp" mesh shape (default: auto over all devices)')
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--resume", action="store_true",
                   help="restore params/opt_state/step from --ckpt_dir")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _token_stream(args, vocab_size):
    """Corpus -> flat token array (synthetic when no --data is given)."""
    if args.data is None:
        rng = np.random.default_rng(args.seed)
        return rng.integers(0, vocab_size, 512 * args.seq_len).astype(np.int32)
    from llm_lns_quantization_tpu.models.tokenizer import build_tokenizer

    tok = build_tokenizer(args.tokenizer or args.pretrained or "byte")
    toks = []
    with open(args.data) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("{"):
                try:  # JSONL row; plain-text lines may also start with '{'
                    line = json.loads(line).get("text", "")
                except json.JSONDecodeError:
                    pass
            toks.extend(tok.encode(line))
            toks.append(tok.eot_token_id)
    return np.asarray(toks, np.int32)


def _batches(stream, batch_size, seq_len, seed):
    """Yield [B, T+1] windows forever (shuffled starts, deterministic)."""
    n_windows = max(1, (len(stream) - 1) // seq_len)
    if n_windows < batch_size:
        raise ValueError(
            f"corpus has only {n_windows} windows of seq_len={seq_len} "
            f"(need >= batch_size={batch_size}); provide more data or "
            f"shrink --batch_size/--seq_len"
        )
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(n_windows)
        for i in range(0, n_windows - batch_size + 1, batch_size):
            rows = [
                stream[w * seq_len: w * seq_len + seq_len + 1]
                for w in order[i: i + batch_size]
            ]
            rows = [
                np.pad(r, (0, seq_len + 1 - len(r))) if len(r) < seq_len + 1
                else r
                for r in rows
            ]
            yield np.stack(rows)


def main():
    args = parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.parallel import (
        make_mesh,
        make_train_step,
        shard_params,
    )
    from llm_lns_quantization_tpu.parallel.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from llm_lns_quantization_tpu.parallel.mesh import data_sharding
    from llm_lns_quantization_tpu.quant import QuantConfig

    mesh_shape = tuple(int(v) for v in args.mesh.split(",")) if args.mesh else None
    mesh = make_mesh(mesh_shape)
    quant = QuantConfig.parse(args.quant) if args.quant else QuantConfig()

    bundle = build_model(
        family=args.family, preset=args.preset, checkpoint=args.pretrained,
        seed=args.seed,
    )
    params = shard_params(bundle.params, bundle, mesh)
    step_fn, init_opt = make_train_step(
        bundle, mesh, quant=quant, learning_rate=args.lr
    )
    opt_state = init_opt(params)

    start_step = 0
    if args.resume and args.ckpt_dir:
        restored = restore_checkpoint(
            args.ckpt_dir, params_like=params, opt_state_like=opt_state
        )
        params, opt_state = restored["params"], restored["opt_state"]
        start_step = int(restored.get("step", 0))
        print(f"resumed from {args.ckpt_dir} at step {start_step}", flush=True)

    stream = _token_stream(args, bundle.cfg.vocab_size)
    batches = _batches(stream, args.batch_size, args.seq_len, args.seed)
    for _ in range(start_step):  # resume continues the stream, not replays it
        next(batches)
    dsh = data_sharding(mesh)

    t0 = time.time()
    loss = float("nan")
    for step in range(start_step, args.steps):
        batch = jax.device_put(next(batches), dsh)
        params, opt_state, loss = step_fn(
            params, opt_state, batch[:, :-1], batch[:, 1:]
        )
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            loss = float(jax.device_get(loss))
            toks = (step + 1 - start_step) * args.batch_size * args.seq_len
            print(
                json.dumps({
                    "step": step + 1,
                    "loss": round(loss, 4),
                    "tokens_per_s": round(toks / (time.time() - t0), 1),
                }),
                flush=True,
            )
        if args.ckpt_dir and (step + 1) % args.save_every == 0:
            save_checkpoint(args.ckpt_dir, params, opt_state, step=step + 1)
    if args.ckpt_dir and args.steps > start_step:
        # skip when no steps ran (e.g. --resume past --steps): a rewrite
        # would stamp a LOWER step onto the restored params
        save_checkpoint(args.ckpt_dir, params, opt_state, step=args.steps)
        print(f"saved {args.ckpt_dir}", flush=True)
    return loss


if __name__ == "__main__":
    main()
