"""Train a real GPT-2 checkpoint on the local corpus (TPU) and export HF layout.

Produces the "actual pretrained weights" for the end-to-end accuracy table
(VERDICT round-1 item #1; BASELINE.json config #1 shape): no pretrained
checkpoint or public corpus exists on this machine and there is no network,
so the checkpoint is trained here, on real text gathered by
scripts/build_corpus.py, with the framework's own sharded train step
(parallel/train.py). The result is a standard HF ``GPT2LMHeadModel``
safetensors checkpoint + trained ByteLevelBPE tokenizer, loadable both by
this framework's ``pretrained=<dir>`` drop-dir contract (docs/checkpoints.md)
and by stock transformers.

Usage (defaults train the 124M GPT-2-small shape for ~3000 steps):
    python scripts/build_corpus.py --out corpus
    python scripts/train_checkpoint.py --corpus corpus --out checkpoints/gpt2-124m-local

Resume/inspect: losses are appended to <out>/train_log.jsonl as they stream.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EOT = "<|endoftext|>"


def build_or_load_tokenizer(corpus_dir, out_dir, vocab_size):
    """Train a ByteLevelBPE on the corpus (or reuse one already exported)."""
    import transformers

    tok_json = os.path.join(out_dir, "tokenizer.json")
    if os.path.exists(tok_json):
        return transformers.AutoTokenizer.from_pretrained(out_dir)

    from tokenizers.implementations import ByteLevelBPETokenizer

    def doc_iter():
        with open(os.path.join(corpus_dir, "train.jsonl"), encoding="utf-8") as f:
            for line in f:
                yield json.loads(line)["text"]

    bpe = ByteLevelBPETokenizer()
    bpe.train_from_iterator(
        doc_iter(), vocab_size=vocab_size, min_frequency=2, special_tokens=[EOT]
    )
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=bpe._tokenizer,
        eos_token=EOT, bos_token=EOT, unk_token=EOT,
        model_max_length=1024,
    )
    os.makedirs(out_dir, exist_ok=True)
    tok.save_pretrained(out_dir)
    return tok


def build_or_load_tokens(corpus_dir, out_dir, tok):
    """One uint16 token stream, EOT-separated documents, memmap-cached."""
    import numpy as np

    cache = os.path.join(corpus_dir, "tokens_u16.bin")
    if not os.path.exists(cache):
        eot_id = tok.convert_tokens_to_ids(EOT)
        texts = []
        with open(os.path.join(corpus_dir, "train.jsonl"), encoding="utf-8") as f:
            for line in f:
                texts.append(json.loads(line)["text"])
        n_total = 0
        with open(cache + ".tmp", "wb") as out:
            bs = 256
            for i in range(0, len(texts), bs):
                enc = tok(texts[i : i + bs], add_special_tokens=False)["input_ids"]
                for ids in enc:
                    arr = np.asarray(ids + [eot_id], dtype=np.uint16)
                    arr.tofile(out)
                    n_total += arr.size
        os.replace(cache + ".tmp", cache)
        print(f"tokenized: {n_total} tokens", flush=True)
    return np.memmap(cache, dtype=np.uint16, mode="r")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="corpus")
    ap.add_argument("--out", default="checkpoints/gpt2-124m-local")
    ap.add_argument("--vocab", type=int, default=50257)
    ap.add_argument("--family", default="gpt2", choices=["gpt2", "opt"],
                    help="model family to train (hf_export.SAVERS keys); "
                    "opt runs the same protocol through models/opt.py for "
                    "the BASELINE config-#2 accuracy experiment")
    ap.add_argument("--preset", default="small")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-minutes", type=float, default=180.0,
                    help="hard wall-clock budget; saves whatever it has")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--platform", default=None,
                    help="e.g. cpu for a smoke run (default: real TPU)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp
    import optax

    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.models.hf_export import SAVERS
    from llm_lns_quantization_tpu.parallel import make_mesh, make_train_step, shard_params
    from llm_lns_quantization_tpu.parallel.mesh import data_sharding

    tok = build_or_load_tokenizer(args.corpus, args.out, args.vocab)
    stream = build_or_load_tokens(args.corpus, args.out, tok)
    print(f"token stream: {stream.size} tokens", flush=True)

    if args.family == "gpt2":
        overrides = {"vocab_size": args.vocab, "n_positions": args.seq}
    else:  # opt
        overrides = {"vocab_size": args.vocab, "max_position_embeddings": args.seq}
    bundle = build_model(
        family=args.family, preset=args.preset, dtype=jnp.float32,
        seed=args.seed, config_overrides=overrides,
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(bundle.params))
    print(f"model: {n_params/1e6:.1f}M params", flush=True)

    n_dev = len(jax.devices())
    mesh = make_mesh(shape=(n_dev, 1))
    params = shard_params(bundle.params, bundle, mesh)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.lr, warmup_steps=args.warmup,
        decay_steps=args.steps, end_value=args.lr * 0.1,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=0.01),
    )
    step_fn, init_opt = make_train_step(bundle, mesh, tx=tx)
    opt_state = init_opt(params)

    rng = np.random.default_rng(args.seed)
    tok_shard = data_sharding(mesh)

    def sample_batch():
        starts = rng.integers(0, stream.size - args.seq - 1, size=args.batch)
        rows = np.stack([stream[s : s + args.seq + 1] for s in starts]).astype(np.int32)
        tokens = jax.device_put(jnp.asarray(rows[:, :-1]), tok_shard)
        targets = jax.device_put(jnp.asarray(rows[:, 1:]), tok_shard)
        return tokens, targets

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "train_log.jsonl")
    log = open(log_path, "a")
    t0 = time.time()
    deadline = t0 + args.max_minutes * 60
    loss = None
    done = 0
    for step in range(args.steps):
        tokens, targets = sample_batch()
        params, opt_state, loss = step_fn(params, opt_state, tokens, targets)
        done = step + 1
        if done % args.log_every == 0 or done == args.steps:
            lval = float(jax.device_get(loss))  # sync point (tunnel: BUR lies)
            dt = time.time() - t0
            rec = {"step": done, "loss": round(lval, 4),
                   "tok_per_s": round(done * args.batch * args.seq / dt),
                   "elapsed_s": round(dt, 1)}
            print(json.dumps(rec), flush=True)
            log.write(json.dumps(rec) + "\n")
            log.flush()
            if time.time() > deadline:
                print("wall-clock budget reached; saving early", flush=True)
                break

    final = jax.device_get(params)
    SAVERS[args.family](
        bundle.cfg, final, args.out,
        eos_token_id=tok.convert_tokens_to_ids(EOT),
    )
    meta = {"steps_done": done, "final_loss": float(jax.device_get(loss)),
            "family": args.family,
            "batch": args.batch, "seq": args.seq, "params_m": n_params / 1e6,
            "corpus_tokens": int(stream.size)}
    with open(os.path.join(args.out, "train_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta), flush=True)


if __name__ == "__main__":
    main()
