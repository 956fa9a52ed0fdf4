"""Batch-serving CLI over the continuous-batching engine (lm/serve.py).

Reads JSON-lines requests from a file or stdin —
``{"id": ..., "prompt": "...", "max_new_tokens": 64}`` — admits them into the
slot pool, and writes ``{"id": ..., "completion": "..."}`` JSON lines to
stdout in request order. A serving front door the reference never had (its
generation path is lock-step whole-batch, reference huggingface.py:1993-2057).

Example:

    printf '%s\n' '{"prompt": "The capital of France is"}' \
      | python scripts/serve.py --family gpt2 --pretrained /ckpts/gpt2 \
            --quant "w:lns8;pallas" --slots 8 --max_len 512
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="gpt2")
    p.add_argument("--pretrained", default=None,
                   help="local HF checkpoint dir (omit for a random preset)")
    p.add_argument("--preset", default="tiny")
    p.add_argument("--quant", default=None, help='e.g. "w:lns8;pallas;kv:int8"')
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="decode steps fused into one device dispatch")
    p.add_argument("--max_len", type=int, default=512)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--requests", default="-",
                   help="JSONL file of requests ('-' = stdin)")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer dir (defaults to --pretrained)")
    return p.parse_args()


def main():
    args = parse_args()

    from llm_lns_quantization_tpu.lm.serve import ContinuousBatcher
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.models.tokenizer import build_tokenizer
    from llm_lns_quantization_tpu.quant import QuantConfig

    quant = QuantConfig.parse(args.quant) if args.quant else None
    bundle = build_model(
        family=args.family, preset=args.preset, checkpoint=args.pretrained,
        quant=quant,
    )
    tok = build_tokenizer(args.tokenizer or args.pretrained or "byte")

    fh = sys.stdin if args.requests == "-" else open(args.requests)
    reqs = [json.loads(line) for line in fh if line.strip()]
    if args.requests != "-":
        fh.close()
    if not reqs:
        return

    prompts = [tok.encode(r["prompt"]) for r in reqs]
    budgets = [int(r.get("max_new_tokens", args.max_new_tokens)) for r in reqs]

    batcher = ContinuousBatcher(
        bundle, quant=quant, slots=args.slots, max_len=args.max_len,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    # the engine takes one budget per call; group requests by budget so each
    # group streams through the shared slot pool
    outputs = [None] * len(reqs)
    by_budget = {}
    for i, b in enumerate(budgets):
        by_budget.setdefault(b, []).append(i)
    eot = getattr(tok, "eot_token_id", None)
    stop = (eot,) if eot is not None else ()
    for b, idxs in by_budget.items():
        outs = batcher.generate(
            [prompts[i] for i in idxs], max_new_tokens=b, stop_ids=stop
        )
        for i, o in zip(idxs, outs):
            outputs[i] = o

    for r, ids, out in zip(reqs, prompts, outputs):
        if stop and stop[0] in out:
            out = out[: out.index(stop[0])]
        print(json.dumps({
            "id": r.get("id"),
            "completion": tok.decode(out),
            "prompt_tokens": len(ids),
            "completion_tokens": len(out),
        }), flush=True)


if __name__ == "__main__":
    main()
