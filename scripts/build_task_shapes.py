"""Stage BASELINE config #2's accuracy-task SHAPES from the held-out corpus.

Config #2 calls for LAMBADA/HellaSwag accuracy per quantization format. No
public LAMBADA/HellaSwag data exists on this machine (no network), so this
script derives examples with the same *request shapes* from the held-out
local-corpus documents (never seen in training) and stages them in each
REGISTERED task class's raw schema under corpus/taskdata/:

* ``lambada_standard`` — final-word prediction: a 40-80-word passage whose
  last word is the target (``{"text": passage}``; the task class splits at
  the last space, tasks/lambada.py doc_to_text/doc_to_target).
* ``hellaswag`` — 4-way ending selection: a passage prefix as context, the
  TRUE next-12-word continuation among 3 distractor continuations sampled
  from other documents (raw ``ctx_a/ctx_b/activity_label/endings/label``
  schema consumed by HellaSwag._process_doc).

The absolute accuracies are NOT comparable to the public benchmarks (the
corpus is package docs/source, the distractors are same-domain text); the
reproducible claim is the per-format ORDERING and paired Δs on identical
requests — exactly the comparison the reference ran per quant block
(reference main.py:47-101 experiment loop).

Usage: python scripts/build_task_shapes.py [--corpus corpus] [--n 320]
"""

import argparse
import json
import os
import random
import re
import sys

WORD = re.compile(r"[A-Za-z][A-Za-z0-9_']{2,}$")


def _passages(docs, rng, n, min_words=52, max_words=80):
    """Word-window passages ending at a plausible target word.

    Up to 3 attempts per document (disjoint offsets) — one window per doc
    leaves too few candidates once markup-ending windows are rejected."""
    out = []
    order = list(range(len(docs)))
    rng.shuffle(order)
    for attempt in range(3):
        for di in order:
            text = docs[di]["text"]
            words = text.split()
            if len(words) < min_words + 8:
                continue
            start = rng.randrange(0, len(words) - min_words - 4)
            span = rng.randrange(min_words, max_words + 1)
            w = words[start:start + span]
            # walk back until the passage ends in a clean word (the lambada
            # target must be a real token, not punctuation/markup)
            while len(w) > min_words // 2 and not WORD.match(w[-1]):
                w.pop()
            if len(w) <= min_words // 2 or not WORD.match(w[-1]):
                continue
            out.append((di, " ".join(w)))
            if len(out) == n:
                return out
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="corpus")
    ap.add_argument("--n", type=int, default=320)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    with open(os.path.join(args.corpus, "test.json")) as f:
        docs = json.load(f)["test"]
    rng = random.Random(args.seed)

    # ---- lambada_standard: final-word prediction
    passages = _passages(docs, rng, args.n)
    if len(passages) < args.n:
        print(f"warning: only {len(passages)} lambada passages", file=sys.stderr)
    lam_dir = os.path.join(args.corpus, "taskdata", "lambada_standard")
    os.makedirs(lam_dir, exist_ok=True)
    lam = [{"text": p} for _, p in passages]
    with open(os.path.join(lam_dir, "test.json"), "w") as f:
        json.dump(lam, f)
    # the task registers a validation split too; a small disjoint slice
    vpass = _passages(docs, random.Random(args.seed + 1), 32)
    with open(os.path.join(lam_dir, "validation.json"), "w") as f:
        json.dump([{"text": p} for _, p in vpass], f)

    # ---- hellaswag: true continuation among 3 sampled distractors
    hs_dir = os.path.join(args.corpus, "taskdata", "hellaswag")
    os.makedirs(hs_dir, exist_ok=True)
    spans = _passages(docs, random.Random(args.seed + 2), args.n,
                      min_words=44, max_words=60)
    hs = []
    for i, (di, passage) in enumerate(spans):
        words = passage.split()
        ctx_words, true_end = words[:-12], words[-12:]
        distractors = []
        seen = {di}
        # bounded: a sparse corpus (< 4 distinct eligible docs) must fail
        # with a clear message, not loop forever or IndexError on an empty
        # _passages draw (ADVICE.md r4)
        for _ in range(200):
            if len(distractors) >= 3:
                break
            drawn = _passages(docs, rng, 1, min_words=14, max_words=18)
            if not drawn:
                continue
            dj, alt = drawn[0]
            if dj in seen:
                continue
            seen.add(dj)
            distractors.append(" ".join(alt.split()[:12]))
        if len(distractors) < 3:
            raise SystemExit(
                "hellaswag shapes need >= 4 distinct docs with a 14-18 word "
                f"span; corpus has too few (got {len(distractors)} "
                "distractors after 200 draws) — enlarge the corpus or lower "
                "--n")
        endings = distractors[:]
        label = rng.randrange(4)
        endings.insert(label, " ".join(true_end))
        hs.append({
            "activity_label": "Corpus",
            "ctx_a": " ".join(ctx_words[:-1]),
            "ctx_b": ctx_words[-1],
            "endings": endings,
            "label": str(label),
        })
    with open(os.path.join(hs_dir, "validation.json"), "w") as f:
        json.dump(hs, f)

    print(json.dumps({
        "lambada_test": len(lam), "lambada_validation": len(vpass),
        "hellaswag_validation": len(hs),
        "out": os.path.join(args.corpus, "taskdata"),
    }))


if __name__ == "__main__":
    main()
