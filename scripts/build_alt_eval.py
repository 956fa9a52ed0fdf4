"""Build a second, differently-sourced eval distribution (VERDICT r4 item 5).

The round-4 accuracy zoo's per-format ORDERING was measured on one
distribution (package-docs prose + Python source, scripts/build_corpus.py).
Formats whose damage is distribution-dependent (outlier-tiered LNS,
llm_int8's threshold) could reorder on other text, so this script gathers
documents from sources the training corpus NEVER ingested — disjoint by
file-extension construction, not by sampling:

  * /usr/include C/C++ headers (.h/.hpp — corpus took only .py/.md/.rst/.txt)
  * HTML documentation shipped inside site-packages (.html, tags stripped)

Both are on-distribution ENGLISH-adjacent technical text but stylistically
far from the training mix (C declarations/macros; hypertext prose), which is
the point: per-format ppl ordering should be measured where absolute ppl is
off-domain. Output: corpus/alt_eval.json ({"test": [{"text": ...}]}), same
shape as corpus/test.json, consumable by eval_formats --corpus-json.

Usage: python scripts/build_alt_eval.py [--out corpus/alt_eval.json] [--n 320]
"""

import argparse
import hashlib
import html
import json
import os
import random
import re

H_ROOT = "/usr/include"
HTML_ROOT = "/opt/venv/lib/python3.12/site-packages"
MIN_BYTES, MAX_BYTES = 1024, 64 * 1024
DOC_CHARS = 4096  # clip documents to roughly one context window of text


def _headers():
    for dirpath, dirnames, files in os.walk(H_ROOT):
        dirnames[:] = sorted(dirnames)  # readdir order is not deterministic
        for fn in sorted(files):
            if fn.endswith((".h", ".hpp")):
                yield os.path.join(dirpath, fn)


def _htmls():
    for dirpath, dirnames, files in os.walk(HTML_ROOT):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(files):
            if fn.endswith(".html"):
                yield os.path.join(dirpath, fn)


_TAG = re.compile(r"<script.*?</script>|<style.*?</style>|<[^>]+>",
                  re.DOTALL | re.IGNORECASE)


def _strip_html(text):
    text = _TAG.sub(" ", text)
    text = html.unescape(text)
    return re.sub(r"[ \t]+", " ", re.sub(r"\n\s*\n+", "\n\n", text)).strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="corpus/alt_eval.json")
    ap.add_argument("--n", type=int, default=320)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    docs, seen = [], set()
    for kind, paths, transform in (
        ("c_header", _headers(), lambda s: s),
        ("pkg_html", _htmls(), _strip_html),
    ):
        for path in paths:
            try:
                size = os.path.getsize(path)
                if not (MIN_BYTES <= size <= MAX_BYTES):
                    continue
                with open(path, encoding="utf-8", errors="ignore") as f:
                    text = transform(f.read())
            except OSError:
                continue
            text = text[:DOC_CHARS].strip()
            if len(text) < 512:
                continue
            h = hashlib.sha1(text.encode()).hexdigest()
            if h in seen:
                continue
            seen.add(h)
            docs.append({"text": text, "source": kind})

    rng = random.Random(args.seed)
    rng.shuffle(docs)
    # keep both sources represented ~half/half up to --n
    by_kind = {}
    for d in docs:
        by_kind.setdefault(d["source"], []).append(d)
    take = []
    kinds = sorted(by_kind)
    per = args.n // len(kinds)
    for k in kinds:
        take.extend(by_kind[k][:per])
    for k in kinds:  # top up if one source ran short
        for d in by_kind[k][per:]:
            if len(take) >= args.n:
                break
            take.append(d)
    rng.shuffle(take)
    take = take[: args.n]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"test": [{"text": d["text"]} for d in take]}, f)
    stats = {
        "docs": len(take),
        "by_source": {k: sum(1 for d in take if d["source"] == k)
                      for k in kinds},
        "chars": sum(len(d["text"]) for d in take),
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
