"""Benchmark the C++ vs Python janitor n-gram kernels.

The reference claims its C++ janitor is "much faster" but ships the benchmark
commented out (janitor.py:256-298); this one runs.

Usage: python scripts/bench_janitor.py [--mb 20]
"""

import argparse
import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llm_lns_quantization_tpu.decontamination.janitor import (
    JANITOR_CPP,
    Janitor,
    word_ngrams,
)


def synth_corpus(n_bytes: int) -> str:
    rnd = random.Random(0)
    words = []
    size = 0
    while size < n_bytes:
        w = "".join(rnd.choices(string.ascii_letters + ",.!?", k=rnd.randint(2, 12)))
        words.append(w)
        size += len(w) + 1
    return " ".join(words)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mb", type=float, default=20.0)
    args = parser.parse_args()

    corpus = synth_corpus(int(args.mb * 1e6))
    jan = Janitor()

    t0 = time.perf_counter()
    n_py = sum(1 for _ in word_ngrams(jan.normalize_string(corpus), 13))
    t_py = time.perf_counter() - t0
    print(f"python: {n_py} ngrams in {t_py:.2f}s ({args.mb / t_py:.1f} MB/s)")

    if JANITOR_CPP:
        import janitor_cc

        t0 = time.perf_counter()
        n_cc = len(janitor_cc.clean_ngram(corpus, string.punctuation, 13))
        t_cc = time.perf_counter() - t0
        print(f"c++:    {n_cc} ngrams in {t_cc:.2f}s ({args.mb / t_cc:.1f} MB/s)")
        print(f"speedup: {t_py / t_cc:.1f}x")
    else:
        print("c++ module not built (python setup.py build_ext --inplace)")


if __name__ == "__main__":
    main()
