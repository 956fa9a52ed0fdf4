"""Metric and aggregation functions + bootstrap standard errors.

Same metric set and aggregation semantics as the reference's
lm_eval/metrics.py (perplexity family :94-108, classification metrics, BLEU /
chrF / TER via sacrebleu :111-154, multiprocessing bootstrap stderr
:192-252). sklearn/sacrebleu are imported lazily so the core harness has no
hard dependency on them.
"""

import math
import random
from collections.abc import Iterable


def mean(arr):
    return sum(arr) / len(arr)


def pop_stddev(arr):
    mu = mean(arr)
    return math.sqrt(sum((x - mu) ** 2 for x in arr) / len(arr))


def sample_stddev(arr):
    mu = mean(arr)
    return math.sqrt(sum((x - mu) ** 2 for x in arr) / (len(arr) - 1))


def mean_stderr(arr):
    return sample_stddev(arr) / math.sqrt(len(arr))


def median(arr):
    return arr[len(arr) // 2]


def matthews_corrcoef(items):
    import sklearn.metrics

    golds, preds = zip(*items)
    return sklearn.metrics.matthews_corrcoef(golds, preds)


def f1_score(items):
    import numpy as np
    import sklearn.metrics

    golds, preds = zip(*items)
    return np.max(sklearn.metrics.f1_score(golds, preds))


def acc_all(items):
    # count a SuperGLUE-style question as correct only if every sub-answer is
    import numpy as np

    question_scoring_dict = {}
    preds = list(zip(*items))[0]
    docs = list(zip(*items))[1]
    for doc, pred in zip(docs, preds):
        key = (doc["idx"]["paragraph"], doc["idx"]["question"])
        question_scoring_dict.setdefault(key, []).append((doc["label"] == 1) == pred)
    return np.mean([int(all(x)) for x in question_scoring_dict.values()])


def acc_all_stderr(items):
    question_scoring_dict = {}
    preds = list(zip(*items))[0]
    docs = list(zip(*items))[1]
    for doc, pred in zip(docs, preds):
        key = doc["idx"]["question"]
        question_scoring_dict.setdefault(key, []).append((doc["label"] == 1) == pred)
    return mean_stderr([int(all(x)) for x in question_scoring_dict.values()])


def metric_max_over_ground_truths(metric_fn, prediction, ground_truths):
    return max(metric_fn(prediction, gt) for gt in ground_truths)


def perplexity(items):
    return math.exp(-mean(items))


def weighted_mean(items):
    a, b = zip(*items)
    return sum(a) / sum(b)


def weighted_perplexity(items):
    # items: (document NLL, word-or-byte count) pairs
    return math.exp(-weighted_mean(items))


def bits_per_byte(items):
    return -weighted_mean(items) / math.log(2)


def is_non_str_iterable(obj):
    return isinstance(obj, Iterable) and not isinstance(obj, str)


def _sacreformat(refs, preds):
    """Reshape (refs, preds) into sacrebleu's corpus format."""
    if not is_non_str_iterable(refs):
        refs = list(refs)
    if not is_non_str_iterable(refs[0]):
        refs = [[ref] for ref in refs]
    refs = list(zip(*refs))
    if not is_non_str_iterable(preds):
        preds = list(preds)
    if is_non_str_iterable(preds[0]):
        assert len(preds[0]) == 1, f"Pred must be a str, was {preds[0]}"
        preds = [pred[0] for pred in preds]
    return refs, preds


def bleu(items):
    import sacrebleu

    refs, preds = _sacreformat(list(zip(*items))[0], list(zip(*items))[1])
    return sacrebleu.corpus_bleu(preds, refs).score


def chrf(items):
    import sacrebleu

    refs, preds = _sacreformat(list(zip(*items))[0], list(zip(*items))[1])
    return sacrebleu.corpus_chrf(preds, refs).score


def ter(items):
    import sacrebleu

    refs, preds = _sacreformat(list(zip(*items))[0], list(zip(*items))[1])
    return sacrebleu.corpus_ter(preds, refs).score


# --------------------------------------------------------------------------
# bootstrap stderr
# --------------------------------------------------------------------------


class _bootstrap_internal:
    def __init__(self, f, n):
        self.f = f
        self.n = n

    def __call__(self, v):
        i, xs = v
        rnd = random.Random()
        rnd.seed(i)
        return [self.f(rnd.choices(xs, k=len(xs))) for _ in range(self.n)]


def bootstrap_stderr(f, xs, iters):
    """Bootstrap resampling stderr, parallelized over processes.

    Seeded per chunk exactly like the reference (metrics.py:192-233) so
    results are reproducible regardless of pool size.
    """
    import multiprocessing as mp

    chunk_size = min(1000, iters)
    work = [(i, xs) for i in range(iters // chunk_size)]
    res = []
    if len(work) > 1 and mp.cpu_count() > 1:
        with mp.Pool(min(mp.cpu_count(), len(work))) as pool:
            for bootstrap in pool.imap(_bootstrap_internal(f, chunk_size), work):
                res.extend(bootstrap)
    else:
        runner = _bootstrap_internal(f, chunk_size)
        for v in work:
            res.extend(runner(v))
    return sample_stddev(res)


def stderr_for_metric(metric, bootstrap_iters):
    bootstrappable = [median, matthews_corrcoef, f1_score, perplexity, bleu, chrf, ter]
    if metric in bootstrappable:
        if bootstrap_iters <= 0:
            # bootstrap_iters=0 is the documented "skip stderrs" setting
            # (eval_formats computes its own per-doc CIs); without this
            # gate the chunked bootstrap divides by zero on bootstrappable
            # metrics like lambada's ppl
            return None
        return lambda x: bootstrap_stderr(metric, x, iters=bootstrap_iters)
    stderr = {mean: mean_stderr, acc_all: acc_all_stderr}
    return stderr.get(metric, None)


def yesno(x):
    return "yes" if x else "no"


# --------------------------------------------------------------------------
# SQuAD-style answer metrics (used by ReCoRD, SQuAD, TriviaQA, DROP)
# --------------------------------------------------------------------------


def _normalize_answer(s: str) -> str:
    """Lowercase, strip punctuation/articles/extra whitespace (SQuAD rules)."""
    import re
    import string

    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def squad_exact(a_gold: str, a_pred: str) -> int:
    return int(_normalize_answer(a_gold) == _normalize_answer(a_pred))


def squad_f1(a_gold: str, a_pred: str) -> float:
    import collections

    gold_toks = _normalize_answer(a_gold).split()
    pred_toks = _normalize_answer(a_pred).split()
    common = collections.Counter(gold_toks) & collections.Counter(pred_toks)
    num_same = sum(common.values())
    if len(gold_toks) == 0 or len(pred_toks) == 0:
        return int(gold_toks == pred_toks)
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred_toks)
    recall = num_same / len(gold_toks)
    return 2 * precision * recall / (precision + recall)
