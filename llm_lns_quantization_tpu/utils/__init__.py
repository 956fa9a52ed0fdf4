"""Harness utilities.

Same contracts as the reference's ``lm_eval/utils.py`` (rolling token windows,
request reordering, chunking, arg-string parsing, task wildcard matching) with
torch/omegaconf dependencies removed; everything here is pure Python.
"""

import ast
import collections
import fnmatch
import re
from typing import Iterable, Iterator, List, Sequence, Tuple


def simple_parse_args_string(args_string: str) -> dict:
    """Parse ``"arg1=val1,arg2=val2"`` into a dict with literal-typed values.

    Mirrors the reference's OmegaConf-dotlist parsing (utils.py:49-60): values
    that look like Python/JSON literals (ints, floats, bools, None) are
    converted; everything else stays a string.
    """
    args_string = args_string.strip()
    if not args_string:
        return {}
    out = {}
    for item in args_string.split(","):
        if not item:
            continue
        if "=" not in item:
            raise ValueError(f"malformed arg (expected k=v): {item!r}")
        key, val = item.split("=", 1)
        out[key.strip()] = _coerce(val.strip())
    return out


def _coerce(val: str):
    low = val.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("none", "null"):
        return None
    try:
        return ast.literal_eval(val)
    except (ValueError, SyntaxError):
        return val


def bucket_len(n: int, minimum: int = 32) -> int:
    """Next power-of-2 length bucket (XLA: each distinct shape compiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def join_iters(iters):
    for it in iters:
        yield from it


def chunks(iterable: Iterable, n: int = 0, fn=None) -> Iterator[list]:
    """Yield successive batches; batch size is ``n``, or ``fn(index)`` if given.

    Contract matches reference utils.py:68-77 (the schedulable batch fn is what
    auto-batch-size uses to re-plan batch sizes part-way through a request
    stream).
    """
    arr = []
    for i, x in enumerate(iterable):
        arr.append(x)
        if len(arr) == (fn(i) if fn else n):
            yield arr
            arr = []
    if arr:
        yield arr


def group(arr, fn):
    res = collections.defaultdict(list)
    for ob in arr:
        res[fn(ob)].append(ob)
    return list(res.values())


def _is_json_task(task_name: str) -> bool:
    """Reference utils.py:88-90 — ``json=split:key:/path`` names bypass the
    registry (they carry their dataset path inline)."""
    return task_name == "json" or task_name.startswith("json=")


class MultiChoice:
    """argparse ``choices`` helper supporting comma-separated fnmatch patterns."""

    def __init__(self, choices):
        self.choices = choices

    def __contains__(self, values) -> bool:
        for value in values.split(","):
            if len(fnmatch.filter(self.choices, value)) == 0 and not _is_json_task(value):
                return False
        return True

    def __iter__(self):
        yield from self.choices


def pattern_match(patterns: Sequence[str], source_list: Sequence[str]) -> List[str]:
    """Expand fnmatch wildcards against the task registry (utils.py:114-122);
    json tasks pass through verbatim (reference :116-118)."""
    task_names = set()
    for pattern in patterns:
        if _is_json_task(pattern):
            task_names.add(pattern)
        for matching in fnmatch.filter(source_list, pattern):
            task_names.add(matching)
    return sorted(task_names)


def general_detokenize(string: str) -> str:
    string = string.replace(" n't", "n't")
    string = string.replace(" )", ")")
    string = string.replace("( ", "(")
    string = string.replace('" ', '"')
    string = string.replace(' "', '"')
    string = re.sub(r" (['.,])", r"\1", string)
    return string


def get_rolling_token_windows(
    token_list: List[int], prefix_token: int, max_seq_len: int, context_len: int
) -> Iterator[Tuple[List[int], List[int]]]:
    """Overlapping (input, pred) windows over a long token stream.

    Every token is predicted exactly once; the final window receives the full
    ``max_seq_len`` context but scores only its tail. Semantics (including the
    doctest cases in the reference's base.py:51-77) match reference
    utils.py:135-173 exactly — perplexity correctness depends on it.

    :param token_list: tokens to be predicted
    :param prefix_token: dummy token (e.g. EOT) the first token conditions on
    :param max_seq_len: model context length
    :param context_len: minimum conditioning context for each window (>=1)
    """
    assert 1 <= context_len <= max_seq_len
    if not token_list:
        return
    # +1 offset between inputs and predictions
    pred_len = max_seq_len - context_len + 1
    predicted = 0

    # first window predicts all of its tokens
    first_seq_len = min(max_seq_len, len(token_list))
    yield ([prefix_token] + token_list[: first_seq_len - 1], token_list[:first_seq_len])
    predicted += first_seq_len

    while predicted < len(token_list):
        window_pred_len = min(len(token_list) - predicted, pred_len)
        window_end = predicted + window_pred_len
        yield (
            token_list[window_end - max_seq_len - 1 : window_end - 1],
            token_list[window_end - window_pred_len : window_end],
        )
        predicted += window_pred_len


def make_disjoint_window(pair):
    """Trim the context so it doesn't overlap the continuation (utils.py:176-179)."""
    a, b = pair
    return a[: len(a) - (len(b) - 1)], b


class Reorderer:
    """Sort requests (descending length via ``fn``), run, then restore order.

    Grouping identical keys lets duplicate requests share one computation;
    contract matches reference utils.py:202-226. Descending-length order keeps
    the first element of each batch the padding length and surfaces OOM-sized
    batches immediately.
    """

    def __init__(self, arr, fn):
        self.size = len(arr)
        arr = list(enumerate(arr))
        arr = group(arr, lambda x: fn(x[1]))
        arr = [([y[0] for y in x], x[0][1]) for x in arr]
        arr.sort(key=lambda x: fn(x[1]))
        self.arr = arr

    def get_reordered(self):
        return [x[1] for x in self.arr]

    def get_original(self, newarr):
        res = [None] * self.size
        cov = [False] * self.size
        for (inds, _), v in zip(self.arr, newarr):
            for ind in inds:
                res[ind] = v
                cov[ind] = True
        assert all(cov)
        return res
