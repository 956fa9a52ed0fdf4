"""JSON perplexity task: score any local JSON text corpus.

Parity: reference lm_eval/tasks/json.py — invoked as
``--tasks json=split:text_key:/abs/path/to/data.json``; colons in keys may
be escaped with backslashes.
"""

import json
import re

from ..harness.task import PerplexityTask


def escaped_split(text, sep_char, maxsplit=-1):
    """Split on sep_char unless it is backslash-escaped (reference
    utils.escaped_split)."""
    assert len(sep_char) == 1
    if maxsplit == 0:
        return [text]
    maxsplit = max(0, maxsplit)
    return re.split(r"(?<!\\)" + sep_char, text, maxsplit)


class JsonPerplexity(PerplexityTask):
    VERSION = 0
    DATASET_NAME = "json"

    def __init__(self, data_dir=None, cache_dir=None, download_mode=None, **kw):
        self.load_error = None
        if data_dir is None:
            raise ValueError(
                "json task requires 'json=split:text_key:/path/to/data.json'"
            )
        split, key, path = (
            part.replace("\\:", ":") for part in escaped_split(data_dir, ":", 2)
        )
        with open(path, encoding="utf-8") as f:
            raw = json.load(f)
        if isinstance(raw, dict) and split in raw:
            raw = raw[split]
        self._docs = [d[key] if isinstance(d, dict) else d for d in raw]
        self._training_docs = None
        self._fewshot_docs = None

    def download(self, *a, **kw):
        pass

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return self._docs


def create_task_from_argstring(arg: str):
    """``json=split:text:/path`` -> instantiated JsonPerplexity."""
    assert arg.startswith("json=")
    return JsonPerplexity(data_dir=arg[len("json="):])
