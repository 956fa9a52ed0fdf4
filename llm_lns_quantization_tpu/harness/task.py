"""Task abstraction: dataset access, few-shot context assembly, scoring.

Contracts match the reference's lm_eval/base.py:475-863 (Task /
MultipleChoiceTask / PerplexityTask): tasks expose train/validation/test doc
iterables, format docs to prompt text and targets, construct typed requests,
score per-doc results, and declare aggregations.

Offline-first extension: the reference hard-depends on hub downloads via HF
``datasets`` (base.py:536-550). Here ``download`` tries, in order, (1) docs
passed directly to the constructor (``custom_docs``, used by tests and by the
local-fixture flow), (2) local JSON/JSONL splits under ``data_dir``, and
(3) HF ``datasets`` — so the harness is fully exercisable on an air-gapped
machine, which the reference is not.
"""

import abc
import json
import os
import re
from typing import Iterable, Optional

import numpy as np

from .api import rf
from .metrics import bits_per_byte, mean, weighted_perplexity


class Task(abc.ABC):
    # HF datasets path/name, or a path to local data (reference base.py:485-490)
    DATASET_PATH: Optional[str] = None
    DATASET_NAME: Optional[str] = None
    VERSION = 0

    def __init__(self, data_dir=None, cache_dir=None, download_mode=None, custom_docs=None):
        self._custom_docs = custom_docs
        self.download(data_dir, cache_dir, download_mode)
        self._training_docs = None
        self._fewshot_docs = None

    def download(self, data_dir=None, cache_dir=None, download_mode=None):
        if self._custom_docs is not None:
            self.dataset = {
                split: list(docs) for split, docs in self._custom_docs.items()
            }
            return
        if data_dir is not None and os.path.isdir(data_dir):
            local = self._load_local_splits(data_dir)
            if local:
                self.dataset = local
                return
        import datasets

        from ..datasets import hub_builder

        # 12 dataset families the reference loaded via hand-written builder
        # scripts (lm_eval/datasets/): resolve to this package's builders so
        # a networked deployment downloads from the original sources instead
        # of depending on a hub mirror (--data_dir fixtures remain the
        # offline default above)
        local_cls = hub_builder(self.DATASET_PATH)
        if local_cls is not None:
            builder = local_cls(
                config_name=self.DATASET_NAME,
                cache_dir=cache_dir,
                data_dir=data_dir,
            )
            builder.download_and_prepare(download_mode=download_mode)
            self.dataset = builder.as_dataset()
            return
        self.dataset = datasets.load_dataset(
            path=self.DATASET_PATH,
            name=self.DATASET_NAME,
            data_dir=data_dir,
            cache_dir=cache_dir,
            download_mode=download_mode,
        )

    def _load_local_splits(self, data_dir):
        """Load every ``{split}.json`` / ``{split}.jsonl`` in the directory.

        The split name is the file stem — tasks use names beyond the usual
        train/validation/test (MMLU/C-Eval/CMMLU ``dev`` exemplars, C-Eval
        ``val``, ANLI ``train_r1``..``test_r3``), and dropping those silently
        broke few-shot sampling offline.
        """
        out = {}
        for fname in sorted(os.listdir(data_dir)):
            stem, dot, ext = fname.rpartition(".")
            if not dot:
                continue
            path = os.path.join(data_dir, fname)
            if ext == "json" and stem not in out:
                out[stem] = self._load_json(path)
            elif ext == "jsonl" and stem not in out:
                out[stem] = self._load_jsonl(path)
        return out

    @staticmethod
    def _load_json(path):
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    @staticmethod
    def _load_jsonl(path):
        with open(path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]

    def should_decontaminate(self):
        return False

    @abc.abstractmethod
    def has_training_docs(self):
        ...

    @abc.abstractmethod
    def has_validation_docs(self):
        ...

    @abc.abstractmethod
    def has_test_docs(self):
        ...

    def training_docs(self) -> Iterable:
        return []

    def validation_docs(self) -> Iterable:
        return []

    def test_docs(self) -> Iterable:
        return []

    def _process_doc(self, doc):
        return doc

    def fewshot_examples(self, k, rnd):
        if self._training_docs is None:
            self._training_docs = list(self.training_docs())
        return rnd.sample(self._training_docs, k)

    def doc_to_decontamination_query(self, doc):
        raise NotImplementedError(
            "override doc_to_decontamination_query with a doc-specific query"
        )

    @abc.abstractmethod
    def doc_to_text(self, doc):
        ...

    @abc.abstractmethod
    def doc_to_target(self, doc):
        ...

    @abc.abstractmethod
    def construct_requests(self, doc, ctx):
        """Build the typed request(s) for one doc given its few-shot context."""

    @abc.abstractmethod
    def process_results(self, doc, results):
        """Score one doc: {metric_name: value} from the LM's responses."""

    @abc.abstractmethod
    def aggregation(self):
        """{metric_name: fn([values]) -> float}"""

    @abc.abstractmethod
    def higher_is_better(self):
        """{metric_name: bool}"""

    def fewshot_context(self, doc, num_fewshot, rnd=None, description=None):
        """description + sampled few-shot exemplars + the doc's own prompt.

        Sampling semantics match reference base.py:679-745: exemplars come
        from the training split, or (if absent) from validation/test with the
        current doc filtered out.
        """
        assert rnd is not None, "a random.Random generator must be provided to rnd"
        description = description + "\n\n" if description else ""

        if num_fewshot == 0:
            labeled_examples = ""
        else:
            if self.has_training_docs():
                fewshotex = self.fewshot_examples(k=num_fewshot, rnd=rnd)
            else:
                if self._fewshot_docs is None:
                    self._fewshot_docs = list(
                        self.validation_docs()
                        if self.has_validation_docs()
                        else self.test_docs()
                    )
                fewshotex = rnd.sample(self._fewshot_docs, num_fewshot + 1)
                fewshotex = [x for x in fewshotex if x != doc][:num_fewshot]

            labeled_examples = (
                "\n\n".join(
                    self.doc_to_text(d) + self.doc_to_target(d) for d in fewshotex
                )
                + "\n\n"
            )

        return description + labeled_examples + self.doc_to_text(doc)


class MultipleChoiceTask(Task):
    """Choice scoring via per-choice loglikelihood; acc + length-normalized
    acc_norm (reference base.py:748-781)."""

    def doc_to_target(self, doc):
        return " " + doc["choices"][doc["gold"]]

    def construct_requests(self, doc, ctx):
        return [
            rf.loglikelihood(ctx, " {}".format(choice))[0] for choice in doc["choices"]
        ]

    def process_results(self, doc, results):
        gold = doc["gold"]
        acc = 1.0 if np.argmax(results) == gold else 0.0
        completion_len = np.array([float(len(i)) for i in doc["choices"]])
        acc_norm = 1.0 if np.argmax(results / completion_len) == gold else 0.0
        return {"acc": acc, "acc_norm": acc_norm}

    def higher_is_better(self):
        return {"acc": True, "acc_norm": True}

    def aggregation(self):
        return {"acc": mean, "acc_norm": mean}


class PerplexityTask(Task, abc.ABC):
    """Rolling-window document perplexity (reference base.py:784-863)."""

    def should_decontaminate(self):
        return True

    def has_training_docs(self):
        return False

    def fewshot_examples(self, k, rnd):
        assert k == 0
        return []

    def fewshot_context(self, doc, num_fewshot, rnd=None, description=None):
        assert num_fewshot == 0, "perplexity tasks take no few-shot examples"
        assert rnd is not None
        return ""

    def higher_is_better(self):
        return {
            "word_perplexity": False,
            "byte_perplexity": False,
            "bits_per_byte": False,
        }

    def doc_to_decontamination_query(self, doc):
        return doc

    def doc_to_text(self, doc):
        return ""

    def doc_to_target(self, doc):
        return doc

    def construct_requests(self, doc, ctx):
        assert not ctx
        return rf.loglikelihood_rolling(self.doc_to_target(doc))

    def process_results(self, doc, results):
        (loglikelihood,) = results
        words = self.count_words(doc)
        bytes_ = self.count_bytes(doc)
        return {
            "word_perplexity": (loglikelihood, words),
            "byte_perplexity": (loglikelihood, bytes_),
            "bits_per_byte": (loglikelihood, bytes_),
        }

    def aggregation(self):
        return {
            "word_perplexity": weighted_perplexity,
            "byte_perplexity": weighted_perplexity,
            "bits_per_byte": bits_per_byte,
        }

    @classmethod
    def count_bytes(cls, doc):
        return len(doc.encode("utf-8"))

    @classmethod
    def count_words(cls, doc):
        return len(re.split(r"\s+", doc))
