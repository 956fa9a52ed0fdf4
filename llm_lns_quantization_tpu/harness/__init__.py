"""Evaluation harness core: LM protocol, requests, caching, tasks, evaluator."""

from .api import LM, REQUEST_RETURN_LENGTHS, CacheHook, Request, RequestFactory, rf
from .cache import CachingLM, SqliteKV, hash_args
from .evaluator import evaluate, make_table, simple_evaluate
from .task import MultipleChoiceTask, PerplexityTask, Task

__all__ = [
    "LM",
    "REQUEST_RETURN_LENGTHS",
    "CacheHook",
    "Request",
    "RequestFactory",
    "rf",
    "CachingLM",
    "SqliteKV",
    "hash_args",
    "evaluate",
    "make_table",
    "simple_evaluate",
    "MultipleChoiceTask",
    "PerplexityTask",
    "Task",
]
