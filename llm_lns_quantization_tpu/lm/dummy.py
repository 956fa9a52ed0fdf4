"""Fake LM backend — the test double for the whole harness.

Same contract as the reference's lm_eval/models/dummy.py:5-36: random
negative loglikelihoods, constant generations, no model anywhere. Used by the
evaluator/caching tests and by cost estimation.
"""

import random

from ..harness.api import LM


class DummyLM(LM):
    def __init__(self, **kwargs):
        super().__init__()

    @classmethod
    def create_from_arg_string(cls, arg_string, additional_config=None):
        return cls()

    def loglikelihood(self, requests):
        res = []
        for _ in requests:
            res.append((-random.random(), False))
        return res

    def greedy_until(self, requests):
        res = []
        for ctx, _ in requests:
            res.append("lol")
            assert ctx.strip() != ""
        return res

    def loglikelihood_rolling(self, requests):
        res = []
        for _ in requests:
            res.append(-random.random())
        return res
