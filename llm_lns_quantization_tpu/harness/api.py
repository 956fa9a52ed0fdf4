"""The LM abstraction and the typed request DSL.

Contracts match the reference's lm_eval/base.py:21-118 (LM three-method API)
and :950-998 (Request / RequestFactory / REQUEST_RETURN_LENGTHS): tasks build
typed requests through the ``rf`` factory; the evaluator batches them per
request type and dispatches to an LM implementation.
"""

import abc
from typing import List, Tuple

from .. import utils


class LM(abc.ABC):
    """Three-method language-model contract (reference base.py:21-108)."""

    def __init__(self):
        self.cache_hook = CacheHook(None)

    @abc.abstractmethod
    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        """For each (context, continuation) string pair return
        (log P(continuation | context), is_greedy). Empty contexts are
        conditioned on the end-of-text token. A word-boundary space belongs to
        the continuation ("hello" + " world")."""

    @abc.abstractmethod
    def loglikelihood_rolling(self, requests) -> List[float]:
        """For each (string,) request return the full-document loglikelihood
        using maximal-context rolling windows (each token predicted exactly
        once; see utils.get_rolling_token_windows)."""

    @abc.abstractmethod
    def greedy_until(self, requests) -> List[str]:
        """For each (context, {"until": [stop, ...], ...}) request generate
        greedily until a stop sequence (stop sequences may span tokens) and
        return the continuation text."""

    @classmethod
    def create_from_arg_string(cls, arg_string, additional_config=None):
        additional_config = additional_config or {}
        args = utils.simple_parse_args_string(arg_string)
        args2 = {k: v for k, v in additional_config.items() if v is not None}
        return cls(**args, **args2)

    def set_cache_hook(self, cache_hook):
        self.cache_hook = cache_hook


# how many scalar results a request of each type destructures into
# (reference base.py:950-954)
REQUEST_RETURN_LENGTHS = {
    "loglikelihood": 2,
    "greedy_until": None,
    "loglikelihood_rolling": None,
}


class Request:
    def __init__(self, request_type, args, index=None):
        if request_type not in REQUEST_RETURN_LENGTHS:
            raise NotImplementedError(f"request type {request_type!r} not implemented")
        self.request_type = request_type
        self.args = args
        self.index = index

    def __iter__(self):
        if REQUEST_RETURN_LENGTHS[self.request_type] is None:
            raise IndexError("this request type does not return multiple arguments")
        for i in range(REQUEST_RETURN_LENGTHS[self.request_type]):
            yield Request(self.request_type, self.args, i)

    def __getitem__(self, i):
        if REQUEST_RETURN_LENGTHS[self.request_type] is None:
            raise IndexError("this request type does not return multiple arguments")
        return Request(self.request_type, self.args, i)

    def __eq__(self, other):
        return (
            self.request_type == other.request_type
            and self.args == other.args
            and self.index == other.index
        )

    def __repr__(self):
        return f"Req_{self.request_type}{self.args}[{self.index}]\n"


class RequestFactory:
    def __getattr__(self, attr):
        def fn(*args):
            return Request(attr, args)

        return fn


rf = RequestFactory()


class CacheHook:
    """Lets an LM write partial results into the cache mid-run so an
    interrupted eval resumes where it stopped (reference base.py:871-883)."""

    def __init__(self, cachinglm):
        self.dbdict = None if cachinglm is None else cachinglm.dbdict

    def add_partial(self, attr, req, res):
        if self.dbdict is None:
            return
        from .cache import hash_args

        self.dbdict[hash_args(attr, req)] = res
