"""HTTP API LM adapters: OpenAI completions, Anthropic, TextSynth.

Parity targets: reference lm_eval/models/gpt3.py (completion API with
retry/backoff + logprob extraction), models/anthropic_llms.py (generation
only) and models/textsynth.py. Network clients are injected/late-imported so
the adapters are unit-testable offline with a fake transport (the reference
tests mock the openai module the same way, tests/test_models.py).
"""

import os
import time
from typing import Callable, List, Optional

from .. import utils
from ..harness.api import LM


def retry_with_backoff(fn: Callable, retries: int = 5, base_delay: float = 0.5):
    """Exponential backoff on transient API errors (reference gpt3.py:38-54)."""
    delay = base_delay
    for attempt in range(retries):
        try:
            return fn()
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(delay)
            delay *= 2


class OpenAICompletionsLM(LM):
    """Completions-API adapter with echo+logprobs scoring (gpt3.py:57-236)."""

    REQ_CHUNK_SIZE = 20

    def __init__(self, engine: str = "davinci", truncate: bool = False,
                 max_gen_toks: int = 256, client=None, **kwargs):
        super().__init__()
        self.engine = engine
        self.truncate = truncate
        self._max_gen_toks = max_gen_toks
        self.max_length = 2048
        self._client = client  # injectable for tests

    def _completion(self, **kw):
        if self._client is None:
            import openai

            openai.api_key = os.environ.get("OPENAI_API_SECRET_KEY", "")
            self._client = openai.Completion
        return retry_with_backoff(lambda: self._client.create(**kw))

    def loglikelihood(self, requests):
        # echo=True + logprobs returns per-token logprobs for the prompt
        # itself; the continuation's tokens are the tail.
        res = []
        for chunk in utils.chunks(requests, self.REQ_CHUNK_SIZE):
            prompts = [ctx + cont for ctx, cont in chunk]
            resp = self._completion(
                engine=self.engine, prompt=prompts, echo=True, max_tokens=0,
                temperature=0.0, logprobs=10,
            )
            for (ctx, cont), choice in zip(chunk, resp["choices"]):
                lp = choice["logprobs"]
                offsets = lp["text_offset"]
                # tokens whose character offset is inside the continuation
                cut = len(ctx)
                idx = [i for i, off in enumerate(offsets) if off >= cut]
                ll = sum(lp["token_logprobs"][i] for i in idx if lp["token_logprobs"][i] is not None)
                top = lp.get("top_logprobs")
                is_greedy = all(
                    (top is None or top[i] is None)
                    or lp["tokens"][i] == max(top[i], key=top[i].get)
                    for i in idx
                )
                answer = (ll, is_greedy)
                self.cache_hook.add_partial("loglikelihood", (ctx, cont), answer)
                res.append(answer)
        return res

    def loglikelihood_rolling(self, requests):
        # the completions API scores whole prompts; one call per document
        res = []
        for (string,) in requests:
            ll, _ = self.loglikelihood([("", string)])[0]
            res.append(ll)
        return res

    def greedy_until(self, requests):
        res = []
        for ctx, req_args in requests:
            until = req_args["until"] if isinstance(req_args, dict) else req_args
            if isinstance(until, str):
                until = [until]
            resp = self._completion(
                engine=self.engine, prompt=[ctx],
                max_tokens=self._max_gen_toks, temperature=0.0,
                stop=until or None,
            )
            s = resp["choices"][0]["text"]
            for term in until or []:
                s = s.split(term)[0]
            self.cache_hook.add_partial("greedy_until", (ctx, until), s)
            res.append(s)
        return res


class AnthropicLM(LM):
    """Anthropic API adapter — generation only; loglikelihood is unsupported
    by the API (reference anthropic_llms.py:40-112 raises the same way)."""

    def __init__(self, model: str = "claude-2", max_gen_toks: int = 256,
                 client=None, **kwargs):
        super().__init__()
        self.model = model
        self._max_gen_toks = max_gen_toks
        self._client = client

    def _complete(self, prompt: str, stops: List[str]) -> str:
        if self._client is None:
            import anthropic

            self._client = anthropic.Anthropic()
        c = self._client

        def call():
            resp = c.completions.create(
                model=self.model,
                prompt=prompt,
                max_tokens_to_sample=self._max_gen_toks,
                stop_sequences=stops or None,
                temperature=0.0,
            )
            return resp.completion

        return retry_with_backoff(call)

    def loglikelihood(self, requests):
        raise NotImplementedError("No support for logits from the Anthropic API")

    def loglikelihood_rolling(self, requests):
        raise NotImplementedError("No support for logits from the Anthropic API")

    def greedy_until(self, requests):
        res = []
        for ctx, req_args in requests:
            until = req_args["until"] if isinstance(req_args, dict) else req_args
            if isinstance(until, str):
                until = [until]
            s = self._complete(ctx, until)
            for term in until or []:
                s = s.split(term)[0]
            self.cache_hook.add_partial("greedy_until", (ctx, until), s)
            res.append(s)
        return res


class TextSynthLM(LM):
    """TextSynth API adapter (paid API exposes logprobs directly;
    reference textsynth.py:41-156)."""

    def __init__(self, engine: str = "gptj_6B", truncate: bool = False,
                 transport=None, **kwargs):
        super().__init__()
        self.engine = engine
        self.truncate = truncate
        self.api_url = "https://api.textsynth.com"
        self._transport = transport  # fn(url, json) -> dict, injectable

    def _post(self, path: str, payload: dict) -> dict:
        if self._transport is None:
            import requests

            key = os.environ.get("TEXTSYNTH_API_SECRET_KEY", "")

            def transport(url, json):
                r = requests.post(
                    url, json=json, headers={"Authorization": f"Bearer {key}"}
                )
                r.raise_for_status()
                return r.json()

            self._transport = transport
        return retry_with_backoff(
            lambda: self._transport(self.api_url + path, payload)
        )

    def loglikelihood(self, requests):
        res = []
        for ctx, cont in requests:
            resp = self._post(
                f"/v1/engines/{self.engine}/logprob",
                {"context": ctx, "continuation": cont},
            )
            answer = (resp["logprob"], bool(resp["is_greedy"]))
            self.cache_hook.add_partial("loglikelihood", (ctx, cont), answer)
            res.append(answer)
        return res

    def loglikelihood_rolling(self, requests):
        # TextSynth has no tokenizer endpoint to build rolling windows from
        raise NotImplementedError(
            "loglikelihood_rolling not supported for TextSynth (no tokenization)"
        )

    def greedy_until(self, requests):
        res = []
        for ctx, req_args in requests:
            until = req_args["until"] if isinstance(req_args, dict) else req_args
            if isinstance(until, str):
                until = [until]
            resp = self._post(
                f"/v1/engines/{self.engine}/completions",
                {"prompt": ctx, "max_tokens": 256, "temperature": 0.0,
                 "stop": until or None},
            )
            s = resp["text"]
            for term in until or []:
                s = s.split(term)[0]
            self.cache_hook.add_partial("greedy_until", (ctx, until), s)
            res.append(s)
        return res
