"""HTTP API adapter tests with injected fake clients (no network).

The reference tests its OpenAI adapter with pickled mock responses
(tests/test_models.py); these use injected transports instead.
"""

import pytest

from llm_lns_quantization_tpu.lm.api_models import (
    AnthropicLM,
    OpenAICompletionsLM,
    TextSynthLM,
    retry_with_backoff,
)


class FakeOpenAICompletion:
    """Mimics openai.Completion.create for echo+logprobs scoring."""

    @staticmethod
    def create(**kw):
        prompts = kw["prompt"]
        if kw.get("max_tokens") == 0:  # loglikelihood call
            choices = []
            for p in prompts:
                # two tokens: first half context, second half continuation
                cut = len(p) // 2
                choices.append(
                    {
                        "logprobs": {
                            "text_offset": [0, cut],
                            "tokens": [p[:cut], p[cut:]],
                            "token_logprobs": [None, -1.5],
                            "top_logprobs": [None, {p[cut:]: -1.5, "x": -9.9}],
                        }
                    }
                )
            return {"choices": choices}
        return {"choices": [{"text": " generated text\nmore"} for _ in prompts]}


def test_openai_loglikelihood():
    lm = OpenAICompletionsLM(engine="test", client=FakeOpenAICompletion)
    res = lm.loglikelihood([("abcd", "efgh")])
    assert len(res) == 1
    ll, greedy = res[0]
    assert ll == pytest.approx(-1.5)
    assert greedy is True


def test_openai_greedy_until():
    lm = OpenAICompletionsLM(engine="test", client=FakeOpenAICompletion)
    res = lm.greedy_until([("ctx", {"until": ["\n"]})])
    assert res == [" generated text"]


def test_anthropic_generation_only():
    class FakeAnthropic:
        class completions:
            @staticmethod
            def create(**kw):
                class R:
                    completion = " the answer\njunk"

                return R()

    lm = AnthropicLM(client=FakeAnthropic)
    assert lm.greedy_until([("q", {"until": ["\n"]})]) == [" the answer"]
    with pytest.raises(NotImplementedError):
        lm.loglikelihood([("a", "b")])
    with pytest.raises(NotImplementedError):
        lm.loglikelihood_rolling([("a",)])


def test_textsynth_adapter():
    def transport(url, payload):
        if url.endswith("/logprob"):
            return {"logprob": -2.5, "is_greedy": True}
        return {"text": "answer. more"}

    lm = TextSynthLM(engine="test", transport=transport)
    assert lm.loglikelihood([("ctx", "cont")]) == [(-2.5, True)]
    assert lm.greedy_until([("q", {"until": ["."]})]) == ["answer"]
    with pytest.raises(NotImplementedError):
        lm.loglikelihood_rolling([("doc",)])


def test_retry_with_backoff():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert retry_with_backoff(flaky, retries=5, base_delay=0.001) == "ok"
    assert calls["n"] == 3
