"""Continuous-batching serving engine (lm/serve.py).

The invariant: with greedy decoding, continuous batching is *semantically
invisible* — every request's continuation must equal the one produced by a
naive full-context argmax loop on the same model, no matter how requests are
packed into slots, admitted mid-flight, or evicted.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_lns_quantization_tpu.lm.serve import ContinuousBatcher
from llm_lns_quantization_tpu.models import build_model
from llm_lns_quantization_tpu.quant import QuantConfig


def _naive_greedy(bundle, prompt, n, stop_ids=()):
    """Reference continuation: full re-forward per token, no KV cache."""
    ids = list(prompt)
    out = []
    for _ in range(n):
        logits = bundle.forward(
            bundle.params, bundle.cfg, jnp.asarray([ids], jnp.int32)
        )
        tok = int(jnp.argmax(logits[0, -1, :]))
        out.append(tok)
        if tok in stop_ids:
            break
        ids.append(tok)
    return out


@pytest.mark.parametrize("family", ["gpt2", "llama"])
def test_continuous_batching_matches_naive_greedy(family):
    bundle = build_model(family=family, preset="tiny", seed=0,
                         dtype=jnp.float32)
    rng = np.random.default_rng(0)
    # more prompts than slots, varied lengths -> staggered admission
    prompts = [list(rng.integers(1, 200, n)) for n in (5, 11, 3, 17, 8, 2)]
    cb = ContinuousBatcher(bundle, slots=3, max_len=64)
    outs = cb.generate(prompts, max_new_tokens=6)
    for p, got in zip(prompts, outs):
        want = _naive_greedy(bundle, p, 6)
        assert got == want, (p, got, want)


def test_continuous_batching_stop_ids_and_quant_cache():
    bundle = build_model(family="gpt2", preset="tiny", seed=1,
                         dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, 200, n)) for n in (4, 9, 6, 12)]

    plain = ContinuousBatcher(bundle, slots=2, max_len=64)
    ref = plain.generate(prompts, max_new_tokens=8)

    # a stop id truncates the continuation at (and including) the stop token
    sid = ref[0][2] if len(ref[0]) > 2 else ref[0][-1]
    stopped = plain.generate(prompts, max_new_tokens=8, stop_ids=(sid,))
    for r, s in zip(ref, stopped):
        if sid in r:
            k = r.index(sid)
            assert s == r[: k + 1]
        else:
            assert s == r

    # INT8 KV cache: same engine mechanics, mild quantization noise allowed —
    # continuations may diverge after some steps, but the first token (pure
    # prefill argmax through the quantized cache read) must be finite/valid
    q = ContinuousBatcher(
        bundle, slots=2, max_len=64, quant=QuantConfig(kv_cache="int8")
    )
    qout = q.generate(prompts, max_new_tokens=4)
    assert all(len(o) == 4 for o in qout)


def test_chunked_dispatch_invariance():
    """steps_per_dispatch is a pure dispatch-granularity knob: any chunk
    size must produce bit-identical outputs (rows stop on-device mid-chunk
    under exactly the host loop's conditions)."""
    bundle = build_model(family="gpt2", preset="tiny", seed=2,
                         dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(1, 200, n)) for n in (7, 3, 13, 5, 9)]

    ref = ContinuousBatcher(
        bundle, slots=2, max_len=64, steps_per_dispatch=1
    ).generate(prompts, max_new_tokens=7)
    sid = ref[1][1]  # some token that actually occurs -> mid-chunk stop
    ref = ContinuousBatcher(
        bundle, slots=2, max_len=64, steps_per_dispatch=1
    ).generate(prompts, max_new_tokens=7, stop_ids=(sid,))

    for k in (3, 8, 32):
        got = ContinuousBatcher(
            bundle, slots=2, max_len=64, steps_per_dispatch=k
        ).generate(prompts, max_new_tokens=7, stop_ids=(sid,))
        assert got == ref, (k, got, ref)


def test_continuous_batching_rejects_seq2seq():
    bundle = build_model(family="t5", preset="tiny", dtype=jnp.float32)
    with pytest.raises(AssertionError):
        ContinuousBatcher(bundle)


def test_tpulm_serve_mode_matches_lockstep_greedy_until():
    """``serve=N`` routes greedy_until through the ContinuousBatcher; the
    generated strings must equal the lock-step decode path's for the same
    requests (greedy decoding is deterministic), including multi-token stop
    trimming and request-order restoration across slot reuse."""
    from llm_lns_quantization_tpu.lm.tpu_lm import TPULM

    reqs = [
        ("The quick brown", {"until": ["\n"], "max_length": 12}),
        ("Pack my box with", {"until": ["\n"], "max_length": 12}),
        ("a", {"until": ["\n"], "max_length": 12}),
        ("Sphinx of black quartz judge my vow and then some more text",
         {"until": ["\n"], "max_length": 12}),
        ("The quick brown", {"until": ["\n"], "max_length": 12}),  # dup
    ]
    lock = TPULM(family="gpt2", preset="tiny", batch_size=2, dtype="float32")
    serve = TPULM(family="gpt2", preset="tiny", batch_size=2,
                  dtype="float32", serve=2)
    a = lock.greedy_until(list(reqs))
    b = serve.greedy_until(list(reqs))
    assert a == b, (a, b)
    assert b[0] == b[4]  # identical requests -> identical outputs

    # quantized serving tier end-to-end through the batcher
    q = TPULM(family="gpt2", preset="tiny", batch_size=2, dtype="float32",
              quant="w:w8a8;pallas", serve=2)
    out = q.greedy_until(list(reqs[:2]))
    assert all(isinstance(s, str) for s in out)


def test_batcher_phase_stats():
    """generate() fills last_stats with the phase attribution the round-5
    batcher study relies on (BASELINE.md): phases are non-negative and sum
    to <= wall, occupancy is emitted/slot_steps in (0, 1], and the token
    accounting matches the returned outputs exactly."""
    import numpy as np

    from llm_lns_quantization_tpu.lm.serve import ContinuousBatcher
    from llm_lns_quantization_tpu.models import build_model

    bundle = build_model(family="gpt2", preset="tiny", seed=7,
                         dtype=jnp.float32)
    cb = ContinuousBatcher(bundle, slots=2, max_len=64, steps_per_dispatch=4)
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(1, 200, n)) for n in (5, 9, 3)]
    outs = cb.generate(prompts, max_new_tokens=6)

    st = cb.last_stats
    phases = [st[k] for k in ("t_admit_build", "t_prefill", "t_chunk",
                              "t_account")]
    assert all(p >= 0 for p in phases)
    assert sum(phases) <= st["wall_s"] + 1e-6
    assert st["emitted_tokens"] == sum(len(o) for o in outs) == 18
    assert st["admitted"] == 3
    assert st["slot_steps"] == st["executed_steps"] * cb.slots
    assert 0 < st["occupancy"] <= 1
    assert st["n_prefill_dispatches"] >= 1 and st["n_chunks"] >= 1
