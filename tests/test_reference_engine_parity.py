"""Engine-level parity vs the reference's LM adapters on one shared checkpoint.

test_hf_parity.py proves our model forwards match transformers logits; this
module closes the loop on the ENGINE around them: the full tokenize → pack →
truncate → score/generate pipeline must produce the same numbers the
reference adapters produce for identical requests on an identical tiny
GPT-2 checkpoint (CPU torch vs CPU JAX, float32):

  - loglikelihood: reference gpt2.HFLM (BaseLM._loglikelihood_tokens,
    base.py:271-409) — covers context/continuation splitting (_encode_pair,
    base.py:201-210), empty-context EOT prefixing, and left truncation to
    max_length+1.
  - loglikelihood_rolling: the full rolling-window pipeline
    (base.py:227-269 + utils.py:135-179).
  - greedy_until: reference huggingface.AutoCausalLM (the experimental
    adapter whose multi-token stop semantics we ported,
    huggingface.py:1993-2057, 2294-2340) — outputs must be string-identical.

Reference code is imported read-only as an oracle (public untrusted
content). Skipped when /root/reference is absent.
"""

import os
import sys

import pytest

from test_reference_parity import REFERENCE_ROOT, load_reference_registry

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "lm_eval")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Tiny GPT-2 + trained BPE tokenizer saved as a local HF checkpoint."""
    import torch
    import transformers
    from tokenizers.implementations import ByteLevelBPETokenizer

    path = str(tmp_path_factory.mktemp("xengine_ckpt"))
    corpus = [
        "The quick brown fox jumps over the lazy dog. " * 20,
        "Pack my box with five dozen liquor jugs! 0123456789. " * 20,
        "How vexingly quick daft zebras jump; amazingly few discotheques. " * 20,
    ]
    bpe = ByteLevelBPETokenizer()
    bpe.train_from_iterator(corpus, vocab_size=384, min_frequency=1,
                            special_tokens=["<|endoftext|>"])
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=bpe._tokenizer,
        eos_token="<|endoftext|>", bos_token="<|endoftext|>",
        unk_token="<|endoftext|>")
    tok.save_pretrained(path)

    cfg = transformers.GPT2Config(
        vocab_size=384, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        eos_token_id=0, bos_token_id=0)
    torch.manual_seed(0)
    transformers.GPT2LMHeadModel(cfg).eval().save_pretrained(
        path, safe_serialization=True)
    return path


@pytest.fixture(scope="module")
def ref_hflm(checkpoint):
    load_reference_registry()  # installs dep stubs + sys.path entry
    from lm_eval.models.gpt2 import HFLM

    return HFLM(device="cpu", pretrained=checkpoint, batch_size=2,
                dtype="float32")


@pytest.fixture(scope="module")
def our_lm(checkpoint):
    from llm_lns_quantization_tpu.lm.tpu_lm import TPULM

    return TPULM(family="gpt2", pretrained=checkpoint, tokenizer=checkpoint,
                 batch_size=2, dtype="float32", max_gen_toks=16)


def test_loglikelihood_parity(ref_hflm, our_lm):
    reqs = [
        ("The quick brown fox", " jumps over the lazy dog."),
        ("Pack my box", " with five dozen liquor jugs!"),
        ("How vexingly quick", " daft zebras jump"),
        ("A", " b"),
        ("", "The quick brown fox jumps."),  # empty-context EOT prefix edge
        ("The quick brown fox jumps over the lazy dog. " * 12,
         " amazingly few discotheques."),  # left truncation at max_length 64
    ]
    assert ref_hflm.max_length == our_lm.max_length == 64
    ref = ref_hflm.loglikelihood(list(reqs))
    ours = our_lm.loglikelihood(list(reqs))
    for (ctx, cont), (rll, rg), (oll, og) in zip(reqs, ref, ours):
        assert abs(rll - oll) < 2e-3, (ctx, cont, rll, oll)
        assert bool(rg) == bool(og), (ctx, cont)


def test_loglikelihood_rolling_parity(ref_hflm, our_lm):
    docs = ["The quick brown fox jumps over the lazy dog. " * 10,
            "Pack my box with five dozen liquor jugs! " * 6]
    ref = ref_hflm.loglikelihood_rolling([(s,) for s in docs])
    ours = our_lm.loglikelihood_rolling([(s,) for s in docs])
    for a, b in zip(ref, ours):
        assert abs(a - b) < 5e-3, (a, b)


def test_greedy_until_parity(checkpoint, our_lm):
    load_reference_registry()
    from lm_eval.models.huggingface import AutoCausalLM

    exp_lm = AutoCausalLM(pretrained=checkpoint, device="cpu", batch_size=2,
                          dtype="float32", max_gen_toks=16)
    reqs = [
        ("The quick brown", {"until": ["."]}),
        ("Pack my box with", {"until": ["zzqq"]}),       # no stop hit: budget
        ("How vexingly", {"until": ["jugs", "."]}),       # multi-stop
        ("0123", {"until": ["\n"]}),
    ]
    ref = exp_lm.greedy_until(list(reqs))
    ours = our_lm.greedy_until(list(reqs))
    assert ref == ours
