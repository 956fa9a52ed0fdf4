"""Full-stack integration: train -> evaluate -> quantization ppl deltas.

The round-trip the framework exists for (BASELINE.md config #1 in miniature):
train a tiny GPT-2 on synthetic text with the sharded QAT step, then run
rolling perplexity through the full harness (task -> evaluator -> TPULM) in
bf16-equivalent fp32 and under weight quantization, and check the quantized
deltas behave (finite, ordered by format coarseness).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_lns_quantization_tpu.harness import evaluate
from llm_lns_quantization_tpu.harness.task import PerplexityTask
from llm_lns_quantization_tpu.lm.tpu_lm import TPULM
from llm_lns_quantization_tpu.models import ModelBundle, build_model
from llm_lns_quantization_tpu.quant import QuantConfig, quantize_weights

TEXT = (
    "the quick brown fox jumps over the lazy dog. "
    "pack my box with five dozen liquor jugs. "
    "how vexingly quick daft zebras jump. "
) * 4


class SyntheticPerplexity(PerplexityTask):
    VERSION = 0

    def __init__(self):
        self._training_docs = None
        self._fewshot_docs = None

    def download(self, *a, **kw):
        pass

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return [TEXT]


def _train(bundle, steps=120):
    from llm_lns_quantization_tpu.parallel import make_mesh, make_train_step, shard_params
    from llm_lns_quantization_tpu.parallel.mesh import data_sharding

    mesh = make_mesh(shape=(2, 4))
    params = shard_params(bundle.params, bundle, mesh)
    step, init_opt = make_train_step(bundle, mesh, learning_rate=3e-3)
    opt_state = init_opt(params)

    toks = np.frombuffer(TEXT.encode(), np.uint8).astype(np.int32)
    toks = toks[: (len(toks) // 65) * 65].reshape(-1, 65)
    toks = jax.device_put(jnp.asarray(toks[:4]), data_sharding(mesh))

    first = last = None
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, toks[:, :-1], toks[:, 1:])
        loss = float(jax.device_get(loss))
        first = loss if first is None else first
        last = loss
    return params, first, last


def _ppl(params, quant_spec):
    base = build_model(family="gpt2", preset="tiny", dtype=jnp.float32)
    qcfg = QuantConfig.parse(quant_spec) if quant_spec else QuantConfig()
    qparams = quantize_weights(params, qcfg) if qcfg.weights else params

    lm = TPULM(family="gpt2", preset="tiny", batch_size=4, dtype="float32",
               quant=quant_spec)
    lm.bundle = ModelBundle(
        family=base.family, cfg=base.cfg, params=qparams, forward=base.forward,
        init_cache=base.init_cache, max_length=base.max_length,
        quant_sites=base.quant_sites,
    )
    lm._params = qparams
    res = evaluate(
        lm=lm,
        task_dict={"synthetic_ppl": SyntheticPerplexity()},
        num_fewshot=0,
        bootstrap_iters=2,
    )
    return res["results"]["synthetic_ppl"]["byte_perplexity"]


def test_train_then_quantized_eval():
    bundle = build_model(family="gpt2", preset="tiny", dtype=jnp.float32, seed=1)
    trained, first_loss, last_loss = _train(bundle)
    assert last_loss < first_loss * 0.7, (first_loss, last_loss)

    # gather sharded params to host values for the eval engine
    trained = jax.tree_util.tree_map(lambda x: jnp.asarray(jax.device_get(x)), trained)

    ppl_base = _ppl(trained, None)
    ppl_lns8 = _ppl(trained, "w:lns8")
    ppl_lns4 = _ppl(trained, "w:lns4")

    assert np.isfinite([ppl_base, ppl_lns8, ppl_lns4]).all()
    # far below the ~256 byte-ppl of an untrained byte-level model
    assert ppl_base < 20.0, ppl_base
    # quantization degrades ppl monotonically with coarseness (allow noise)
    assert ppl_lns8 <= ppl_lns4 * 1.05, (ppl_lns8, ppl_lns4)
    assert ppl_base <= ppl_lns8 * 1.05, (ppl_base, ppl_lns8)


def test_in_memory_hf_model_routing():
    """The reference's HFLM capability (accept an in-memory PreTrainedModel,
    gpt2.py:21-253): each HF model class routes to the right TPU engine —
    causal -> TPULM, encoder-decoder -> TPUSeq2SeqLM, encoder-only -> TPUMLM
    — through a save_pretrained export round-trip."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from llm_lns_quantization_tpu.harness.evaluator import _lm_from_hf_model
    from llm_lns_quantization_tpu.lm.tpu_lm import TPULM
    from llm_lns_quantization_tpu.lm.tpu_mlm import TPUMLM
    from llm_lns_quantization_tpu.lm.tpu_seq2seq import TPUSeq2SeqLM

    torch.manual_seed(0)
    reqs = [("hello there", " world")]

    gpt2 = transformers.GPT2LMHeadModel(transformers.GPT2Config(
        vocab_size=256, n_positions=64, n_embd=32, n_layer=1, n_head=4,
    )).eval()
    lm = _lm_from_hf_model(gpt2)
    assert isinstance(lm, TPULM)
    (ll, _), = lm.loglikelihood(reqs)
    assert np.isfinite(ll)

    bert = transformers.BertForMaskedLM(transformers.BertConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64,
    )).eval()
    lm = _lm_from_hf_model(bert)
    assert isinstance(lm, TPUMLM)
    (ll, _), = lm.loglikelihood(reqs)
    assert np.isfinite(ll)

    t5 = transformers.T5ForConditionalGeneration(transformers.T5Config(
        vocab_size=256, d_model=32, d_ff=64, num_layers=1, num_heads=4,
        d_kv=8, decoder_start_token_id=0,
    )).eval()
    lm = _lm_from_hf_model(t5)
    assert isinstance(lm, TPUSeq2SeqLM)
    (ll, _), = lm.loglikelihood(reqs)
    assert np.isfinite(ll)
