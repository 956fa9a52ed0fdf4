"""Host-offload capacity tier (models/offload.py) vs the in-HBM forward.

The reference fits oversized models with accelerate cpu/disk offload
(huggingface.py:30-54); HostOffloadLlama is the TPU-native equivalent:
pinned-host weight residency + a layer-streamed decode. These tests pin the
numerics (identical logits/generations to the ordinary whole-model forward)
on the CPU backend, which also supports pinned_host shardings; the
13B-scale capacity measurement runs on the chip
(scripts/offload_13b.py, BASELINE.md).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llm_lns_quantization_tpu.models import build_model  # noqa: E402
from llm_lns_quantization_tpu.models import offload  # noqa: E402

pytestmark = pytest.mark.skipif(
    not offload.supports_host_offload(),
    reason="backend has no pinned_host memory space")


@pytest.fixture(scope="module")
def tiny():
    return build_model(family="llama", preset="tiny", dtype=jnp.float32,
                       seed=5)


def test_offloaded_params_live_in_host_memory(tiny):
    ol = offload.HostOffloadLlama(tiny.cfg, tiny.params)
    leaf = jax.tree_util.tree_leaves(ol.params)[0]
    assert leaf.sharding.memory_kind == "pinned_host"


def test_streamed_forward_matches_in_hbm(tiny):
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, tiny.cfg.vocab_size, (2, 9)),
                       jnp.int32)
    want = np.asarray(tiny.forward(tiny.params, tiny.cfg, toks))
    ol = offload.HostOffloadLlama(tiny.cfg, tiny.params)
    got = np.asarray(ol.forward(toks))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_streamed_forward_tied_and_fused_layouts():
    """Layout branches llama.forward handles must not drift out of the
    streamed body (code-review r5): tied embeddings (no lm_head leaf) and
    the fuse_projections serving layout (qkv_proj/gateup_proj)."""
    from llm_lns_quantization_tpu.models import llama

    rng = np.random.default_rng(2)
    tied = build_model(family="llama", preset="tiny", dtype=jnp.float32,
                      seed=6, config_overrides={"tie_word_embeddings": True})
    toks = jnp.asarray(rng.integers(1, tied.cfg.vocab_size, (2, 7)),
                       jnp.int32)
    want = np.asarray(tied.forward(tied.params, tied.cfg, toks))
    got = np.asarray(offload.HostOffloadLlama(tied.cfg, tied.params)
                     .forward(toks))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    plain = build_model(family="llama", preset="tiny", dtype=jnp.float32,
                        seed=6)
    fused = llama.fuse_projections(plain.params)
    want2 = np.asarray(plain.forward(fused, plain.cfg, toks))
    got2 = np.asarray(offload.HostOffloadLlama(plain.cfg, fused)
                      .forward(toks))
    np.testing.assert_allclose(got2, want2, rtol=2e-5, atol=2e-5)


def test_streamed_greedy_decode_matches_in_hbm(tiny):
    from bench import _decode_fn
    from llm_lns_quantization_tpu.quant import ActQuantizer, QuantConfig

    rng = np.random.default_rng(1)
    B, P, S = 2, 6, 5
    prompt = jnp.asarray(rng.integers(1, tiny.cfg.vocab_size, (B, P)),
                         jnp.int32)
    ref = np.asarray(_decode_fn(
        tiny, ActQuantizer(QuantConfig()), B, P, S)(tiny.params, prompt))
    ol = offload.HostOffloadLlama(tiny.cfg, tiny.params)
    got = np.asarray(ol.greedy_decode(prompt, S))
    np.testing.assert_array_equal(got, ref.T)  # _decode_fn stacks [S, B]
