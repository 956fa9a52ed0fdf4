"""Architecture parity vs HuggingFace transformers (offline, tiny random models).

The decisive correctness test for the model zoo: instantiate a tiny random
HF model (no network needed), save_pretrained it, load the checkpoint through
models/hf_loader.py, and compare logits within float32 tolerance. This is
what guarantees WikiText perplexities computed by this framework are
comparable to the reference's HF-based numbers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_lns_quantization_tpu.models import build_model  # noqa: E402


def _logits_close(ours, theirs, rtol=2e-4, atol=2e-4):
    np.testing.assert_allclose(
        np.asarray(ours, np.float32),
        theirs.detach().float().numpy(),
        rtol=rtol,
        atol=atol,
    )


@pytest.fixture(scope="module")
def token_batch():
    rng = np.random.default_rng(0)
    return rng.integers(1, 200, (2, 12)).astype(np.int32)


def test_gpt2_matches_hf(tmp_path_factory, token_batch):
    cfg = transformers.GPT2Config(
        vocab_size=256, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    path = tmp_path_factory.mktemp("gpt2")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="gpt2", checkpoint=str(path), dtype=jnp.float32)
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs)


def test_llama_matches_hf(tmp_path_factory, token_batch):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_dropout=0.0, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("llama")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="llama", checkpoint=str(path), dtype=jnp.float32)
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs)


def test_opt_matches_hf(tmp_path_factory, token_batch):
    cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64, dropout=0.0,
        do_layer_norm_before=True, word_embed_proj_dim=32,
    )
    torch.manual_seed(2)
    model = transformers.OPTForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("opt")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="opt", checkpoint=str(path), dtype=jnp.float32)
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs)


def test_lora_merge_matches_peft_merged(tmp_path_factory, token_batch):
    """Merging a PEFT LoRA adapter reproduces HF's merge_and_unload logits."""
    peft = pytest.importorskip("peft")

    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    base = transformers.LlamaForCausalLM(cfg).eval()
    base_path = tmp_path_factory.mktemp("llama_base")
    base.save_pretrained(base_path, safe_serialization=True)

    lcfg = peft.LoraConfig(
        r=4, lora_alpha=8, target_modules=["q_proj", "v_proj", "down_proj"],
        lora_dropout=0.0, init_lora_weights=False,  # random (nonzero) B
    )
    lora_model = peft.get_peft_model(
        transformers.LlamaForCausalLM.from_pretrained(base_path), lcfg
    ).eval()
    adapter_path = tmp_path_factory.mktemp("llama_adapter")
    lora_model.save_pretrained(adapter_path)

    merged = lora_model.merge_and_unload().eval()
    with torch.no_grad():
        theirs = merged(torch.tensor(token_batch, dtype=torch.long)).logits

    bundle = build_model(
        family="llama", checkpoint=str(base_path), dtype=jnp.float32,
        peft=str(adapter_path),
    )
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    _logits_close(ours, theirs, rtol=5e-4, atol=5e-4)


def test_simple_evaluate_accepts_in_memory_hf_model(tmp_path):
    """Reference API parity: simple_evaluate(model=<PreTrainedModel>)."""
    import json as _json

    from llm_lns_quantization_tpu.harness import simple_evaluate

    cfg = transformers.GPT2Config(
        vocab_size=256, n_positions=64, n_embd=32, n_layer=1, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(5)
    model = transformers.GPT2LMHeadModel(cfg).eval()

    data_dir = tmp_path / "piqa"
    data_dir.mkdir()
    docs = [
        {"goal": "dry shoes", "sol1": "use newspaper", "sol2": "freeze them", "label": 0},
        {"goal": "light candle", "sol1": "use match", "sol2": "use ice", "label": 0},
    ]
    (data_dir / "validation.json").write_text(_json.dumps(docs))

    res = simple_evaluate(
        model=model, tasks=["piqa"], data_dir=str(tmp_path),
        bootstrap_iters=10, no_cache=True,
    )
    assert "piqa" in res["results"]
    assert 0.0 <= res["results"]["piqa"]["acc"] <= 1.0


@pytest.mark.parametrize("gated", [False, True])
def test_t5_matches_hf(tmp_path_factory, token_batch, gated):
    """Both T5 v1.0 (relu, tied) and v1.1 (gated-gelu, untied) geometries."""
    cfg = transformers.T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=not gated, decoder_start_token_id=0,
    )
    torch.manual_seed(3 + gated)
    model = transformers.T5ForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp(f"t5_{gated}")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="t5", checkpoint=str(path), dtype=jnp.float32)
    assert bundle.is_seq2seq
    dec = np.concatenate(
        [np.zeros((2, 1), np.int32), token_batch[:, :6]], axis=1
    )
    ours = bundle.forward(
        bundle.params, bundle.cfg, jnp.asarray(token_batch), jnp.asarray(dec)
    )
    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(token_batch, dtype=torch.long),
            decoder_input_ids=torch.tensor(dec, dtype=torch.long),
        ).logits
    _logits_close(ours, theirs, rtol=5e-4, atol=5e-4)


def test_t5_encoder_padding_mask_matches_hf(tmp_path_factory, token_batch):
    cfg = transformers.T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj="relu", tie_word_embeddings=True,
        decoder_start_token_id=0,
    )
    torch.manual_seed(7)
    model = transformers.T5ForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("t5_mask")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="t5", checkpoint=str(path), dtype=jnp.float32)
    mask = np.ones_like(token_batch)
    mask[:, 8:] = 0  # pad out the tail
    dec = np.concatenate(
        [np.zeros((2, 1), np.int32), token_batch[:, :4]], axis=1
    )
    ours = bundle.forward(
        bundle.params, bundle.cfg, jnp.asarray(token_batch), jnp.asarray(dec),
        enc_attn_mask=jnp.asarray(mask),
    )
    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(token_batch, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            decoder_input_ids=torch.tensor(dec, dtype=torch.long),
        ).logits
    _logits_close(ours, theirs, rtol=5e-4, atol=5e-4)


def test_gptq_checkpoint_loads_and_matches_dequant(tmp_path_factory):
    """Synthesize an AutoGPTQ-format llama checkpoint with known codes; the
    loader's dequant must reproduce the exact float weights (and logits)."""
    from safetensors.numpy import save_file

    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(11)
    model = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy().copy() for k, v in model.state_dict().items()}

    bits, group_size = 4, 16
    pack = 32 // bits
    rng = np.random.default_rng(5)
    packed_sd = {}
    for name, w in sd.items():
        if name.endswith(".weight") and (
            "self_attn" in name or "mlp" in name
        ) and "norm" not in name:
            base = name[: -len(".weight")]
            out_f, in_f = w.shape
            groups = in_f // group_size
            codes = rng.integers(0, 16, (in_f, out_f)).astype(np.int64)
            zeros = rng.integers(1, 15, (groups, out_f)).astype(np.int64)
            scales = (rng.random((groups, out_f)).astype(np.float32) + 0.5) * 0.02
            g_idx = (np.arange(in_f) // group_size).astype(np.int32)
            # AutoGPTQ semantics: kernel computes scale*(code - (stored+1))
            # and pack-time stored = zero-1, so effective w = scale*(code-zero)
            w_deq = scales[g_idx] * (codes - zeros[g_idx])
            # overwrite the float model so both paths share ground truth
            sd[name] = None
            with torch.no_grad():
                dict(model.named_parameters())[name].copy_(
                    torch.tensor(w_deq.T.astype(np.float32))
                )
            # AutoGPTQ packs rows in order: rows [i*pack+p] -> word i shift p
            qweight = np.zeros((in_f // pack, out_f), np.int64)
            for i in range(in_f // pack):
                for p in range(pack):
                    qweight[i] |= codes[i * pack + p] << (bits * p)
            qz = zeros - 1  # pack-time `zeros -= 1` (gptq v1)
            qzeros = np.zeros((groups, out_f // pack), np.int64)
            for j in range(out_f // pack):
                for p in range(pack):
                    qzeros[:, j] |= qz[:, j * pack + p] << (bits * p)
            packed_sd[base + ".qweight"] = qweight.astype(np.int32)
            packed_sd[base + ".qzeros"] = qzeros.astype(np.int32)
            packed_sd[base + ".scales"] = scales
            packed_sd[base + ".g_idx"] = g_idx
        else:
            packed_sd[name] = w

    path = tmp_path_factory.mktemp("gptq_llama")
    save_file(packed_sd, str(path / "model.safetensors"))
    cfg.save_pretrained(path)
    import json as _json

    (path / "quantize_config.json").write_text(
        _json.dumps({"bits": bits, "group_size": group_size, "sym": False})
    )

    bundle = build_model(family="llama", checkpoint=str(path), dtype=jnp.float32)
    toks = np.random.default_rng(0).integers(1, 200, (2, 10)).astype(np.int32)
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(toks))
    with torch.no_grad():
        theirs = model(torch.tensor(toks, dtype=torch.long)).logits
    _logits_close(ours, theirs, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("rope_scaling", [
    {"rope_type": "linear", "factor": 2.0},
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 32},
])
def test_llama_rope_scaling_matches_hf(tmp_path_factory, token_batch, rope_scaling):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rope_theta=10000.0,
        rope_scaling=dict(rope_scaling), attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(13)
    model = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("llama_rope")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="llama", checkpoint=str(path), dtype=jnp.float32)
    assert bundle.cfg.rope_scaling is not None
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs, rtol=3e-4, atol=3e-4)


def test_opt_350m_style_matches_hf(tmp_path_factory, token_batch):
    """OPT-350m quirks: word_embed_proj_dim projections + post-LN blocks
    without a final decoder norm."""
    cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=16, do_layer_norm_before=False, dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(21)
    model = transformers.OPTForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("opt350")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="opt", checkpoint=str(path), dtype=jnp.float32)
    assert "project_in" in bundle.params and "final_ln" not in bundle.params
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("parallel", [True, False])
def test_neox_matches_hf(tmp_path_factory, token_batch, parallel):
    """GPT-NeoX/Pythia: fused per-head QKV, partial rotary (pct=0.25),
    parallel and sequential residual variants."""
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, rotary_pct=0.25,
        use_parallel_residual=parallel, hidden_act="gelu",
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    torch.manual_seed(7)
    model = transformers.GPTNeoXForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("neox")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="neox", checkpoint=str(path), dtype=jnp.float32)
    assert bundle.cfg.use_parallel_residual == parallel
    assert bundle.cfg.rotary_ndims == 2
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs)


def test_neo_matches_hf(tmp_path_factory, token_batch):
    """GPT-Neo: alternating global/local (sliding-window) attention,
    UNscaled attention scores, bias-free q/k/v, tied lm_head. The 12-token
    batch with window_size=4 makes the local layers actually mask."""
    cfg = transformers.GPTNeoConfig(
        vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
        max_position_embeddings=64, window_size=4,
        attention_types=[[["global", "local"], 1]],
        resid_dropout=0.0, embed_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(13)
    model = transformers.GPTNeoForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("neo")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="neo", checkpoint=str(path), dtype=jnp.float32)
    assert bundle.cfg.attention_layers == ("global", "local")
    assert bundle.cfg.window_size == 4
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs)


def test_gptj_matches_hf(tmp_path_factory, token_batch):
    """GPT-J: interleaved (rotate-every-two) partial rotary, one shared
    ln_1 feeding parallel attention+MLP, biased lm_head."""
    cfg = transformers.GPTJConfig(
        vocab_size=256, n_embd=32, n_layer=2, n_head=4, rotary_dim=4,
        n_positions=64, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(11)
    model = transformers.GPTJForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("gptj")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="gptj", checkpoint=str(path), dtype=jnp.float32)
    assert bundle.cfg.rotary_dim == 4
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs)


@pytest.mark.parametrize("post_ln_residual", [False, True])
def test_bloom_matches_hf(tmp_path_factory, token_batch, post_ln_residual):
    """BLOOM: ALiBi score bias, embedding LayerNorm, per-head-interleaved
    fused QKV, tied lm_head (reference evaluated BLOOM —
    lm_eval/models/bloom.csv)."""
    cfg = transformers.BloomConfig(
        vocab_size=256, hidden_size=32, n_layer=2, n_head=4,
        hidden_dropout=0.0, attention_dropout=0.0,
        apply_residual_connection_post_layernorm=post_ln_residual,
        slow_but_exact=False,
    )
    torch.manual_seed(17)
    model = transformers.BloomForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("bloom")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="bloom", checkpoint=str(path), dtype=jnp.float32)
    assert bundle.cfg.apply_residual_connection_post_layernorm == post_ln_residual
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = model(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs)


def test_bloom_alibi_slopes_match_hf():
    """Slope schedule parity incl. a non-power-of-2 head count."""
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    from llm_lns_quantization_tpu.models.bloom import alibi_slopes

    for nh in (4, 8, 12, 16, 6):
        mask = torch.ones(1, 5)
        hf = build_alibi_tensor(mask, nh, torch.float32)  # [nh, 1, 5]
        hf_slopes = hf.reshape(1, nh, 5)[0, :, -1] / 4.0  # key index 4
        np.testing.assert_allclose(
            np.asarray(alibi_slopes(nh)), hf_slopes.numpy(), rtol=1e-6
        )


def test_bert_matches_hf(tmp_path_factory, token_batch):
    """BERT (encoder-only MLM): post-LN blocks, token-type + learned
    positions, exact-GELU, tied MLM decoder + bias (reference ships the
    BERT.csv artifact with no adapter; here the family is first-class,
    scored via PLL — lm/tpu_mlm.py)."""
    cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, hidden_act="gelu",
    )
    torch.manual_seed(21)
    model = transformers.BertForMaskedLM(cfg).eval()
    path = tmp_path_factory.mktemp("bert")
    model.save_pretrained(path, safe_serialization=True)

    bundle = build_model(family="bert", checkpoint=str(path), dtype=jnp.float32)
    toks = torch.tensor(token_batch, dtype=torch.long)
    # padding-masked rows exercise the bidirectional attention mask path
    amask = torch.ones_like(toks)
    amask[1, -3:] = 0
    ours = bundle.forward(
        bundle.params, bundle.cfg, jnp.asarray(token_batch),
        attn_mask=jnp.asarray(amask.numpy()),
    )
    with torch.no_grad():
        theirs = model(toks, attention_mask=amask).logits
    # compare only non-pad positions (HF still computes logits at pads)
    _logits_close(ours[0], theirs[0])
    _logits_close(ours[1, :-3], theirs[1, :-3])


def test_export_roundtrip_gpt2(tmp_path_factory, token_batch):
    """models/hf_export.py: a trained param pytree saved as an HF checkpoint
    must (a) reload bit-identically through our own pretrained=<dir> loader
    and (b) be a valid stock-transformers GPT2LMHeadModel checkpoint with
    matching logits — the contract scripts/train_checkpoint.py relies on."""
    from llm_lns_quantization_tpu.models.hf_export import save_gpt2_checkpoint

    bundle = build_model(
        family="gpt2", preset="tiny",
        config_overrides={"vocab_size": 256, "n_positions": 64},
        dtype=jnp.float32, seed=11,
    )
    path = str(tmp_path_factory.mktemp("gpt2_export"))
    save_gpt2_checkpoint(bundle.cfg, bundle.params, path)

    # (a) our loader round-trips exactly
    re_bundle = build_model(family="gpt2", checkpoint=path, dtype=jnp.float32)
    for a, b in zip(jax.tree_util.tree_leaves(bundle.params),
                    jax.tree_util.tree_leaves(re_bundle.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) stock transformers accepts the checkpoint and agrees on logits
    hf = transformers.GPT2LMHeadModel.from_pretrained(path).eval()
    ours = bundle.forward(bundle.params, bundle.cfg, jnp.asarray(token_batch))
    with torch.no_grad():
        theirs = hf(torch.tensor(token_batch, dtype=torch.long)).logits
    _logits_close(ours, theirs)


def test_export_roundtrip_opt(tmp_path_factory):
    """models/hf_export.py save_opt_checkpoint: the IN-MEMORY params'
    forward must match both reload paths. The in-memory comparison is the
    load-bearing part (round-5 regression): OPT linears are stored
    transposed, and safetensors serializes the raw buffer — a transposed
    VIEW round-trips as garbage (both reload paths agreed with each other
    on the mangled data, so a reload-vs-reload check could never catch it;
    the trained OPT-125m scored ll -10 on its own training stream)."""
    from llm_lns_quantization_tpu.models.hf_export import save_opt_checkpoint

    bundle = build_model(
        family="opt", preset="tiny",
        config_overrides={"vocab_size": 256, "max_position_embeddings": 64},
        dtype=jnp.float32, seed=12,
    )
    path = str(tmp_path_factory.mktemp("opt_export"))
    save_opt_checkpoint(bundle.cfg, bundle.params, path)

    toks = np.asarray(
        np.arange(24, dtype=np.int32).reshape(2, 12) * 7 % 256)
    mem = np.asarray(bundle.forward(bundle.params, bundle.cfg,
                                    jnp.asarray(toks)))

    re_bundle = build_model(family="opt", checkpoint=path, dtype=jnp.float32)
    for a, b in zip(jax.tree_util.tree_leaves(bundle.params),
                    jax.tree_util.tree_leaves(re_bundle.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(re_bundle.forward(re_bundle.params, re_bundle.cfg,
                                     jnp.asarray(toks))),
        mem, rtol=1e-5, atol=1e-5)

    hf = transformers.OPTForCausalLM.from_pretrained(path).eval()
    with torch.no_grad():
        theirs = hf(torch.tensor(toks, dtype=torch.long)).logits
    _logits_close(jnp.asarray(mem), theirs)
