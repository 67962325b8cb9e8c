"""End-to-end graph parity: tiny random-weight HF models -> GGUF (our
converter) -> our JAX forward must match the HF torch forward.

This is the synthetic-model fixture strategy of the reference
(tests/gguf-model-data.cpp generates fake models in memory) with transformers
as the numerical oracle for the llama graph (RoPE permute, GQA, SwiGLU,
RMSNorm, tied heads).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llama_cpp_tpu.convert.hf_to_gguf import convert_hf_model
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.models.transformer import AttnInputs, forward
from llama_cpp_tpu.runtime.kv_cache import KVCache


def tiny_llama(vocab=199, layers=2, hidden=64, heads=4, kv_heads=2, inter=96):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def run_ours(path, tokens, n_slots=32, prefer_quant=False):
    m = load_model(path, prefer_quant=prefer_quant, dense_dtype=jnp.float32)
    N = len(tokens)
    if m.cfg.extra.get("memory") == "recurrent":
        from llama_cpp_tpu.runtime.memory import RecurrentState

        ex = m.cfg.extra
        kv = RecurrentState.create(
            m.cfg.n_layers, 1, ex["ssm_d_conv"], ex["ssm_d_inner"],
            ex["ssm_d_state"], conv_channels=ex.get("ssm_conv_dim"),
        )
        inputs = AttnInputs(
            seq_idx=jnp.zeros(1, jnp.int32),
            slots=jnp.arange(N, dtype=jnp.int32)[None, :],
            positions=jnp.arange(N, dtype=jnp.int32)[None, :],
        )
        logits, kv = m.forward_fn(
            m.params, m.cfg, jnp.asarray(tokens, jnp.int32)[None, :], inputs, kv
        )
        return m, np.asarray(logits), kv
    ex = m.cfg.extra
    kv = KVCache.create(
        m.cfg.n_layers, 1, n_slots,
        ex.get("cache_n_kv_heads", m.cfg.n_kv_heads),
        ex.get("cache_head_dim_k", m.cfg.head_dim_k),
        ex.get("cache_head_dim_v", m.cfg.head_dim_v), dtype=jnp.float32,
    )
    inputs = AttnInputs(
        seq_idx=jnp.zeros(1, jnp.int32),
        slots=jnp.arange(N, dtype=jnp.int32)[None, :],
        positions=jnp.arange(N, dtype=jnp.int32)[None, :],
    )
    logits, kv = m.forward_fn(
        m.params, m.cfg, jnp.asarray(tokens, jnp.int32)[None, :], inputs, kv
    )
    return m, np.asarray(logits), kv


def test_llama_logits_match_hf(tmp_path):
    hf = tiny_llama()
    path = str(tmp_path / "tiny.gguf")
    convert_hf_model(hf, path, ftype="f32")

    tokens = [3, 17, 42, 7, 150, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()

    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.arch == "llama"
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_llama_decode_matches_prefill(tmp_path):
    hf = tiny_llama(layers=2)
    path = str(tmp_path / "tiny.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [3, 17, 42, 7]

    m, prefill_logits, _ = run_ours(path, tokens)

    # token-by-token decode through the KV cache must agree with prefill
    m2 = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    kv = KVCache.create(2, 1, 32, m2.cfg.n_kv_heads, m2.cfg.head_dim_k,
                        m2.cfg.head_dim_v, dtype=jnp.float32)
    outs = []
    for i, t in enumerate(tokens):
        inp = AttnInputs(
            seq_idx=jnp.zeros(1, jnp.int32),
            slots=jnp.array([[i]], jnp.int32),
            positions=jnp.array([[i]], jnp.int32),
        )
        logits, kv = forward(m2.params, m2.cfg, jnp.array([[t]], jnp.int32), inp, kv)
        outs.append(np.asarray(logits)[0])
    np.testing.assert_allclose(np.stack(outs), prefill_logits, rtol=2e-4, atol=2e-4)


def test_llama_gqa_and_tied(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=6, num_key_value_heads=3,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = str(tmp_path / "tied.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [5, 9, 11]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    _, ours, _ = run_ours(path, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_qwen3_qk_norm(tmp_path):
    cfg = transformers.Qwen3Config(
        vocab_size=151, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    path = str(tmp_path / "qwen3.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [1, 50, 99, 3]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    _, ours, _ = run_ours(path, tokens)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_mixtral_moe(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=97, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    hf = transformers.MixtralForCausalLM(cfg).eval()
    path = str(tmp_path / "mixtral.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    _, ours, _ = run_ours(path, tokens)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_quantized_model_close(tmp_path):
    """Q8_0 storage must track the f32 logits closely (PPL-delta analog)."""
    hf = tiny_llama()
    p32 = str(tmp_path / "f32.gguf")
    p8 = str(tmp_path / "q8.gguf")
    convert_hf_model(hf, p32, ftype="f32")
    convert_hf_model(hf, p8, ftype="q8_0")
    tokens = [3, 17, 42, 7]
    _, ref, _ = run_ours(p32, tokens)
    _, ours, _ = run_ours(p8, tokens, prefer_quant=True)
    # logits in similar scale; q8 error small
    assert np.mean(np.abs(ours - ref)) / (np.mean(np.abs(ref)) + 1e-9) < 0.03


def test_gpt_oss(tmp_path):
    """gpt-oss: attention sinks + alternating SWA + biased MoE router with
    top-k-then-softmax gating and clamped swiglu_oai activation (reference
    src/models/openai-moe.cpp)."""
    cfg = transformers.GptOssConfig(
        vocab_size=131, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=4, max_position_embeddings=64, rope_scaling=None,
        tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    hf = transformers.GptOssForCausalLM(cfg).eval()
    path = str(tmp_path / "gptoss.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 130, 22, 9]  # > sliding_window so SWA matters
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.arch == "gpt-oss"
    assert m.cfg.is_swa_layer(0) and not m.cfg.is_swa_layer(1)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_mamba(tmp_path):
    """Mamba-1: selective SSM scan + rolling conv state (reference
    src/models/mamba.cpp, ggml SSM_SCAN/SSM_CONV ops)."""
    cfg = transformers.MambaConfig(
        vocab_size=121, hidden_size=48, num_hidden_layers=2,
        state_size=8, conv_kernel=4, intermediate_size=96,
        time_step_rank=3, use_cache=False, tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    hf = transformers.MambaForCausalLM(cfg).eval()
    path = str(tmp_path / "mamba.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 110, 22, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.arch == "mamba"
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_mamba_decode_matches_prefill(tmp_path):
    """Token-by-token recurrent decode == one-shot prefill."""
    cfg = transformers.MambaConfig(
        vocab_size=121, hidden_size=48, num_hidden_layers=2,
        state_size=8, conv_kernel=4, intermediate_size=96,
        time_step_rank=3, use_cache=False, tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    hf = transformers.MambaForCausalLM(cfg).eval()
    path = str(tmp_path / "mamba.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7]

    from llama_cpp_tpu.runtime.context import Context

    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(m, n_ctx=64, n_seqs=1)
    pre = ctx.prefill(tokens)

    ctx2 = Context(m, n_ctx=64, n_seqs=1)
    for t in tokens[:-1]:
        ctx2.decode_one(t)
    step = ctx2.decode_one(tokens[-1])
    np.testing.assert_allclose(step, pre, rtol=2e-4, atol=2e-4)


def _parity(hf, tmp_path, name, tokens=(2, 5, 40, 96, 7, 9), tol=4e-4):
    path = str(tmp_path / f"{name}.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = list(tokens)
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol)
    return m


def test_gpt2(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=120, n_positions=64, n_embd=48, n_layer=2, n_head=4,
        n_inner=None, activation_function="gelu_new",
    )
    torch.manual_seed(11)
    m = _parity(transformers.GPT2LMHeadModel(cfg).eval(), tmp_path, "gpt2")
    assert m.cfg.arch == "gpt2" and not m.cfg.use_rms_norm


def test_gptneox(tmp_path):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, rotary_pct=0.5,
        use_parallel_residual=True, max_position_embeddings=64,
    )
    torch.manual_seed(12)
    m = _parity(transformers.GPTNeoXForCausalLM(cfg).eval(), tmp_path, "neox")
    assert m.cfg.parallel_residual


def test_gptneox_sequential(tmp_path):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, rotary_pct=1.0,
        use_parallel_residual=False, max_position_embeddings=64,
    )
    torch.manual_seed(13)
    _parity(transformers.GPTNeoXForCausalLM(cfg).eval(), tmp_path, "neox2")


def test_phi2(tmp_path):
    cfg = transformers.PhiConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        partial_rotary_factor=0.5, max_position_embeddings=64,
    )
    torch.manual_seed(14)
    m = _parity(transformers.PhiForCausalLM(cfg).eval(), tmp_path, "phi2")
    assert m.cfg.shared_parallel_norm


def test_bloom_alibi(tmp_path):
    cfg = transformers.BloomConfig(
        vocab_size=120, hidden_size=48, n_layer=2, n_head=4,
    )
    torch.manual_seed(15)
    m = _parity(transformers.BloomForCausalLM(cfg).eval(), tmp_path, "bloom")
    assert m.cfg.alibi_bias > 0


def test_mamba2(tmp_path):
    """Mamba-2: fused zxBCdt, scalar per-head decay, grouped gated RMS norm
    (reference src/models/mamba2.cpp + build_mamba2_layer)."""
    # n_groups=1: HF's gated norm spans full d_inner while the reference
    # (and we) normalize per group — semantics coincide only at one group
    cfg = transformers.Mamba2Config(
        vocab_size=121, hidden_size=32, num_hidden_layers=2,
        state_size=8, conv_kernel=4, expand=2, head_dim=8, n_groups=1,
        num_heads=8, use_cache=False, tie_word_embeddings=False,
        chunk_size=16,
    )
    torch.manual_seed(9)
    hf = transformers.Mamba2ForCausalLM(cfg).eval()
    path = str(tmp_path / "mamba2.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 110, 22, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.arch == "mamba2"
    np.testing.assert_allclose(ours, ref, rtol=4e-4, atol=4e-4)


def test_jamba_hybrid(tmp_path):
    """Jamba: interleaved mamba/attention layers (no RoPE) + per-layer MoE
    (reference src/models/jamba.cpp + llama_memory_hybrid)."""
    cfg = transformers.JambaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=1,
        num_experts=4, num_experts_per_tok=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=3,
        use_mamba_kernels=False, max_position_embeddings=64,
        tie_word_embeddings=False, use_cache=False,
    )
    torch.manual_seed(21)
    hf = transformers.JambaForCausalLM(cfg).eval()
    path = str(tmp_path / "jamba.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 90, 22, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()

    from llama_cpp_tpu.runtime.context import Context

    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra.get("memory") == "hybrid"
    ctx = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    ours = ctx.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                      np.arange(len(tokens))[None, :],
                      np.arange(len(tokens)))
    np.testing.assert_allclose(ours, ref, rtol=4e-4, atol=4e-4)

    # decode continuation consistency through both memories
    ctx.seq_len[0] = len(tokens)
    step = ctx.decode_one(11)
    ctx2 = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    both = ctx2.decode(np.asarray(tokens + [11])[None, :], np.asarray([0]),
                       np.arange(len(tokens) + 1)[None, :],
                       np.asarray([len(tokens)]))
    np.testing.assert_allclose(step, both[0], rtol=3e-4, atol=3e-4)


def test_deepseek2_mla(tmp_path):
    """DeepSeek-V2 MLA: q-LoRA, latent KV compression, tail-dim RoPE, MoE
    with shared experts and dense-first layers (reference
    src/models/deepseek2.cpp)."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=99, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, q_lora_rank=16, kv_lora_rank=8,
        qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
        max_position_embeddings=64, tie_word_embeddings=False,
        use_cache=False, norm_topk_prob=False, routed_scaling_factor=1.0,
        topk_method="greedy", n_group=1, topk_group=1, scoring_func="softmax",
    )
    torch.manual_seed(23)
    hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
    path = str(tmp_path / "ds2.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 90, 22, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.arch == "deepseek2"
    assert m.cfg.head_dim_k == 12 and m.cfg.head_dim_v == 8
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_moe_gather_dispatch_matches_dense(tmp_path):
    """Single-token decode takes the gathered-expert path (mmid analog);
    it must produce the same tokens as the dense all-experts loop used in
    prefill — exercised via decode-vs-prefill equality on MoE models."""
    cfg = transformers.MixtralConfig(
        vocab_size=97, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=8, num_experts_per_tok=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    hf = transformers.MixtralForCausalLM(cfg).eval()
    path = str(tmp_path / "mx8.gguf")
    convert_hf_model(hf, path, ftype="f32")

    from llama_cpp_tpu.runtime.context import Context

    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    tokens = [2, 5, 40, 96, 7]
    ctx = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    pre = ctx.prefill(tokens)  # 5 tok * k=2 >= 8 experts -> dense loop

    ctx2 = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    for t in tokens[:-1]:
        ctx2.decode_one(t)  # 1 tok * 2 < 8 -> gather path
    step = ctx2.decode_one(tokens[-1])
    np.testing.assert_allclose(step, pre, rtol=2e-4, atol=2e-4)

    # gpt-oss biased experts through the gather path too
    gcfg = transformers.GptOssConfig(
        vocab_size=131, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=8, num_experts_per_tok=2,
        sliding_window=4, max_position_embeddings=64, rope_scaling=None,
        tie_word_embeddings=False,
    )
    torch.manual_seed(6)
    ghf = transformers.GptOssForCausalLM(gcfg).eval()
    gpath = str(tmp_path / "goss8.gguf")
    convert_hf_model(ghf, gpath, ftype="f32")
    gm = load_model(gpath, prefer_quant=False, dense_dtype=jnp.float32)
    gtoks = [2, 5, 40, 96, 7]
    with torch.no_grad():
        ref = ghf(torch.tensor([gtoks])).logits[0, -1].numpy()
    gctx = Context(gm, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    for t in gtoks[:-1]:
        gctx.decode_one(t)
    got = gctx.decode_one(gtoks[-1])
    np.testing.assert_allclose(got, ref, rtol=4e-4, atol=4e-4)


def test_bert_encoder(tmp_path):
    """BERT: post-norm bidirectional encoder (reference src/models/bert.cpp)
    — hidden states must match HF BertModel."""
    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, hidden_act="gelu",
    )
    torch.manual_seed(31)
    hf = transformers.BertModel(cfg).eval()
    path = str(tmp_path / "bert.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).last_hidden_state[0].numpy()

    from llama_cpp_tpu.models.transformer import AttnInputs

    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra.get("encoder")
    N = len(tokens)
    inputs = AttnInputs(
        seq_idx=jnp.zeros(1, jnp.int32),
        slots=jnp.arange(N, dtype=jnp.int32)[None, :],
        positions=jnp.arange(N, dtype=jnp.int32)[None, :],
    )
    hidden, _ = m.forward_fn(m.params, m.cfg,
                             jnp.asarray(tokens, jnp.int32)[None, :],
                             inputs, None, return_hidden=True)
    np.testing.assert_allclose(np.asarray(hidden), ref, rtol=3e-4, atol=3e-4)


def test_gemma2(tmp_path):
    cfg = transformers.Gemma2Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, query_pre_attn_scalar=12, sliding_window=4,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        max_position_embeddings=64,
    )
    torch.manual_seed(41)
    m = _parity(transformers.Gemma2ForCausalLM(cfg).eval(), tmp_path, "g2",
                tokens=(2, 5, 40, 96, 7, 130, 22, 9), tol=6e-4)
    assert m.cfg.attn_logit_softcap == 50.0 and m.cfg.swa_pattern == 2


def test_phi3(tmp_path):
    cfg = transformers.Phi3Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0,
    )
    torch.manual_seed(42)
    _parity(transformers.Phi3ForCausalLM(cfg).eval(), tmp_path, "phi3")


def test_starcoder2(tmp_path):
    cfg = transformers.Starcoder2Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, use_bias=True,
    )
    torch.manual_seed(43)
    m = _parity(transformers.Starcoder2ForCausalLM(cfg).eval(), tmp_path, "sc2")
    assert not m.cfg.use_rms_norm


def test_qwen2moe_shared_expert(tmp_path):
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=150, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, shared_expert_intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=64, tie_word_embeddings=False,
        norm_topk_prob=False,
    )
    torch.manual_seed(44)
    _parity(transformers.Qwen2MoeForCausalLM(cfg).eval(), tmp_path, "q2moe",
            tol=6e-4)


def test_granite(tmp_path):
    cfg = transformers.GraniteConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
        embedding_multiplier=6.0, residual_multiplier=0.5,
        attention_multiplier=0.3, logits_scaling=2.0,
    )
    torch.manual_seed(45)
    m = _parity(transformers.GraniteForCausalLM(cfg).eval(), tmp_path, "gr")
    assert m.cfg.residual_scale == 0.5


def test_olmo2(tmp_path):
    cfg = transformers.Olmo2Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(46)
    m = _parity(transformers.Olmo2ForCausalLM(cfg).eval(), tmp_path, "ol2")
    assert m.cfg.norm_after


def test_cohere_command_r(tmp_path):
    cfg = transformers.CohereConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, logit_scale=0.25, use_qk_norm=False,
    )
    torch.manual_seed(47)
    m = _parity(transformers.CohereForCausalLM(cfg).eval(), tmp_path, "cr")
    assert m.cfg.parallel_residual and m.cfg.logit_scale == 0.25


def test_glm4(tmp_path):
    cfg = transformers.Glm4Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0,
    )
    torch.manual_seed(48)
    _parity(transformers.Glm4ForCausalLM(cfg).eval(), tmp_path, "glm4")


def test_nemotron(tmp_path):
    cfg = transformers.NemotronConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(49)
    m = _parity(transformers.NemotronForCausalLM(cfg).eval(), tmp_path, "nem")
    assert m.cfg.act == "relu2"


def test_gemma1(tmp_path):
    cfg = transformers.GemmaConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=64,
    )
    torch.manual_seed(51)
    _parity(transformers.GemmaForCausalLM(cfg).eval(), tmp_path, "g1", tol=6e-4)


def test_gemma3(tmp_path):
    cfg = transformers.Gemma3TextConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, query_pre_attn_scalar=12, sliding_window=4,
        sliding_window_pattern=2, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, max_position_embeddings=64,
    )
    torch.manual_seed(52)
    hf = transformers.Gemma3ForCausalLM(cfg).eval()
    path = str(tmp_path / "g3.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 130, 22, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_qwen3moe(tmp_path):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=150, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(61)
    _parity(transformers.Qwen3MoeForCausalLM(cfg).eval(), tmp_path, "q3moe",
            tol=6e-4)


def test_olmoe(tmp_path):
    cfg = transformers.OlmoeConfig(
        vocab_size=150, hidden_size=32, intermediate_size=24,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(62)
    m = _parity(transformers.OlmoeForCausalLM(cfg).eval(), tmp_path, "olmoe",
                tol=6e-4)
    assert m.cfg.extra.get("qk_norm_full")


def test_falcon(tmp_path):
    cfg = transformers.FalconConfig(
        vocab_size=150, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, new_decoder_architecture=True,
        parallel_attn=True, bias=False,
    )
    torch.manual_seed(63)
    m = _parity(transformers.FalconForCausalLM(cfg).eval(), tmp_path, "falcon")
    assert m.cfg.parallel_residual


def test_smollm3_nope_layers(tmp_path):
    cfg = transformers.SmolLM3Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        no_rope_layer_interval=2, max_position_embeddings=64,
        tie_word_embeddings=False, use_sliding_window=False, pad_token_id=0,
    )
    torch.manual_seed(64)
    m = _parity(transformers.SmolLM3ForCausalLM(cfg).eval(), tmp_path, "sm3")
    assert len(m.cfg.extra.get("no_rope_layers", ())) == 2


def test_deepseek_v3(tmp_path):
    """DeepSeek-V3: sigmoid gating + expert-selection bias
    (e_score_correction_bias) + routed scaling."""
    cfg = transformers.DeepseekV3Config(
        vocab_size=99, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, q_lora_rank=16, kv_lora_rank=8,
        qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
        max_position_embeddings=64, tie_word_embeddings=False,
        use_cache=False, norm_topk_prob=True, routed_scaling_factor=2.5,
        topk_method="noaux_tc", n_group=1, topk_group=1,
        scoring_func="sigmoid", rope_scaling=None,
    )
    torch.manual_seed(71)
    hf = transformers.DeepseekV3ForCausalLM(cfg).eval()
    path = str(tmp_path / "ds3.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 90, 22, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.expert_gating == "sigmoid" and m.cfg.expert_weights_scale == 2.5
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_llama4(tmp_path):
    """Llama-4: interleaved MoE (gate on the expert input), shared expert,
    post-rope weightless qk norm, NoPE layers."""
    cfg = transformers.Llama4TextConfig(
        vocab_size=120, hidden_size=32, intermediate_size=48,
        intermediate_size_mlp=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, use_qk_norm=True,
        attn_temperature_tuning=False, attention_chunk_size=64,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0, use_cache=False,
    )
    torch.manual_seed(81)
    hf = transformers.Llama4ForCausalLM(cfg).eval()
    path = str(tmp_path / "l4.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 90, 22, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.extra.get("moe_weight_before")
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# round-1 batch 2: cohere2 / olmo / exaone4 / seed-oss / hunyuan / ernie4.5 /
# dbrx / granitemoe / dots1 / glm4-moe / ernie4.5-moe / phimoe
# ---------------------------------------------------------------------------


def test_cohere2(tmp_path):
    from transformers.models.cohere2 import Cohere2Config, Cohere2ForCausalLM
    cfg = Cohere2Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, logit_scale=0.25,
        sliding_window=4, sliding_window_pattern=2, pad_token_id=0,
    )
    torch.manual_seed(60)
    m = _parity(Cohere2ForCausalLM(cfg).eval(), tmp_path, "c2")
    assert m.cfg.swa_pattern == 2 and m.cfg.extra["no_rope_layers"] == (1, 3)


def test_olmo(tmp_path):
    from transformers.models.olmo import OlmoConfig, OlmoForCausalLM
    cfg = OlmoConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, clip_qkv=0.2,
    )
    torch.manual_seed(61)
    m = _parity(OlmoForCausalLM(cfg).eval(), tmp_path, "olmo")
    assert m.cfg.extra["weightless_norm"]
    assert abs(m.cfg.extra["clamp_kqv"] - 0.2) < 1e-6


def test_exaone4(tmp_path):
    from transformers.models.exaone4 import Exaone4Config, Exaone4ForCausalLM
    cfg = Exaone4Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=64,
        sliding_window=4, sliding_window_pattern=4, pad_token_id=0,
    )
    torch.manual_seed(62)
    m = _parity(Exaone4ForCausalLM(cfg).eval(), tmp_path, "ex4")
    assert m.cfg.norm_after and m.cfg.qk_norm
    assert m.cfg.extra["no_rope_layers"] == (3,)


def test_seed_oss(tmp_path):
    from transformers.models.seed_oss import SeedOssConfig, SeedOssForCausalLM
    cfg = SeedOssConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(63)
    _parity(SeedOssForCausalLM(cfg).eval(), tmp_path, "soss")


def test_hunyuan_dense(tmp_path):
    from transformers.models.hunyuan_v1_dense import (
        HunYuanDenseV1Config, HunYuanDenseV1ForCausalLM)
    cfg = HunYuanDenseV1Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(64)
    m = _parity(HunYuanDenseV1ForCausalLM(cfg).eval(), tmp_path, "hy")
    assert m.cfg.qk_norm and m.cfg.extra["qk_norm_after_rope"]


def test_ernie45(tmp_path):
    from transformers.models.ernie4_5 import Ernie4_5Config, Ernie4_5ForCausalLM
    cfg = Ernie4_5Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(65)
    _parity(Ernie4_5ForCausalLM(cfg).eval(), tmp_path, "e45")


def test_dbrx(tmp_path):
    from transformers.models.dbrx import DbrxConfig, DbrxForCausalLM
    cfg = DbrxConfig(
        d_model=48, n_heads=4, n_layers=2, max_seq_len=64, vocab_size=150,
        ffn_config={"ffn_hidden_size": 32, "moe_num_experts": 4, "moe_top_k": 2},
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0},
        pad_token_id=0,
    )
    torch.manual_seed(66)
    m = _parity(DbrxForCausalLM(cfg).eval(), tmp_path, "dbrx")
    assert m.cfg.n_expert == 4 and m.cfg.extra["clamp_kqv"] == 8.0


def test_granitemoe(tmp_path):
    from transformers.models.granitemoe import (
        GraniteMoeConfig, GraniteMoeForCausalLM)
    cfg = GraniteMoeConfig(
        vocab_size=150, hidden_size=48, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, pad_token_id=0,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
    )
    torch.manual_seed(67)
    m = _parity(GraniteMoeForCausalLM(cfg).eval(), tmp_path, "gmoe")
    # HF topk-then-softmax == softmax+renormalize over the selected k
    assert m.cfg.expert_weights_norm


def test_dots1(tmp_path):
    from transformers.models.dots1 import Dots1Config, Dots1ForCausalLM
    cfg = Dots1Config(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.5,
        norm_topk_prob=True, n_group=1, topk_group=1,
        max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(68)
    m = _parity(Dots1ForCausalLM(cfg).eval(), tmp_path, "dots1")
    assert m.cfg.expert_gating == "sigmoid" and m.cfg.qk_norm


def test_glm4_moe(tmp_path):
    from transformers.models.glm4_moe import Glm4MoeConfig, Glm4MoeForCausalLM
    cfg = Glm4MoeConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.5,
        norm_topk_prob=True, use_qk_norm=True, num_nextn_predict_layers=0,
        n_group=1, topk_group=1,
        max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(69)
    m = _parity(Glm4MoeForCausalLM(cfg).eval(), tmp_path, "g4m")
    assert m.cfg.qk_norm and m.cfg.rope_dims == 8


def test_ernie45_moe(tmp_path):
    from transformers.models.ernie4_5_moe import (
        Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM)
    cfg = Ernie4_5_MoeConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        moe_num_experts=8, moe_k=2, moe_num_shared_experts=1,
        moe_layer_start_index=1, moe_layer_interval=1,
        max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(70)
    m = _parity(Ernie4_5_MoeForCausalLM(cfg).eval(), tmp_path, "e45m")
    assert m.cfg.expert_weights_norm


def test_phimoe(tmp_path):
    from transformers.models.phimoe import PhimoeConfig, PhimoeForCausalLM
    cfg = PhimoeConfig(
        vocab_size=150, hidden_size=48, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        router_jitter_noise=0.01, max_position_embeddings=64,
        original_max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(71)
    m = _parity(PhimoeForCausalLM(cfg).eval(), tmp_path, "phm")
    assert m.cfg.expert_gating == "sparsemixer"


def _t5_parity(hf, tmp_path, name, gated):
    from llama_cpp_tpu.models import t5 as t5mod
    path = str(tmp_path / f"{name}.gguf")
    convert_hf_model(hf, path, ftype="f32")
    enc_toks = [4, 19, 7, 33, 2]
    dec_toks = [0, 8, 15, 3]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([enc_toks]),
                 decoder_input_ids=torch.tensor([dec_toks])).logits[0].numpy()
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    lw0 = m.params["layers"][0]
    assert m.cfg.extra["t5"]
    assert ("ffn_gate" in lw0 or "ffn_gateup" in lw0) == gated
    cross = t5mod.t5_encode(m.params, m.cfg, jnp.asarray([enc_toks], jnp.int32))
    N = len(dec_toks)
    kv = KVCache.create(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads,
                        m.cfg.head_dim_k, m.cfg.head_dim_v, dtype=jnp.float32)
    inputs = AttnInputs(
        seq_idx=jnp.zeros(1, jnp.int32),
        slots=jnp.arange(N, dtype=jnp.int32)[None, :],
        positions=jnp.arange(N, dtype=jnp.int32)[None, :],
    )
    logits, kv = t5mod.t5_forward(
        m.params, m.cfg, jnp.asarray([dec_toks], jnp.int32), inputs, kv,
        cross=cross)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=6e-4, atol=6e-4)

    # decode path: one token at a time through the KV cache must agree
    outs = []
    kv2 = KVCache.create(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads,
                         m.cfg.head_dim_k, m.cfg.head_dim_v, dtype=jnp.float32)
    for i, t in enumerate(dec_toks):
        inp = AttnInputs(seq_idx=jnp.zeros(1, jnp.int32),
                         slots=jnp.array([[i]], jnp.int32),
                         positions=jnp.array([[i]], jnp.int32))
        lg, kv2 = t5mod.t5_forward(
            m.params, m.cfg, jnp.array([[t]], jnp.int32), inp, kv2, cross=cross)
        outs.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(outs), ref, rtol=6e-4, atol=6e-4)
    return m


def test_t5(tmp_path):
    cfg = transformers.T5Config(
        vocab_size=150, d_model=48, d_kv=12, d_ff=96, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        feed_forward_proj="relu", tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(80)
    _t5_parity(transformers.T5ForConditionalGeneration(cfg).eval(),
               tmp_path, "t5", gated=False)


def test_flan_t5_gated(tmp_path):
    cfg = transformers.T5Config(
        vocab_size=150, d_model=48, d_kv=12, d_ff=96, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(81)
    _t5_parity(transformers.T5ForConditionalGeneration(cfg).eval(),
               tmp_path, "flant5", gated=True)


def test_t5_encoder_only(tmp_path):
    cfg = transformers.T5Config(
        vocab_size=150, d_model=48, d_kv=12, d_ff=96, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        feed_forward_proj="relu", pad_token_id=0,
    )
    torch.manual_seed(82)
    hf = transformers.T5EncoderModel(cfg).eval()
    path = str(tmp_path / "t5enc.gguf")
    convert_hf_model(hf, path, ftype="f32")
    toks = [4, 19, 7, 33, 2]
    with torch.no_grad():
        ref = hf(torch.tensor([toks])).last_hidden_state[0].numpy()
    from llama_cpp_tpu.models import t5 as t5mod
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["t5_encoder_only"]
    out = t5mod.t5_encode(m.params, m.cfg, jnp.asarray([toks], jnp.int32))
    np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=6e-4, atol=6e-4)


def test_t5_generate_matches_hf(tmp_path):
    """Full runtime path: Context encode + decoder-start + greedy decode."""
    from llama_cpp_tpu.runtime.context import Context
    cfg = transformers.T5Config(
        vocab_size=150, d_model=48, d_kv=12, d_ff=96, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        feed_forward_proj="relu", tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=149,
    )
    torch.manual_seed(80)
    hf = transformers.T5ForConditionalGeneration(cfg).eval()
    path = str(tmp_path / "t5g.gguf")
    convert_hf_model(hf, path, ftype="f32")
    enc_toks = [4, 19, 7, 33, 2]
    ctx = Context(load_model(path, prefer_quant=False, dense_dtype=jnp.float32),
                  n_ctx=64, n_seqs=1)
    ours = ctx.generate(enc_toks, max_new_tokens=10)
    with torch.no_grad():
        ref = hf.generate(torch.tensor([enc_toks]), max_new_tokens=10,
                          do_sample=False)[0][1:].tolist()
    assert ours == ref


def test_falcon_h1(tmp_path):
    """Falcon-H1: parallel attention + mamba2 per layer, channel multipliers
    folded at conversion (reference src/models/falcon-h1.cpp)."""
    from transformers.models.falcon_h1 import FalconH1Config, FalconH1ForCausalLM
    cfg = FalconH1Config(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, mamba_d_ssm=64, mamba_n_heads=4, mamba_d_head=16,
        mamba_n_groups=1, mamba_d_state=16, mamba_d_conv=4, mamba_expand=2,
        key_multiplier=0.5, attention_out_multiplier=1.5,
        mlp_multipliers=[2.0, 0.5], ssm_multipliers=[1.0, 0.5, 2.0, 1.0, 0.7],
        embedding_multiplier=2.0, lm_head_multiplier=0.25,
        tie_word_embeddings=False, use_cache=False, pad_token_id=0,
        max_position_embeddings=64,
    )
    torch.manual_seed(90)
    hf = FalconH1ForCausalLM(cfg).eval()
    path = str(tmp_path / "fh1.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 9, 7, 90, 22, 3]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    from llama_cpp_tpu.runtime.context import Context
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["dual_mixer"] and m.cfg.extra["memory"] == "hybrid"
    ctx = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    ours = ctx.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                      np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)

    ctx.seq_len[0] = len(tokens)
    step = ctx.decode_one(11)
    ctx2 = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    both = ctx2.decode(np.asarray(tokens + [11])[None, :], np.asarray([0]),
                       np.arange(len(tokens) + 1)[None, :],
                       np.asarray([len(tokens)]))
    np.testing.assert_allclose(step, both[0], rtol=4e-4, atol=4e-4)


def test_granite_hybrid(tmp_path):
    """Granite-4 hybrid: per-layer mamba2/attention (NoPE), granite
    multipliers, MoE + gated shared FFN (reference granite-hybrid.cpp)."""
    from transformers.models.granitemoehybrid import (
        GraniteMoeHybridConfig, GraniteMoeHybridForCausalLM)
    cfg = GraniteMoeHybridConfig(
        vocab_size=96, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["mamba", "attention"],
        mamba_d_state=16, mamba_d_conv=4, mamba_expand=2, mamba_n_heads=4,
        mamba_n_groups=1, num_local_experts=4, num_experts_per_tok=2,
        shared_intermediate_size=32, embedding_multiplier=2.0,
        residual_multiplier=0.8, attention_multiplier=0.2,
        logits_scaling=2.0, tie_word_embeddings=False, use_cache=False,
        pad_token_id=0, max_position_embeddings=64,
    )
    torch.manual_seed(91)
    hf = GraniteMoeHybridForCausalLM(cfg).eval()
    path = str(tmp_path / "gh.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 9, 7, 90, 22, 3]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    from llama_cpp_tpu.runtime.context import Context
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["memory"] == "hybrid"
    ctx = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    ours = ctx.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                      np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


def test_lfm2(tmp_path):
    """LFM2: short-conv mixer + attention hybrid with per-head qk norm
    (reference src/models/lfm2.cpp build_shortconv_block)."""
    from transformers.models.lfm2 import Lfm2Config, Lfm2ForCausalLM
    cfg = Lfm2Config(
        vocab_size=96, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=3, layer_types=["conv", "full_attention"],
        block_multiple_of=16, use_cache=False, pad_token_id=0,
        max_position_embeddings=64,
    )
    torch.manual_seed(92)
    hf = Lfm2ForCausalLM(cfg).eval()
    path = str(tmp_path / "lfm2.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 9, 7, 90, 22, 3]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    from llama_cpp_tpu.runtime.context import Context
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["shortconv_l"] == 3
    ctx = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    ours = ctx.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                      np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)

    # decode continuation through the conv window state
    ctx.seq_len[0] = len(tokens)
    step = ctx.decode_one(11)
    ctx2 = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    both = ctx2.decode(np.asarray(tokens + [11])[None, :], np.asarray([0]),
                       np.arange(len(tokens) + 1)[None, :],
                       np.asarray([len(tokens)]))
    np.testing.assert_allclose(step, both[0], rtol=4e-4, atol=4e-4)


def test_qwen3_next(tmp_path):
    """Qwen3-Next: gated DeltaNet linear attention + gated full attention
    (partial rope) + MoE with gated shared expert (reference
    src/models/qwen3next.cpp, delta-net-base.cpp)."""
    from transformers.models.qwen3_next import (
        Qwen3NextConfig, Qwen3NextForCausalLM)
    cfg = Qwen3NextConfig(
        vocab_size=96, hidden_size=48, intermediate_size=64,
        moe_intermediate_size=32, shared_expert_intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=3, full_attention_interval=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, use_cache=False, pad_token_id=0,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(93)
    hf = Qwen3NextForCausalLM(cfg).eval()
    path = str(tmp_path / "q3n.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 9, 7, 90, 22, 3]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    from llama_cpp_tpu.runtime.context import Context
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["memory"] == "hybrid"
    assert "ssm_ba" in m.params["layers"][0]
    assert "attn_gate" in m.params["layers"][1]
    ctx = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    ours = ctx.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                      np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    np.testing.assert_allclose(ours, ref, rtol=6e-4, atol=6e-4)

    # decode continuation through conv window + delta state
    ctx.seq_len[0] = len(tokens)
    step = ctx.decode_one(11)
    ctx2 = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    both = ctx2.decode(np.asarray(tokens + [11])[None, :], np.asarray([0]),
                       np.arange(len(tokens) + 1)[None, :],
                       np.asarray([len(tokens)]))
    np.testing.assert_allclose(step, both[0], rtol=5e-4, atol=5e-4)


def test_arcee(tmp_path):
    from transformers.models.arcee import ArceeConfig, ArceeForCausalLM
    cfg = ArceeConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(95)
    m = _parity(ArceeForCausalLM(cfg).eval(), tmp_path, "arcee")
    assert m.cfg.act == "relu2" and not m.cfg.glu


def test_apertus_xielu(tmp_path):
    from transformers.models.apertus import ApertusConfig, ApertusForCausalLM
    cfg = ApertusConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(96)
    m = _parity(ApertusForCausalLM(cfg).eval(), tmp_path, "apts")
    assert m.cfg.act == "xielu" and len(m.cfg.extra["xielu"]["beta"]) == 2


def test_chameleon(tmp_path):
    from transformers.models.chameleon import ChameleonConfig, ChameleonForConditionalGeneration
    cfg = ChameleonConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, pad_token_id=0, swin_norm=False,
        vocabulary_map={"0": 0},
    )
    torch.manual_seed(97)
    hf = ChameleonForConditionalGeneration(cfg).eval()
    m = _parity(hf, tmp_path, "cham")
    assert m.cfg.extra["qk_layernorm"]


def test_modernbert(tmp_path):
    """ModernBERT encoder: pre-norm, fused qkv, GEGLU, alternating
    global/local symmetric windows with dual rope bases."""
    from transformers.models.modernbert import ModernBertConfig, ModernBertModel
    cfg = ModernBertConfig(
        vocab_size=150, hidden_size=48, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4,
        global_attn_every_n_layers=3, local_attention=8,
        global_rope_theta=160000.0, local_rope_theta=10000.0,
        pad_token_id=0, max_position_embeddings=128,
    )
    torch.manual_seed(98)
    hf = ModernBertModel(cfg).eval()
    path = str(tmp_path / "mbert.gguf")
    convert_hf_model(hf, path, ftype="f32")
    toks = list(range(3, 3 + 24))
    with torch.no_grad():
        ref = hf(torch.tensor([toks])).last_hidden_state[0].numpy()
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["pre_norm_encoder"] and m.cfg.sliding_window == 8
    assert m.cfg.is_swa_layer(1) and not m.cfg.is_swa_layer(0)
    N = len(toks)
    inputs = AttnInputs(
        seq_idx=jnp.zeros(1, jnp.int32),
        slots=jnp.arange(N, dtype=jnp.int32)[None, :],
        positions=jnp.arange(N, dtype=jnp.int32)[None, :],
    )
    hid, _ = m.forward_fn(m.params, m.cfg,
                          jnp.asarray([toks], jnp.int32), inputs, None)
    np.testing.assert_allclose(np.asarray(hid).reshape(N, -1), ref,
                               rtol=6e-4, atol=6e-4)


def test_qwen2vl_text(tmp_path):
    """Qwen2-VL text stack with M-RoPE (reference src/models/qwen2vl.cpp +
    ggml_rope_multi); text-only rows broadcast positions to all streams."""
    from transformers.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLForConditionalGeneration)
    vc = dict(depth=2, embed_dim=32, hidden_size=48, mlp_ratio=2,
              num_heads=4, patch_size=4, temporal_patch_size=2,
              spatial_merge_size=2, in_channels=3)
    cfg = Qwen2VLConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vision_config=vc, rope_scaling={"type": "mrope",
                                        "mrope_section": [2, 2, 2]},
        max_position_embeddings=128, pad_token_id=0,
    )
    torch.manual_seed(99)
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    path = str(tmp_path / "q2vl.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [3, 17, 42, 7, 9]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.extra["mrope_sections"] == (2, 2, 2)
    np.testing.assert_allclose(ours, ref, rtol=4e-4, atol=4e-4)


def test_roberta_encoder(tmp_path):
    """RoBERTa maps onto the bert arch with position rows offset by
    pad_token_id+1 (reference conversion/bert.py RobertaModel)."""
    cfg = transformers.RobertaConfig(
        vocab_size=120, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=66, pad_token_id=1, type_vocab_size=1,
    )
    torch.manual_seed(102)
    hf = transformers.RobertaModel(cfg).eval()
    path = str(tmp_path / "roberta.gguf")
    convert_hf_model(hf, path, ftype="f32")
    toks = [5, 9, 30, 44, 2]
    with torch.no_grad():
        ref = hf(torch.tensor([toks])).last_hidden_state[0].numpy()
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    N = len(toks)
    inputs = AttnInputs(
        seq_idx=jnp.zeros(1, jnp.int32),
        slots=jnp.arange(N, dtype=jnp.int32)[None, :],
        positions=jnp.arange(N, dtype=jnp.int32)[None, :],
    )
    hid, _ = m.forward_fn(m.params, m.cfg, jnp.asarray([toks], jnp.int32),
                          inputs, None)
    np.testing.assert_allclose(np.asarray(hid).reshape(N, -1), ref,
                               rtol=6e-4, atol=6e-4)


def test_gemma3n(tmp_path):
    """Gemma 3n: altup streams, laurel, per-layer embeddings, activation
    sparsity, cross-layer KV sharing (reference src/models/gemma3n.cpp)."""
    cfg = transformers.Gemma3nTextConfig(
        vocab_size=150, vocab_size_per_layer_input=150, hidden_size=48,
        intermediate_size=[64] * 6, num_hidden_layers=6,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        altup_num_inputs=4, altup_active_idx=0, laurel_rank=8,
        hidden_size_per_layer_input=16, num_kv_shared_layers=2,
        layer_types=["sliding_attention", "sliding_attention",
                     "full_attention"] * 2,
        sliding_window=4, rope_theta=1000000.0, rope_local_base_freq=10000.0,
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0, 0.0],
        final_logit_softcapping=30.0, max_position_embeddings=64,
        rms_norm_eps=1e-6,
    )
    torch.manual_seed(71)
    hf = transformers.Gemma3nForCausalLM(cfg).eval()
    path = str(tmp_path / "g3n.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 130, 22, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    m, ours, _ = run_ours(path, tokens)
    assert m.cfg.extra.get("kv_reuse") == [-1, -1, -1, -1, 3, 2]
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


def test_gemma3n_stepwise_decode(tmp_path):
    """KV sharing through the iSWA cache: token-by-token decode must equal
    the one-shot prefill logits (shared layers read owned layers' lines)."""
    cfg = transformers.Gemma3nTextConfig(
        vocab_size=150, vocab_size_per_layer_input=150, hidden_size=48,
        intermediate_size=[64] * 6, num_hidden_layers=6,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        altup_num_inputs=2, altup_active_idx=0, laurel_rank=8,
        hidden_size_per_layer_input=16, num_kv_shared_layers=2,
        layer_types=["sliding_attention", "sliding_attention",
                     "full_attention"] * 2,
        sliding_window=4, rope_theta=1000000.0, rope_local_base_freq=10000.0,
        activation_sparsity_pattern=[0.95, 0.0, 0.0, 0.0, 0.0, 0.0],
        final_logit_softcapping=30.0, max_position_embeddings=64,
        rms_norm_eps=1e-6,
    )
    torch.manual_seed(72)
    hf = transformers.Gemma3nForCausalLM(cfg).eval()
    path = str(tmp_path / "g3ns.gguf")
    convert_hf_model(hf, path, ftype="f32")
    tokens = [2, 5, 40, 96, 7, 130, 22, 9]

    from llama_cpp_tpu.runtime.context import Context

    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(m, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    pre = ctx.prefill(tokens)
    # shared layers own no cache lines: the full half holds 2 layers (2,?)
    # minus none shared-full; 6 layers = 4 owned (3 swa + 1 full... ) —
    # assert fewer lines than model layers
    ctx2 = Context(m, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    for t in tokens[:-1]:
        ctx2.decode_one(t)
    step = ctx2.decode_one(tokens[-1])
    np.testing.assert_allclose(step, pre, rtol=3e-4, atol=3e-4)
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(pre).reshape(-1), ref,
                               rtol=3e-3, atol=3e-3)
