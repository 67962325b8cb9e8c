"""Runtime context tests on the synthetic tiny model: generation determinism,
KV consistency, multi-sequence isolation, seq ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.sampling.samplers import SamplerChain, SamplingParams
from llama_cpp_tpu.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_llama_gguf(path, vocab_size=300, n_layers=2, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128)
    return load_model(path, prefer_quant=False, dense_dtype=jnp.float32)


def test_tokenizer_roundtrip(tiny_model):
    tok = tiny_model.tokenizer
    ids = tok.encode("the cat", add_special=True)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids[1:]) == "the cat"


def test_greedy_generation_deterministic(tiny_model):
    ctx1 = Context(tiny_model, n_ctx=64)
    ctx2 = Context(tiny_model, n_ctx=64)
    prompt = tiny_model.tokenizer.encode("the")
    out1 = ctx1.generate(prompt, max_new_tokens=8)
    out2 = ctx2.generate(prompt, max_new_tokens=8)
    assert out1 == out2
    assert len(out1) >= 1


def test_prefill_equals_stepwise(tiny_model):
    prompt = [1, 5, 9, 30, 42]
    ctx1 = Context(tiny_model, n_ctx=32)
    l1 = ctx1.prefill(prompt)
    ctx2 = Context(tiny_model, n_ctx=32)
    for t in prompt[:-1]:
        ctx2.decode_one(t)
    l2 = ctx2.decode_one(prompt[-1])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-4)


def test_multi_seq_isolation(tiny_model):
    """Decoding seq 1 must not change seq 0's continuation."""
    ctx = Context(tiny_model, n_ctx=32, n_seqs=2)
    l0 = ctx.prefill([1, 5, 9], seq=0)
    ctx.prefill([2, 7], seq=1)
    ctx.decode_one(11, seq=1)
    ctx_ref = Context(tiny_model, n_ctx=32, n_seqs=2)
    l0_ref = ctx_ref.prefill([1, 5, 9], seq=0)
    np.testing.assert_allclose(l0, l0_ref, rtol=1e-5)
    # continuation after other-seq activity matches a fresh context
    cont = ctx.decode_one(4, seq=0)
    cont_ref = ctx_ref.decode_one(4, seq=0)
    np.testing.assert_allclose(cont, cont_ref, rtol=1e-4, atol=1e-4)


def test_seq_rm_resets(tiny_model):
    ctx = Context(tiny_model, n_ctx=32)
    l1 = ctx.prefill([1, 5, 9])
    ctx.seq_rm(0)
    assert ctx.seq_len[0] == 0
    l2 = ctx.prefill([1, 5, 9])
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_seq_cp(tiny_model):
    ctx = Context(tiny_model, n_ctx=32, n_seqs=2)
    ctx.prefill([1, 5, 9], seq=0)
    ctx.seq_cp(1, 0)
    a = ctx.decode_one(4, seq=0)
    b = ctx.decode_one(4, seq=1)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_batched_decode_matches_single(tiny_model):
    ctx = Context(tiny_model, n_ctx=32, n_seqs=2)
    ctx.prefill([1, 5], seq=0)
    ctx.prefill([2, 7, 9], seq=1)
    both = ctx.decode_step_multi(np.array([11, 13]), np.array([0, 1]))

    ref = Context(tiny_model, n_ctx=32, n_seqs=2)
    ref.prefill([1, 5], seq=0)
    ref.prefill([2, 7, 9], seq=1)
    r0 = ref.decode_one(11, seq=0)
    r1 = ref.decode_one(13, seq=1)
    np.testing.assert_allclose(both[0], r0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(both[1], r1, rtol=1e-4, atol=1e-4)


def test_sampled_generation_with_seed(tiny_model):
    ctx = Context(tiny_model, n_ctx=64)
    prompt = [1, 5]
    p = SamplingParams(temp=0.9, seed=123)
    out1 = ctx.generate(prompt, 6, SamplerChain.from_params(p))
    ctx.seq_rm(0)
    out2 = ctx.generate(prompt, 6, SamplerChain.from_params(p))
    assert out1 == out2


def test_quantized_kv_close(tiny_model):
    ctx_f = Context(tiny_model, n_ctx=32, kv_dtype=jnp.float32)
    ctx_q = Context(tiny_model, n_ctx=32, quantized_kv=True)
    prompt = [1, 5, 9, 30]
    lf = ctx_f.prefill(prompt)
    lq = ctx_q.prefill(prompt)
    # int8 KV must stay close in logit space
    assert np.mean(np.abs(lf - lq)) / (np.abs(lf).mean() + 1e-9) < 0.05


def test_perf_counters(tiny_model):
    ctx = Context(tiny_model, n_ctx=32)
    ctx.generate([1, 5, 9], max_new_tokens=4)
    s = ctx.perf.summary()
    assert s["n_prefill"] == 3
    assert s["n_decode"] >= 1


def test_ondevice_generation_matches_host(tiny_model):
    ctx1 = Context(tiny_model, n_ctx=64)
    prompt = [1, 5, 9]
    host = ctx1.generate(prompt, max_new_tokens=10)
    ctx2 = Context(tiny_model, n_ctx=64)
    dev = ctx2.generate_ondevice(prompt, max_new_tokens=10, chunk=4)
    assert host == dev


def test_iswa_ring_cache_matches_unified(tmp_path):
    """Interleaved-SWA models: window-sized ring caches for SWA layers must
    produce the same tokens as the full-size unified cache
    (llama_kv_cache_iswa analog, reference src/llama-kv-cache-iswa.h)."""
    import numpy as np

    import jax.numpy as jnp
    from llama_cpp_tpu.gguf.constants import Keys
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.runtime.kv_cache import ISWACache, KVCache
    from llama_cpp_tpu.testing import make_tiny_llama_gguf

    p = str(tmp_path / "swa.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=4, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    m = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    # force a gemma2-style interleave: window 16, every 2nd layer full
    m.cfg = m.cfg.with_(sliding_window=16, swa_pattern=2)

    prompt = list(np.random.default_rng(0).integers(4, 250, 40))
    ctx = Context(m, n_ctx=1024, n_seqs=1, n_ubatch=32)
    assert isinstance(ctx.kv, ISWACache)
    assert ctx.kv.swa.n_slots < ctx.kv.full.n_slots
    out_ring = ctx.generate(prompt, max_new_tokens=10)

    # unified-cache reference: disable the pattern trigger by constructing
    # a plain Context with swa masks still applied (same cfg but no ring)
    ctx2 = Context(m, n_ctx=1024, n_seqs=1, n_ubatch=32, paged=False)
    ctx2.kv = KVCache.create(4, 1, ctx2.n_slots, 2, 16, 16, dtype=jnp.bfloat16)
    ctx2._steps.clear()
    out_full = ctx2.generate(prompt, max_new_tokens=10)
    assert out_ring == out_full


def test_iswa_ring_wrap(tmp_path):
    """Ring smaller than the sequence: old window entries are overwritten in
    place, outputs still match the unified cache (wrap correctness)."""
    import numpy as np

    import jax.numpy as jnp
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.runtime.kv_cache import ISWACache, KVCache
    from llama_cpp_tpu.testing import make_tiny_llama_gguf

    p = str(tmp_path / "swa2.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    m = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    m.cfg = m.cfg.with_(sliding_window=16, swa_pattern=2)

    prompt = list(np.random.default_rng(1).integers(4, 250, 100))
    ctx = Context(m, n_ctx=512, n_seqs=1, n_ubatch=32, paged=False)
    # shrink the ring below the sequence length to force wrapping
    ctx.kv = ISWACache.build(m.cfg, 1, ctx.n_slots, 64,
                             dtype=jnp.bfloat16)
    ctx._steps.clear()
    out_ring = ctx.generate(prompt, max_new_tokens=8)

    ctx2 = Context(m, n_ctx=512, n_seqs=1, n_ubatch=32, paged=False)
    ctx2.kv = KVCache.create(2, 1, ctx2.n_slots, 2, 16, 16, dtype=jnp.bfloat16)
    ctx2._steps.clear()
    out_full = ctx2.generate(prompt, max_new_tokens=8)
    assert out_ring == out_full


def test_nemotron_h_block_types(tmp_path):
    """Nemotron-H M/A/F one-block-per-layer pattern: decode must match
    prefill through the hybrid memory (reference nemotron-h.cpp)."""
    import numpy as np
    import jax.numpy as jnp
    from llama_cpp_tpu.testing import make_tiny_nemotron_h_gguf
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context

    path = str(tmp_path / "nh.gguf")
    make_tiny_nemotron_h_gguf(path, seed=7)
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["memory"] == "hybrid" and m.cfg.act == "relu2"
    lt = m.params["layers"]
    assert "ssm_in" in lt[0] and "attn_output" in lt[1]
    assert "ffn_up" in lt[2] and "attn_output" not in lt[2]

    tokens = [3, 17, 42, 7, 9, 11]
    ctx = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    pre = ctx.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                     np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    ctx2 = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    outs = []
    for i, t in enumerate(tokens):
        outs.append(ctx2.decode(np.asarray([[t]]), np.asarray([0]),
                                np.asarray([[i]]), np.asarray([0]))[0])
        ctx2.seq_len[0] = i + 1
    np.testing.assert_allclose(np.stack(outs), pre, rtol=2e-4, atol=2e-4)


def test_diffusion_generate(tmp_path):
    """Diffusion LM loop (reference examples/diffusion): all masks resolve,
    deterministic at temp 0, and prompt tokens are untouched."""
    import numpy as np
    import jax.numpy as jnp
    from llama_cpp_tpu.testing import make_tiny_diffusion_gguf
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.runtime.diffusion import DiffusionParams, diffusion_generate

    path = str(tmp_path / "llada.gguf")
    make_tiny_diffusion_gguf(path, arch="llada", seed=8)
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["non_causal"] and m.cfg.extra["diffusion"]
    mask_id = m.tokenizer.vocab.mask_id
    assert mask_id == 159

    ctx = Context(m, n_ctx=32, n_seqs=1, n_ubatch=32)
    prompt = [3, 17, 42]
    p = DiffusionParams(steps=8, max_length=16, algorithm="confidence", seed=1)
    out = diffusion_generate(ctx, prompt, p)
    assert len(out) == 16 - len(prompt)
    assert mask_id not in out  # every position resolved
    out2 = diffusion_generate(ctx, prompt, p)
    assert out == out2  # deterministic

    # entropy + block schedule paths
    p2 = DiffusionParams(steps=8, max_length=16, algorithm="entropy",
                         schedule="block", block_length=8, seed=1)
    out3 = diffusion_generate(ctx, prompt, p2)
    assert mask_id not in out3

    # non-causal attention sanity: a masked tail must still influence
    # nothing about determinism but bidirectionality means logits at pos 0
    # depend on later tokens — check two different tails give different
    # first-step logits
    import numpy as np
    seq_a = np.array(prompt + [5] * 13)
    seq_b = np.array(prompt + [9] * 13)
    ctx.seq_rm(0)
    la = ctx.decode(seq_a[None], np.asarray([0]), np.arange(16)[None], np.asarray([0]))
    ctx.seq_rm(0)
    lb = ctx.decode(seq_b[None], np.asarray([0]), np.arange(16)[None], np.asarray([0]))
    assert np.abs(la - lb).max() > 1e-4


import pytest as _pytest


@_pytest.mark.parametrize("arch,opts", [
    ("internlm2", {}),
    ("orion", {"norm_bias": True}),
    ("xverse", {}),
    ("baichuan", {}),
    ("exaone", {}),
    ("deepseek", {}),
    ("minicpm", {"tie": True}),
    ("jais", {"norm_bias": True, "gate_bias": True, "tie": True}),
])
def test_generic_arch_smoke(tmp_path, arch, opts):
    """Registry smoke tests for GGUF-side archs with no local HF oracle:
    the graph must run and token-by-token decode must match prefill."""
    import numpy as np
    import jax.numpy as jnp
    from llama_cpp_tpu.testing import make_tiny_generic_gguf
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context

    path = str(tmp_path / f"{arch}.gguf")
    make_tiny_generic_gguf(path, arch, seed=11, **opts)
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.arch == arch
    tokens = [3, 17, 42, 7, 9]
    ctx = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    pre = ctx.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                     np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    ctx2 = Context(m, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    outs = []
    for i, t in enumerate(tokens):
        outs.append(ctx2.decode(np.asarray([[t]]), np.asarray([0]),
                                np.asarray([[i]]), np.asarray([0]))[0])
        ctx2.seq_len[0] = i + 1
    np.testing.assert_allclose(np.stack(outs), pre, rtol=2e-4, atol=2e-4)


def test_dsa_sparse_attention(tmp_path):
    """DeepSeek V3.2 DSA: with top_k >= context the sparse mask selects
    everything and must equal the dense deepseek2 run on the same weights;
    with a small top_k, decode must match prefill through both caches."""
    import numpy as np
    import jax.numpy as jnp
    from llama_cpp_tpu.testing import make_tiny_deepseek32_gguf
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context

    tokens = [3, 17, 42, 7, 9, 11]
    dense_p = str(tmp_path / "ds2.gguf")
    sparse_p = str(tmp_path / "ds32.gguf")
    make_tiny_deepseek32_gguf(dense_p, seed=13, arch="deepseek2")
    make_tiny_deepseek32_gguf(sparse_p, seed=13, top_k=64)

    md = load_model(dense_p, prefer_quant=False, dense_dtype=jnp.float32)
    ms = load_model(sparse_p, prefer_quant=False, dense_dtype=jnp.float32)
    assert ms.cfg.extra["dsa"] and ms.cfg.extra["indexer_top_k"] == 64

    cd = Context(md, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    cs = Context(ms, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    ld = cd.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                   np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    ls = cs.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                   np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    np.testing.assert_allclose(ls, ld, rtol=2e-4, atol=2e-4)

    # small top_k: sparse differs from dense but decode==prefill
    tight = str(tmp_path / "ds32b.gguf")
    make_tiny_deepseek32_gguf(tight, seed=13, top_k=2)
    mt = load_model(tight, prefer_quant=False, dense_dtype=jnp.float32)
    ct = Context(mt, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    lt = ct.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                   np.arange(len(tokens))[None, :], np.arange(len(tokens)))
    assert np.abs(lt - ld).max() > 1e-3  # sparsity actually bites

    ct2 = Context(mt, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    outs = []
    for i, t in enumerate(tokens):
        outs.append(ct2.decode(np.asarray([[t]]), np.asarray([0]),
                               np.asarray([[i]]), np.asarray([0]))[0])
        ct2.seq_len[0] = i + 1
    np.testing.assert_allclose(np.stack(outs), lt, rtol=2e-4, atol=2e-4)
