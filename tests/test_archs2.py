"""Round-2 architecture tranche: structural smoke tests (no HF oracle
available offline for these archs — reference classes are trust_remote_code).
Each test writes a tiny GGUF with the arch's exact tensor inventory
(mirroring the reference's load_arch_tensors) and checks the model loads,
decodes greedily, and produces finite logits."""

import numpy as np
import pytest

from llama_cpp_tpu.gguf.constants import GGMLType, Keys
from llama_cpp_tpu.gguf.writer import GGUFWriter
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.testing import tiny_spm_vocab

V, L, E, H, HKV, FF = 96, 2, 64, 4, 2, 96
HD = E // H


def _writer(arch, extra_md=None, n_rot=HD, n_ff=FF):
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, f"tiny-{arch}")
    P = arch + "."
    w.add(P + "block_count", np.uint32(L))
    w.add(P + "context_length", np.uint32(256))
    w.add(P + "embedding_length", np.uint32(E))
    w.add(P + "feed_forward_length", np.uint32(n_ff))
    w.add(P + "attention.head_count", np.uint32(H))
    w.add(P + "attention.head_count_kv", np.uint32(HKV))
    w.add(P + "attention.layer_norm_rms_epsilon", 1e-5)
    w.add(P + "attention.layer_norm_epsilon", 1e-5)
    w.add(P + "rope.freq_base", 10000.0)
    w.add(P + "rope.dimension_count", np.uint32(n_rot))
    w.add(P + "vocab_size", np.uint32(V))
    for k, v in (extra_md or {}).items():
        w.add(P + k if not k.startswith("!") else k[1:], v)
    vocab = tiny_spm_vocab(V)
    for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES,
              Keys.Tokenizer.TOKEN_TYPE):
        vocab[k] = vocab[k][:V]
    w.add_all(vocab)
    return w


_rng = np.random.default_rng(0)


def emit(w, name, *shape, scale=None, ones=False):
    if ones:
        arr = np.ones(shape, np.float32)
    else:
        s = scale or (1.0 / np.sqrt(shape[-1]))
        arr = (_rng.standard_normal(shape) * s).astype(np.float32)
    w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                 GGMLType.F32)


def _run(path, n_new=4):
    model = load_model(path, prefer_quant=False)
    ctx = Context(model, n_ctx=64, n_seqs=1)
    out = ctx.generate([3, 5, 9, 2, 7], max_new_tokens=n_new)
    assert len(out) >= 1 and all(0 <= t < V for t in out)
    return out


def _common(w, tie=False):
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    if not tie:
        emit(w, "output.weight", V, E)


def test_qwen_v1(tmp_path):
    w = _writer("qwen")
    _common(w)
    qkv = H * HD + 2 * (HKV * HD)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_qkv.weight", qkv, E)
        emit(w, b + "attn_qkv.bias", qkv, scale=0.05)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_chatglm_fused_swiglu(tmp_path):
    w = _writer("chatglm", n_rot=HD // 2)
    _common(w)
    qkv = H * HD + 2 * (HKV * HD)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_qkv.weight", qkv, E)
        emit(w, b + "attn_qkv.bias", qkv, scale=0.05)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_up.weight", 2 * FF, E)  # fused gate|up
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_codeshell(tmp_path):
    w = _writer("codeshell")
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output_norm.bias", E, scale=0.01)
    emit(w, "output.weight", V, E)
    qkv = H * HD + 2 * (HKV * HD)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_norm.bias", E, scale=0.01)
        emit(w, b + "attn_qkv.weight", qkv, E)
        emit(w, b + "attn_qkv.bias", qkv, scale=0.05)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "attn_output.bias", E, scale=0.05)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.bias", E, scale=0.01)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_up.bias", FF, scale=0.05)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_down.bias", E, scale=0.05)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_refact_alibi(tmp_path):
    w = _writer("refact")
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    from llama_cpp_tpu.models.loader import load_model as _lm

    m = _lm(p, prefer_quant=False)
    assert m.cfg.alibi_bias == 8.0
    from llama_cpp_tpu.ops.rope import ROPE_TYPE_NONE

    assert m.cfg.rope_type == ROPE_TYPE_NONE
    _run(p)


def test_plamo_parallel_residual(tmp_path):
    w = _writer("plamo")
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def _emit_moe(w, b, n_exp, ff_exp, shexp=0):
    emit(w, b + "ffn_gate_inp.weight", n_exp, E)
    emit(w, b + "ffn_gate_exps.weight", n_exp, ff_exp, E)
    emit(w, b + "ffn_up_exps.weight", n_exp, ff_exp, E)
    emit(w, b + "ffn_down_exps.weight", n_exp, E, ff_exp)
    if shexp:
        emit(w, b + "ffn_gate_shexp.weight", ff_exp * shexp, E)
        emit(w, b + "ffn_up_shexp.weight", ff_exp * shexp, E)
        emit(w, b + "ffn_down_shexp.weight", E, ff_exp * shexp)


def test_grok_moe(tmp_path):
    w = _writer("grok", extra_md={"expert_count": np.uint32(4),
                                  "expert_used_count": np.uint32(2)})
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "attn_out_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_post_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
        # grok-1 may carry a dense FFN summed with the MoE
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    m = load_model(p, prefer_quant=False)
    assert m.cfg.attn_logit_softcap == 30.0
    assert abs(m.cfg.embd_scale - 78.38367176906169) < 1e-6
    _run(p)


def test_arctic_dense_plus_moe(tmp_path):
    w = _writer("arctic", extra_md={"expert_count": np.uint32(4),
                                    "expert_used_count": np.uint32(2)})
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm_exps.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", E, E)  # arctic dense FFN is n_embd wide
        emit(w, b + "ffn_up.weight", E, E)
        emit(w, b + "ffn_down.weight", E, E)
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_bitnet_scales_and_subnorms(tmp_path):
    w = _writer("bitnet")
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_sub_norm.weight", E, ones=True)
        for nm, rows, cols in (("attn_q", H * HD, E), ("attn_k", HKV * HD, E),
                               ("attn_v", HKV * HD, E), ("attn_output", E, E),
                               ("ffn_gate", FF, E), ("ffn_up", FF, E),
                               ("ffn_down", E, FF)):
            emit(w, b + nm + ".weight", rows, cols)
            w.add_tensor(b + nm + ".scale",
                         np.asarray([0.5], np.float32).tobytes(), (1,),
                         GGMLType.F32)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_sub_norm.weight", FF, ones=True)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    m = load_model(p, prefer_quant=False)
    # scalar scales folded into the dense weights at load (q/k/v may have
    # been fused into one projection afterwards)
    lw0 = m.params["layers"][0]
    q0 = np.asarray(lw0.get("attn_q", lw0.get("attn_qkv")))
    assert np.isfinite(q0).all()
    assert "attn_sub_norm" in lw0 and "ffn_sub_norm" in lw0
    _run(p)


def test_minicpm3_mla(tmp_path):
    n_rot, nope, dv, kvr, qr = 8, 8, 16, 16, 24
    hd_k = n_rot + nope
    w = _writer("minicpm3", n_rot=n_rot, extra_md={
        "attention.kv_lora_rank": np.uint32(kvr),
        "attention.q_lora_rank": np.uint32(qr),
        "attention.key_length": np.uint32(hd_k),
        "attention.value_length": np.uint32(dv),
    })
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q_a.weight", qr, E)
        emit(w, b + "attn_q_a_norm.weight", qr, ones=True)
        emit(w, b + "attn_q_b.weight", H * hd_k, qr)
        emit(w, b + "attn_kv_a_mqa.weight", kvr + n_rot, E)
        emit(w, b + "attn_kv_a_norm.weight", kvr, ones=True)
        emit(w, b + "attn_kv_b.weight", H * (nope + dv), kvr)
        emit(w, b + "attn_output.weight", E, H * dv)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    m = load_model(p, prefer_quant=False)
    assert m.cfg.extra["kv_lora_rank"] == kvr
    _run(p)


def test_bailingmoe_shared_expert(tmp_path):
    w = _writer("bailingmoe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_shared_count": np.uint32(1),
        "expert_weights_scale": np.float32(1.0),
    })
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF, shexp=1)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_smallthinker_raw_router(tmp_path):
    w = _writer("smallthinker", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2)})
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    m = load_model(p, prefer_quant=False)
    assert m.cfg.extra.get("router_raw_input")
    assert m.cfg.act == "relu"
    _run(p)


@pytest.mark.parametrize("arch", ["mistral3", "maincoder", "llama-embed"])
def test_llama_like_variants(tmp_path, arch):
    w = _writer(arch)
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def _std_attn(w, b, qk_norm=False, qk_full=False):
    emit(w, b + "attn_norm.weight", E, ones=True)
    emit(w, b + "attn_q.weight", H * HD, E)
    emit(w, b + "attn_k.weight", HKV * HD, E)
    emit(w, b + "attn_v.weight", HKV * HD, E)
    emit(w, b + "attn_output.weight", E, H * HD)
    if qk_norm:
        emit(w, b + "attn_q_norm.weight", H * HD if qk_full else HD, ones=True)
        emit(w, b + "attn_k_norm.weight", HKV * HD if qk_full else HD, ones=True)


def test_minimax_m2(tmp_path):
    w = _writer("minimax-m2", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_gating_func": np.uint32(2)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True, qk_full=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
        emit(w, b + "exp_probs_b.bias", 4, scale=0.1)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_hunyuan_moe(tmp_path):
    w = _writer("hunyuan-moe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF, shexp=1)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_exaone_moe_swa(tmp_path):
    w = _writer("exaone-moe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_shared_count": np.uint32(1),
        "attention.sliding_window": np.uint32(16),
        "attention.sliding_window_pattern": np.uint32(2)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF, shexp=1)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_cohere2moe(tmp_path):
    w = _writer("cohere2moe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "logit_scale": np.float32(0.8),
        "attention.sliding_window": np.uint32(16),
        "attention.sliding_window_pattern": np.uint32(2)})
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b)
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


@pytest.mark.parametrize("arch", ["mellum", "llada-moe", "rnd1"])
def test_moe_qknorm_variants(tmp_path, arch):
    w = _writer(arch, extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_pangu_embedded(tmp_path):
    w = _writer("pangu-embedded")
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_minimax_m3_msa(tmp_path):
    """MSA block-sparse attention (reference minimax-m3 + llama-kv-cache-
    msa): with top_k >= n_blocks every block is selected, so sparse output
    must equal the dense twin exactly; with top_k=1 it must differ."""
    import jax.numpy as jnp

    n_rot = HD // 2

    def build(path, topk):
        w = _writer("minimax-m3", n_rot=n_rot, extra_md={
            "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
            "attention.indexer.head_count": np.uint32(HKV),
            "attention.indexer.key_length": np.uint32(16),
            "attention.indexer.top_k": np.uint32(topk),
            "attention.indexer.block_size": np.uint32(8),
            "attention.indexer.local_blocks": np.uint32(1),
        })
        _common(w)
        global _rng
        _rng = np.random.default_rng(3)  # identical weights per build
        for i in range(L):
            b = f"blk.{i}."
            _std_attn(w, b, qk_norm=True)
            emit(w, b + "indexer.q_proj.weight", HKV * 16, E)
            emit(w, b + "indexer.k_proj.weight", 16, E)
            emit(w, b + "indexer.q_norm.weight", 16, ones=True)
            emit(w, b + "indexer.k_norm.weight", 16, ones=True)
            emit(w, b + "ffn_norm.weight", E, ones=True)
            _emit_moe(w, b, 4, FF)
        w.write(path)

    p_all = str(tmp_path / "all.gguf")
    build(p_all, topk=64)  # >= n_blocks -> dense-equivalent
    p_sparse = str(tmp_path / "sparse.gguf")
    build(p_sparse, topk=1)

    m_all = load_model(p_all, prefer_quant=False)
    assert m_all.cfg.extra["msa"]
    prompt = [3, 5, 9, 2, 7, 11, 13, 17] * 5  # 40 tokens, 5 blocks of 8
    ctx = Context(m_all, n_ctx=64, n_seqs=1)
    out_all = ctx.generate(prompt, max_new_tokens=4)

    # dense twin: same weights, MSA disabled
    m_dense = load_model(p_all, prefer_quant=False)
    m_dense.cfg.extra.pop("msa")
    ctx_d = Context(m_dense, n_ctx=64, n_seqs=1)
    out_dense = ctx_d.generate(prompt, max_new_tokens=4)
    assert out_all == out_dense, (out_all, out_dense)

    # top-1 sparse: a valid decode that (generically) diverges from dense
    m_sp = load_model(p_sparse, prefer_quant=False)
    ctx_s = Context(m_sp, n_ctx=64, n_seqs=1)
    out_sparse = ctx_s.generate(prompt, max_new_tokens=4)
    assert all(0 <= t < V for t in out_sparse)


def test_neo_bert_and_eurobert(tmp_path):
    """Pre-norm RMS encoders (reference neo-bert.cpp / eurobert.cpp)."""
    from llama_cpp_tpu.models.loader import load_model as _lm

    for arch, fused in (("neo-bert", True), ("eurobert", False)):
        w = _writer(arch)
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "enc.output_norm.weight", E, ones=True)
        for i in range(L):
            b = f"blk.{i}."
            emit(w, b + "attn_norm.weight", E, ones=True)
            emit(w, b + "attn_qkv.weight", H * HD + 2 * HKV * HD, E)
            emit(w, b + "attn_output.weight", E, H * HD)
            emit(w, b + "ffn_norm.weight", E, ones=True)
            if fused:
                emit(w, b + "ffn_up.weight", 2 * FF, E)
            else:
                emit(w, b + "ffn_gate.weight", FF, E)
                emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_down.weight", E, FF)
        p = str(tmp_path / f"{arch}.gguf")
        w.write(p)
        m = _lm(p, prefer_quant=False)
        from llama_cpp_tpu.runtime.context import Context as _C

        emb = _C(m, n_ctx=64, n_seqs=1).embed([3, 5, 9, 2], pooling="mean")
        assert emb.shape == (E,) and np.isfinite(emb).all()


def test_nomic_bert_moe(tmp_path):
    w = _writer("nomic-bert-moe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "moe_every_n_layers": np.uint32(2)})
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "token_embd_norm.weight", E, ones=True)
    emit(w, "token_embd_norm.bias", E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_qkv.weight", H * HD + 2 * HKV * HD, E)
        emit(w, b + "attn_qkv.bias", H * HD + 2 * HKV * HD)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "attn_output.bias", E)
        emit(w, b + "attn_output_norm.weight", E, ones=True)
        emit(w, b + "attn_output_norm.bias", E)
        if i % 2 == 1:  # MoE layer (gate-less gelu experts)
            emit(w, b + "ffn_gate_inp.weight", 4, E)
            emit(w, b + "ffn_up_exps.weight", 4, FF, E)
            emit(w, b + "ffn_down_exps.weight", 4, E, FF)
        else:
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_up.bias", FF)
            emit(w, b + "ffn_down.weight", E, FF)
            emit(w, b + "ffn_down.bias", E)
        emit(w, b + "layer_output_norm.weight", E, ones=True)
        emit(w, b + "layer_output_norm.bias", E)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    from llama_cpp_tpu.models.loader import load_model as _lm
    from llama_cpp_tpu.runtime.context import Context as _C

    m = _lm(p, prefer_quant=False)
    emb = _C(m, n_ctx=64, n_seqs=1).embed([3, 5, 9, 2], pooling="mean")
    assert emb.shape == (E,) and np.isfinite(emb).all()


@pytest.mark.parametrize("arch,qk", [("bailingmoe2", True), ("step35", False),
                                     ("mimo2", True)])
def test_swa_moe_variants(tmp_path, arch, qk):
    w = _writer(arch, extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "attention.sliding_window": np.uint32(16),
        "attention.sliding_window_pattern": np.uint32(2)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=qk)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_grovemoe_chunk_experts(tmp_path):
    w = _writer("grovemoe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "experts_per_group": np.uint32(2),
        "expert_group_scale": np.float32(0.05)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
        emit(w, b + "ffn_gate_chexps.weight", 2, FF // 2, E)
        emit(w, b + "ffn_up_chexps.weight", 2, FF // 2, E)
        emit(w, b + "ffn_down_chexps.weight", 2, E, FF // 2)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_gemma_embedding(tmp_path):
    w = _writer("gemma-embedding", extra_md={
        "attention.sliding_window": np.uint32(16),
        "attention.sliding_window_pattern": np.uint32(2)})
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "attn_post_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_post_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    from llama_cpp_tpu.models.loader import load_model as _lm
    from llama_cpp_tpu.runtime.context import Context as _C

    m = _lm(p, prefer_quant=False)
    assert m.cfg.extra.get("non_causal")
    emb = _C(m, n_ctx=64, n_seqs=1).embed([3, 5, 9, 2, 8, 1], pooling="mean")
    assert emb.shape == (E,) and np.isfinite(emb).all()


def test_jina_bert_v3(tmp_path):
    w = _writer("jina-bert-v3")
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "token_embd_norm.weight", E, ones=True)
    emit(w, "token_embd_norm.bias", E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_qkv.weight", H * HD + 2 * HKV * HD, E)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "attn_out_norm.weight", E, ones=True)
        emit(w, b + "attn_out_norm.bias", E)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "layer_output_norm.weight", E, ones=True)
        emit(w, b + "layer_output_norm.bias", E)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    from llama_cpp_tpu.models.loader import load_model as _lm
    from llama_cpp_tpu.runtime.context import Context as _C

    m = _lm(p, prefer_quant=False)
    emb = _C(m, n_ctx=64, n_seqs=1).embed([3, 5, 9, 2], pooling="mean")
    assert emb.shape == (E,) and np.isfinite(emb).all()


def test_afmoe_gated_attention(tmp_path):
    w = _writer("afmoe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_gating_func": np.uint32(2)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "attn_gate.weight", H * HD, E)
        emit(w, b + "attn_post_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_post_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
        emit(w, b + "exp_probs_b.bias", 4, scale=0.1)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_plamo2_hybrid(tmp_path):
    """PLaMo-2 hybrid: interleaved mamba/attention layers, fused SWIGLU FFN,
    post-norms; decode == prefill consistency for the recurrent state."""
    a = "plamo2"
    d_state, d_inner, n_heads, d_conv = 8, 64, 4, 4
    dt_dim = 16
    w = _writer(a, extra_md={
        "ssm.conv_kernel": np.uint32(d_conv),
        "ssm.inner_size": np.uint32(d_inner),
        "ssm.state_size": np.uint32(d_state),
        "ssm.time_step_rank": np.uint32(n_heads),
        "ssm.group_count": np.uint32(0),
    })
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_post_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_post_norm.weight", E, ones=True)
        emit(w, b + "ffn_up.weight", 2 * FF, E)  # fused gate|up
        emit(w, b + "ffn_down.weight", E, FF)
        if i % 2 == 0:  # mamba layer
            emit(w, b + "ssm_in.weight", 2 * d_inner, E)
            emit(w, b + "ssm_conv1d.weight", d_inner, d_conv)
            emit(w, b + "ssm_x.weight", 2 * d_state + dt_dim, d_inner)
            emit(w, b + "ssm_dt.weight", n_heads, dt_dim)
            emit(w, b + "ssm_dt.bias", n_heads)
            emit(w, b + "ssm_a", n_heads)
            emit(w, b + "ssm_d", n_heads, ones=True)
            emit(w, b + "ssm_out.weight", E, d_inner)
            emit(w, b + "ssm_dt_norm.weight", dt_dim, ones=True)
            emit(w, b + "ssm_b_norm.weight", d_state, ones=True)
            emit(w, b + "ssm_c_norm.weight", d_state, ones=True)
        else:  # attention layer
            emit(w, b + "attn_qkv.weight", H * HD + 2 * HKV * HD, E)
            emit(w, b + "attn_q_norm.weight", H, HD, ones=True)
            emit(w, b + "attn_k_norm.weight", HKV, HD, ones=True)
            emit(w, b + "attn_output.weight", E, H * HD)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    from llama_cpp_tpu.models.loader import load_model as _lm

    m = _lm(p, prefer_quant=False)
    assert m.cfg.extra.get("plamo2")
    out = _run(p, n_new=6)
    # decode==prefill: feeding the whole sequence at once must match
    ctx = Context(_lm(p, prefer_quant=False), n_ctx=64, n_seqs=1)
    pre = [3, 5, 9, 2, 7] + out[:-1]
    import numpy as _np

    logits = ctx.prefill(pre)
    assert int(_np.argmax(logits)) == out[-1]


def test_plamo3(tmp_path):
    w = _writer("plamo3", extra_md={
        "attention.sliding_window": np.uint32(16),
        "attention.sliding_window_pattern": np.uint32(2)})
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_qkv.weight", H * HD + 2 * HKV * HD, E)
        emit(w, b + "attn_q_norm.weight", HD, ones=True)
        emit(w, b + "attn_k_norm.weight", HD, ones=True)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "attn_post_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_post_norm.weight", E, ones=True)
        emit(w, b + "ffn_up.weight", 2 * FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_talkie_embd_skip(tmp_path):
    w = _writer("talkie", extra_md={"logit_scale": np.float32(0.5)})
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_qkv.weight", H * HD + 2 * HKV * HD, E)
        emit(w, b + "attn_q_norm.weight", H, 1, ones=True)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
        w.add_tensor(b + "layer_output_scale.weight",
                     np.asarray([0.1], np.float32).tobytes(), (1,),
                     GGMLType.F32)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    m = load_model(p, prefer_quant=False)
    assert m.cfg.extra.get("embd_skip")
    _run(p)
