"""Numeric promotion of the round-2 arch tranche (VERDICT r2 item 6): each
arch's tiny GGUF is run through BOTH the product forward (Context.decode,
all positions) and an independently transcribed f64 numpy oracle
(tests/np_oracle.py, semantics from the reference C++ graphs cited per
test), asserting logits parity. A wrong norm order, rope mode, router or
scale fails these; the old structural tests only proved finite logits.

Fixture shapes/emission mirror tests/test_archs2.py; metadata keys the
reference loader REQUIRES (gating funcs etc.) are set explicitly here."""

import numpy as np
import pytest

import np_oracle as orc
from np_oracle import (attention, dense_forward, ffn, load_f64, moe, qkv,
                       rms_norm, rope, silu, softmax)
from test_archs2 import (E, FF, H, HD, HKV, L, V, _common, _emit_moe,
                         _std_attn, _writer, emit)

from llama_cpp_tpu.gguf.constants import GGMLType
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context

TOKENS = list(np.random.default_rng(11).integers(3, V - 1, 24))


def ours_logits(path, tokens=None):
    import jax.numpy as jnp

    tokens = tokens or TOKENS
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(m, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    T = len(tokens)
    out = ctx.decode(
        np.asarray([tokens], np.int32), np.zeros(1, np.int32),
        np.arange(T, dtype=np.int32)[None, :], np.arange(T, dtype=np.int32))
    return np.asarray(out, np.float64)


def check(path, want, rtol=4e-4, atol=4e-4):
    got = ours_logits(path)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


# --------------------------------------------------------------------------
# generic-spec archs
# --------------------------------------------------------------------------


def _dense_layers(w, fused=False, bias=False, norm_bias=False, qk=None,
                  wo_in=None):
    qkv_n = H * HD + 2 * (HKV * HD)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        if norm_bias:
            emit(w, b + "attn_norm.bias", E, scale=0.01)
        if fused:
            emit(w, b + "attn_qkv.weight", qkv_n, E)
            if bias:
                emit(w, b + "attn_qkv.bias", qkv_n, scale=0.05)
        else:
            emit(w, b + "attn_q.weight", H * HD, E)
            emit(w, b + "attn_k.weight", HKV * HD, E)
            emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_output.weight", E, wo_in or E)
        if bias and norm_bias:
            emit(w, b + "attn_output.bias", E, scale=0.05)
        if qk == "head":
            emit(w, b + "attn_q_norm.weight", HD, ones=True)
            emit(w, b + "attn_k_norm.weight", HD, ones=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        if norm_bias:
            emit(w, b + "ffn_norm.bias", E, scale=0.01)
        yield i, b


def test_qwen_numeric(tmp_path):
    # reference src/models/qwen.cpp: fused qkv+bias, NEOX rope, swiglu
    w = _writer("qwen")
    _common(w)
    for i, b in _dense_layers(w, fused=True, bias=True):
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    check(p, dense_forward(md, ws, TOKENS, {"rope": "neox"}))


def test_chatglm_numeric(tmp_path):
    # src/models/chatglm.cpp: NORM rope on n_rot=HD/2, fused swiglu (SEQ)
    w = _writer("chatglm", n_rot=HD // 2)
    _common(w)
    for i, b in _dense_layers(w, fused=True, bias=True):
        emit(w, b + "ffn_up.weight", 2 * FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    check(p, dense_forward(md, ws, TOKENS,
                           {"rope": "norm", "n_rot": HD // 2,
                            "ffn_fused": True}))


def test_codeshell_numeric(tmp_path):
    # src/models/codeshell.cpp: LN+bias norms, fused qkv, gelu FFN, biases
    w = _writer("codeshell")
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output_norm.bias", E, scale=0.01)
    emit(w, "output.weight", V, E)
    for i, b in _dense_layers(w, fused=True, bias=True, norm_bias=True):
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_up.bias", FF, scale=0.05)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_down.bias", E, scale=0.05)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    check(p, dense_forward(md, ws, TOKENS,
                           {"norm": "ln", "rope": "neox", "ffn_act": "gelu",
                            "ffn_bias": True}))


def test_refact_numeric(tmp_path):
    # src/models/refact.cpp: no rope, ALiBi (f_max_alibi_bias=8), swiglu
    w = _writer("refact")
    _common(w, tie=True)
    for i, b in _dense_layers(w):
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    check(p, dense_forward(md, ws, TOKENS, {"rope": "none", "alibi": 8.0}))


@pytest.mark.parametrize("arch", ["mistral3", "maincoder", "llama-embed"])
def test_llama_like_numeric(tmp_path, arch):
    # src/models/{mistral3,maincoder,llama-embed}.cpp == llama.cpp graph:
    # NORM rope, separate q/k/v, swiglu
    w = _writer(arch)
    _common(w)
    for i, b in _dense_layers(w):
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    check(p, dense_forward(md, ws, TOKENS, {"rope": "norm"}))


def test_pangu_embedded_numeric(tmp_path):
    # src/models/pangu-embed.cpp: llama-shaped with NEOX rope
    w = _writer("pangu-embedded")
    _common(w)
    for i, b in _dense_layers(w):
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    check(p, dense_forward(md, ws, TOKENS, {"rope": "neox"}))


def test_smallthinker_numeric(tmp_path):
    # src/models/smallthinker.cpp: router fed the PRE-NORM layer input,
    # RELU experts, no swa keys -> all-rope
    w = _writer("smallthinker", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_gating_func": np.uint32(1)})
    _common(w, tie=True)
    for i, b in _dense_layers(w):
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    spec = {"rope": "neox",
            "moe": {"n_exp": 4, "n_used": 2, "act": "relu",
                    "gating": "softmax", "norm_w": True, "raw_router": True}}
    check(p, dense_forward(md, ws, TOKENS, spec))


def test_minimax_m2_numeric(tmp_path):
    # src/models/minimax-m2.cpp: q/k RMS over the FULL projected vector
    # pre-reshape, sigmoid gating + exp_probs_b selection bias, norm_w
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
    md, ws = load_f64(p)
    spec = {"rope": "neox", "qk_norm": "full",
            "moe": {"n_exp": 4, "n_used": 2, "gating": "sigmoid",
                    "norm_w": True}}
    check(p, dense_forward(md, ws, TOKENS, spec))


def test_hunyuan_moe_numeric(tmp_path):
    # src/models/hunyuan-moe.cpp: per-head q/k norm AFTER rope, shared
    # expert + softmax norm_w MoE
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
    md, ws = load_f64(p)
    spec = {"rope": "neox", "qk_norm": "head_after_rope",
            "moe": {"n_exp": 4, "n_used": 2, "gating": "softmax",
                    "norm_w": True}}
    check(p, dense_forward(md, ws, TOKENS, spec))


def test_mellum_numeric(tmp_path):
    # src/models/mellum.cpp: per-head q/k norm before rope, softmax MoE
    w = _writer("mellum", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    spec = {"rope": "neox", "qk_norm": "head",
            "moe": {"n_exp": 4, "n_used": 2, "gating": "softmax",
                    "norm_w": True}}
    check(p, dense_forward(md, ws, TOKENS, spec))


def test_exaone_moe_numeric(tmp_path):
    # src/models/exaone-moe.cpp: per-head q/k norm BEFORE rope; iSWA with
    # set_swa_pattern(2) (layer0 local, layer1 global); rope ONLY on local
    # layers; sigmoid gating (key required by the reference loader)
    w = _writer("exaone-moe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_shared_count": np.uint32(1),
        "expert_feed_forward_length": np.uint32(FF),
        "expert_gating_func": np.uint32(2),
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
    md, ws = load_f64(p)
    is_swa = [il % 2 < 1 for il in range(L)]
    spec = {"rope": "neox", "qk_norm": "head", "swa": 16, "is_swa": is_swa,
            "use_rope": is_swa,
            "moe": {"n_exp": 4, "n_used": 2, "gating": "sigmoid",
                    "norm_w": False}}
    check(p, dense_forward(md, ws, TOKENS, spec))


@pytest.mark.parametrize("arch,qk,gating,normw", [
    ("bailingmoe2", True, "sigmoid", False),
    ("step35", False, "sigmoid", False),
    ("mimo2", True, "sigmoid", True),
])
def test_swa_moe_numeric(tmp_path, arch, qk, gating, normw):
    # src/models/{bailingmoe2,step35,mimo2}.cpp. bailingmoe2 requires the
    # gating key; step35 defaults to sigmoid; mimo2 hard-codes SIGMOID with
    # norm_w=true. step35/mimo2 read the window pattern as a PER-LAYER array
    # (scalar key broadcasts -> every layer SWA, llama-model-loader
    # get_key_or_arr); bailingmoe2 has no swa at all.
    md_extra = {"expert_count": np.uint32(4),
                "expert_used_count": np.uint32(2)}
    if arch != "mimo2":
        md_extra["expert_gating_func"] = np.uint32(2)
    if arch != "bailingmoe2":
        md_extra["attention.sliding_window"] = np.uint32(16)
        md_extra["attention.sliding_window_pattern"] = np.uint32(2)
    w = _writer(arch, extra_md=md_extra)
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=qk)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    is_swa = ([True] * L if arch in ("step35", "mimo2") else [False] * L)
    spec = {"rope": "neox", "qk_norm": "head" if qk else None,
            "swa": 16 if arch != "bailingmoe2" else 0, "is_swa": is_swa,
            "moe": {"n_exp": 4, "n_used": 2, "gating": gating,
                    "norm_w": normw}}
    check(p, dense_forward(md, ws, TOKENS, spec))


def test_plamo3_numeric(tmp_path):
    # src/models/plamo3.cpp: fused qkv split, per-head qk norm before rope,
    # attn/ffn post-norms, fused SWIGLU, swa pattern 2 (layer0 local)
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
    md, ws = load_f64(p)
    spec = {"rope": "neox", "qk_norm": "head", "post_norms": True,
            "ffn_fused": True, "swa": 16,
            "is_swa": [il % 2 < 1 for il in range(L)]}
    check(p, dense_forward(md, ws, TOKENS, spec))


def test_bailingmoe_numeric(tmp_path):
    # src/models/bailingmoe.cpp: NORM rope, kq_scale = 1/sqrt(n_rot),
    # softmax gating with expert_weights_norm (unset -> false), shared exp
    w = _writer("bailingmoe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_shared_count": np.uint32(1),
        "expert_weights_scale": np.float32(1.0)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        _emit_moe(w, b, 4, FF, shexp=1)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    spec = {"rope": "norm", "attn_scale": HD ** -0.5,
            "moe": {"n_exp": 4, "n_used": 2, "gating": "softmax",
                    "norm_w": False, "w_scale": 1.0}}
    check(p, dense_forward(md, ws, TOKENS, spec))


# --------------------------------------------------------------------------
# custom-graph archs
# --------------------------------------------------------------------------


def test_plamo_numeric(tmp_path):
    # src/models/plamo.cpp: parallel residual — ffn consumes the SAME
    # attn_norm output; out = ffn(sa_inp) + sa_out + inpL; NEOX full-head
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
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    x = ws["token_embd.weight"][TOKENS]
    for il in range(L):
        b = f"blk.{il}."
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        sa = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV)
        sa = sa @ ws[b + "attn_output.weight"].T
        f = ffn(h, ws, b)
        x = f + sa + x
    x = rms_norm(x, ws["output_norm.weight"])
    want = x @ ws["output.weight"].T
    check(p, want)


def test_grok_numeric(tmp_path):
    # src/models/grok.cpp: embd scale 78.38…, kq tanh cap with
    # attn_out_scale (llama-graph.cpp:2574-2583, kq_scale=1),
    # attn_out_norm before residual, GELU softmax MoE (norm_w) + optional
    # dense GELU-PAR branch scaled sqrt(2)/2, ffn_post_norm, logit scale
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
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    x = ws["token_embd.weight"][TOKENS] * 78.38367176906169
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        att = attention(q, k, v, scale=1.0, n_head_kv=HKV,
                        grok_cap=(0.08838834764831845, 30.0))
        att = att @ ws[b + "attn_output.weight"].T
        att = rms_norm(att, ws[b + "attn_out_norm.weight"])
        ffn_inp = res + att
        h = rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        moe_out = moe(h, ws, b, 4, 2, act="gelu", gating="softmax",
                      norm_w=True)
        dense = ffn(h, ws, b, act="gelu")
        out = (dense + moe_out) * (np.sqrt(2.0) / 2.0)
        out = rms_norm(out, ws[b + "ffn_post_norm.weight"])
        x = ffn_inp + out
    x = rms_norm(x, ws["output_norm.weight"])
    want = (x @ ws["token_embd.weight"].T) * 0.5773502691896257
    check(p, want)


def test_arctic_numeric(tmp_path):
    # src/models/arctic.cpp: dense FFN (n_embd-wide) on ffn_norm residual
    # stream; parallel MoE branch normed from the PRE-ATTENTION input with
    # ffn_norm_exps; out = moe + (dense + ffn_inp)
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
        emit(w, b + "ffn_gate.weight", E, E)
        emit(w, b + "ffn_up.weight", E, E)
        emit(w, b + "ffn_down.weight", E, E)
        _emit_moe(w, b, 4, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    x = ws["token_embd.weight"][TOKENS]
    for il in range(L):
        b = f"blk.{il}."
        inp_sa = x
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        q = rope(q, pos, HD, "norm")
        k = rope(k, pos, HD, "norm")
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV)
        att = att @ ws[b + "attn_output.weight"].T
        ffn_inp = inp_sa + att
        h = rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        dense = ffn(h, ws, b)
        ffn_out = dense + ffn_inp
        h2 = rms_norm(inp_sa, ws[b + "ffn_norm_exps.weight"])
        moe_out = moe(h2, ws, b, 4, 2, gating="softmax", norm_w=True)
        x = moe_out + ffn_out
    x = rms_norm(x, ws["output_norm.weight"])
    want = x @ ws["token_embd.weight"].T
    check(p, want)


def test_bitnet_numeric(tmp_path):
    # src/models/bitnet.cpp: per-tensor scalar scales applied after each
    # projection; attn_sub_norm between attention and wo; ffn_sub_norm
    # between activation and ffn_down; head tied to tok_embd
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
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    s = lambda b, nm: float(ws[b + nm + ".scale"][0])  # noqa: E731
    x = ws["token_embd.weight"][TOKENS]
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        q = (h @ ws[b + "attn_q.weight"].T * s(b, "attn_q")).reshape(T, H, HD)
        k = (h @ ws[b + "attn_k.weight"].T * s(b, "attn_k")).reshape(T, HKV, HD)
        v = (h @ ws[b + "attn_v.weight"].T * s(b, "attn_v")).reshape(T, HKV, HD)
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV)
        att = rms_norm(att, ws[b + "attn_sub_norm.weight"])
        att = att @ ws[b + "attn_output.weight"].T * s(b, "attn_output")
        ffn_inp = res + att
        h = rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        up = h @ ws[b + "ffn_up.weight"].T * s(b, "ffn_up")
        g = h @ ws[b + "ffn_gate.weight"].T * s(b, "ffn_gate")
        act = silu(g) * up
        act = rms_norm(act, ws[b + "ffn_sub_norm.weight"])
        out = act @ ws[b + "ffn_down.weight"].T * s(b, "ffn_down")
        x = ffn_inp + out
    x = rms_norm(x, ws["output_norm.weight"])
    want = x @ ws["token_embd.weight"].T
    check(p, want)


def test_cohere2moe_numeric(tmp_path):
    # src/models/cohere2moe.cpp: single attn_norm feeds BOTH attention and
    # ffn (parallel residual: out = ffn + inpL + attn_out); dense-first swa
    # pattern (layer0 global NO rope, layer1 local roped); sigmoid gating
    # default; logit_scale on the head
    w = _writer("cohere2moe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_feed_forward_length": np.uint32(FF),
        "leading_dense_block_count": np.uint32(0),
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
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    x = ws["token_embd.weight"][TOKENS]
    for il in range(L):
        b = f"blk.{il}."
        is_swa = il % 2 != 0  # set_swa_pattern(2, dense_first=true)
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        if is_swa:  # force_rope only below dense_lead (=0)
            q = rope(q, pos, HD, "norm")
            k = rope(k, pos, HD, "norm")
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV,
                        window=16 if is_swa else 0)
        att = att @ ws[b + "attn_output.weight"].T
        moe_out = moe(h, ws, b, 4, 2, gating="sigmoid", norm_w=False)
        x = moe_out + x + att
    x = rms_norm(x, ws["output_norm.weight"])
    want = (x @ ws["token_embd.weight"].T) * 0.8
    check(p, want)


def test_grovemoe_numeric(tmp_path):
    # src/models/grovemoe.cpp + llama-graph.cpp:1999,2036-2043: selection on
    # sigmoid(logits), weights from softmax(logits); chunk experts indexed
    # by id/n_group_experts reusing the SAME router logits, scaled by
    # expert_group_scale
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
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    x = ws["token_embd.weight"][TOKENS]
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        q = rms_norm(q, ws[b + "attn_q_norm.weight"])
        k = rms_norm(k, ws[b + "attn_k_norm.weight"])
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV)
        att = att @ ws[b + "attn_output.weight"].T
        ffn_inp = res + att
        h = rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        logits = h @ ws[b + "ffn_gate_inp.weight"].T
        main = moe(h, ws, b, 4, 2, gating="softmax", norm_w=True,
                   probs_in=logits, grove_sel=True)
        # chunk experts: ids/2, weights = softmax probs at chunk-id rows
        chunk = moe(main, ws, b, 2, 2, gating="softmax", norm_w=True,
                    probs_in=logits, grove_sel=True, grove_groups=2,
                    suffix="chexps")
        x = main + 0.05 * chunk + ffn_inp
    x = rms_norm(x, ws["output_norm.weight"])
    want = x @ ws["output.weight"].T
    check(p, want)


def test_afmoe_numeric(tmp_path):
    # src/models/afmoe.cpp: embd * sqrt(E); sigmoid(wqkv_gate) multiplies
    # the attention output before wo; per-head qk norm; post-norms on both
    # sublayers; sigmoid gating with exp_probs_b and norm_w (weights_norm
    # key) + w_scale
    w = _writer("afmoe", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_gating_func": np.uint32(2),
        "expert_weights_norm": np.bool_(True),
        "expert_weights_scale": np.float32(1.5)})
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
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    x = ws["token_embd.weight"][TOKENS] * np.sqrt(E)
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        gate = h @ ws[b + "attn_gate.weight"].T
        q = rms_norm(q, ws[b + "attn_q_norm.weight"])
        k = rms_norm(k, ws[b + "attn_k_norm.weight"])
        # use_rope: (il+1) % n_no_rope_layer_step(4) != 0 -> both layers
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV)
        att = att * (1.0 / (1.0 + np.exp(-gate)))
        att = att @ ws[b + "attn_output.weight"].T
        att = rms_norm(att, ws[b + "attn_post_norm.weight"])
        ffn_inp = res + att
        h = rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        out = moe(h, ws, b, 4, 2, gating="sigmoid", norm_w=True,
                  w_scale=1.5, sel_bias=ws[b + "exp_probs_b.bias"])
        out = rms_norm(out, ws[b + "ffn_post_norm.weight"])
        x = ffn_inp + out
    x = rms_norm(x, ws["output_norm.weight"])
    want = x @ ws["output.weight"].T
    check(p, want)


def test_talkie_numeric(tmp_path):
    # src/models/talkie.cpp: every norm is WEIGHTLESS rms (embd, attn, ffn,
    # final); per-head scalar q_norm weight after rope on q only; k normed
    # weightless after rope; per-layer scalar out_scale multiplies the
    # post-embd skip stream added each layer; logit_scale head
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
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    x = rms_norm(ws["token_embd.weight"][TOKENS])
    skip = x
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = rms_norm(x)
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        q = rms_norm(q) * ws[b + "attn_q_norm.weight"].reshape(H, 1)
        k = rms_norm(k)
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV)
        att = att @ ws[b + "attn_output.weight"].T
        ffn_inp = res + att
        h = rms_norm(ffn_inp)
        out = ffn(h, ws, b)
        x = ffn_inp + out + skip * float(
            ws[b + "layer_output_scale.weight"][0])
    x = rms_norm(x)
    want = (x @ ws["output.weight"].T) * 0.5
    check(p, want)


def test_minicpm3_numeric(tmp_path):
    # src/models/minicpm3.cpp: MLA q_a/q_b + kv_a_mqa/kv_b projections,
    # rope only on the pe slices (NEOX), scale_embd=12,
    # scale_res=1.4/sqrt(L) on both sublayer outputs, lm-head scale 256/E.
    # Our loader runs the ABSORBED latent form — mathematically identical.
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
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    scale_res = 1.4 / np.sqrt(L)
    x = ws["token_embd.weight"][TOKENS] * 12.0
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        qa = rms_norm(h @ ws[b + "attn_q_a.weight"].T,
                      ws[b + "attn_q_a_norm.weight"])
        qfull = (qa @ ws[b + "attn_q_b.weight"].T).reshape(T, H, hd_k)
        q_nope, q_pe = qfull[..., :nope], qfull[..., nope:]
        kv_pe = h @ ws[b + "attn_kv_a_mqa.weight"].T  # [T, kvr + n_rot]
        kv_c = rms_norm(kv_pe[:, :kvr], ws[b + "attn_kv_a_norm.weight"])
        k_pe = kv_pe[:, kvr:].reshape(T, 1, n_rot)
        kv = (kv_c @ ws[b + "attn_kv_b.weight"].T).reshape(T, H, nope + dv)
        k_nope, v = kv[..., :nope], kv[..., nope:]
        q_pe = rope(q_pe, pos, n_rot, "neox")
        k_pe = rope(k_pe, pos, n_rot, "neox")
        q = np.concatenate([q_nope, q_pe], -1)
        k = np.concatenate([k_nope, np.repeat(k_pe, H, axis=1)], -1)
        att = attention(q, k, v, scale=hd_k ** -0.5, n_head_kv=H)
        att = att @ ws[b + "attn_output.weight"].T
        ffn_inp = res + att * scale_res
        h = rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        out = ffn(h, ws, b)
        x = ffn_inp + out * scale_res
    x = rms_norm(x, ws["output_norm.weight"])
    want = (x * (256.0 / E)) @ ws["token_embd.weight"].T
    check(p, want)


def test_plm_numeric(tmp_path):
    # src/models/plm.cpp: MLA WITHOUT q-lora (direct q proj), NEOX rope on
    # the pe slices, kq_scale 1/sqrt(hd_k), non-gated relu^2 FFN, tied head
    n_rot, nope, dv, kvr = 8, 8, 16, 16
    hd_k = n_rot + nope
    w = _writer("plm", n_rot=n_rot, extra_md={
        "attention.kv_lora_rank": np.uint32(kvr),
        "attention.key_length": np.uint32(hd_k),
        "attention.value_length": np.uint32(dv),
    })
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * hd_k, E)
        emit(w, b + "attn_kv_a_mqa.weight", kvr + n_rot, E)
        emit(w, b + "attn_kv_a_norm.weight", kvr, ones=True)
        emit(w, b + "attn_kv_b.weight", H * (nope + dv), kvr)
        emit(w, b + "attn_output.weight", E, H * dv)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    T = len(TOKENS)
    pos = np.arange(T)
    x = ws["token_embd.weight"][TOKENS]
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = rms_norm(x, ws[b + "attn_norm.weight"])
        qfull = (h @ ws[b + "attn_q.weight"].T).reshape(T, H, hd_k)
        q_nope, q_pe = qfull[..., :nope], qfull[..., nope:]
        kv_pe = h @ ws[b + "attn_kv_a_mqa.weight"].T
        kv_c = rms_norm(kv_pe[:, :kvr], ws[b + "attn_kv_a_norm.weight"])
        k_pe = kv_pe[:, kvr:].reshape(T, 1, n_rot)
        kv = (kv_c @ ws[b + "attn_kv_b.weight"].T).reshape(T, H, nope + dv)
        k_nope, v = kv[..., :nope], kv[..., nope:]
        q_pe = rope(q_pe, pos, n_rot, "neox")
        k_pe = rope(k_pe, pos, n_rot, "neox")
        q = np.concatenate([q_nope, q_pe], -1)
        k = np.concatenate([k_nope, np.repeat(k_pe, H, axis=1)], -1)
        att = attention(q, k, v, scale=hd_k ** -0.5, n_head_kv=H)
        att = att @ ws[b + "attn_output.weight"].T
        ffn_inp = res + att
        h = rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        out = ffn(h, ws, b, act="relu2")
        x = ffn_inp + out
    x = rms_norm(x, ws["output_norm.weight"])
    check(p, x @ ws["token_embd.weight"].T)


def test_starcoder_numeric(tmp_path):
    # src/models/starcoder.cpp: learned positions + LN+bias norms + fused
    # biased GQA qkv + gelu SEQ FFN with biases, no rope
    w = _writer("starcoder")
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "position_embd.weight", 256, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output_norm.bias", E, scale=0.02)
    qkv_n = E + 2 * (HKV * HD)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_norm.bias", E, scale=0.02)
        emit(w, b + "attn_qkv.weight", qkv_n, E)
        emit(w, b + "attn_qkv.bias", qkv_n, scale=0.05)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "attn_output.bias", E, scale=0.02)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.bias", E, scale=0.02)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_up.bias", FF, scale=0.02)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_down.bias", E, scale=0.02)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    want = dense_forward(md, ws, TOKENS,
                         {"norm": "ln", "rope": "none", "pos_embd": True,
                          "ffn_act": "gelu", "ffn_bias": True})
    check(p, want)


def test_jais2_numeric(tmp_path):
    # src/models/jais2.cpp: LN+bias blocks, separate biased q/k/v, NEOX
    # rope, relu^2 SEQ FFN with biases
    w = _writer("jais2")
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output_norm.bias", E, scale=0.02)
    emit(w, "output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_norm.bias", E, scale=0.02)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_q.bias", H * HD, scale=0.05)
        emit(w, b + "attn_k.bias", HKV * HD, scale=0.05)
        emit(w, b + "attn_v.bias", HKV * HD, scale=0.05)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "attn_output.bias", E, scale=0.02)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.bias", E, scale=0.02)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_up.bias", FF, scale=0.02)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_down.bias", E, scale=0.02)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    want = dense_forward(md, ws, TOKENS,
                         {"norm": "ln", "rope": "neox",
                          "ffn_act": "relu2", "ffn_bias": True})
    check(p, want)


def test_bailingmoe2_numeric(tmp_path):
    # src/models/bailingmoe2.cpp: per-head qk rmsnorm before NEOX rope,
    # dense-lead layers (il < n_layer_dense_lead get a plain SiLU FFN),
    # sigmoid gating + exp_probs_b selection bias + weights_norm + scale,
    # ungated shared expert added to the MoE output
    w = _writer("bailingmoe2", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_shared_count": np.uint32(1),
        "expert_gating_func": np.uint32(2),
        "expert_weights_norm": True,
        "expert_weights_scale": np.float32(1.5),
        "leading_dense_block_count": np.uint32(1)})
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        if i == 0:  # dense lead
            emit(w, b + "ffn_gate.weight", FF, E)
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_down.weight", E, FF)
        else:
            _emit_moe(w, b, 4, FF, shexp=1)
            emit(w, b + "exp_probs_b.bias", 4, scale=1.0)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    spec = {"rope": "neox", "qk_norm": "head",
            "moe": {"n_exp": 4, "n_used": 2, "gating": "sigmoid",
                    "norm_w": True, "w_scale": 1.5}}
    check(p, dense_forward(md, ws, TOKENS, spec))


def test_hy_v3_numeric(tmp_path):
    # src/models/hy-v3.cpp: per-head qk rmsnorm before NEOX rope, kq_scale
    # 1/sqrt(n_embd_head), dense-lead layers, sigmoid MoE with exp_probs_b
    # selection bias + weights_norm/scale, ungated shared expert, tied head
    w = _writer("hy_v3", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_shared_count": np.uint32(1),
        "expert_gating_func": np.uint32(2),
        "expert_weights_norm": True,
        "expert_weights_scale": np.float32(1.25)})
    _common(w, tie=True)
    for i in range(L):
        b = f"blk.{i}."
        _std_attn(w, b, qk_norm=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        if i == 0:  # leading dense
            emit(w, b + "ffn_gate.weight", FF, E)
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_down.weight", E, FF)
        else:
            _emit_moe(w, b, 4, FF, shexp=1)
            emit(w, b + "exp_probs_b.bias", 4, scale=1.0)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    spec = {"rope": "neox", "qk_norm": "head",
            "moe": {"n_exp": 4, "n_used": 2, "gating": "sigmoid",
                    "norm_w": True, "w_scale": 1.25}}
    check(p, dense_forward(md, ws, TOKENS, spec))


@pytest.mark.parametrize("arch,norm_w", [("llada-moe", False), ("rnd1", True)])
def test_diffusion_moe_numeric(tmp_path, arch, norm_w):
    # src/models/llada-moe.cpp / rnd1.cpp: NON-CAUSAL attention (diffusion
    # LMs, hparams.causal_attn=false), per-head qk rmsnorm before NEOX
    # rope, softmax MoE — llada-moe keeps RAW top-k weights (norm_w=false,
    # llada-moe.cpp:133), rnd1 normalizes them (rnd1.cpp:146)
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
    md, ws = load_f64(p)
    spec = {"rope": "neox", "qk_norm": "head", "causal": False,
            "moe": {"n_exp": 4, "n_used": 2, "gating": "softmax",
                    "norm_w": norm_w}}
    check(p, dense_forward(md, ws, TOKENS, spec))


# --------------------------------------------------------------------------
# encoder archs: embed() (mean pooling over final hidden) vs numpy oracle
# --------------------------------------------------------------------------


def ours_embed(path, tokens=None):
    import jax.numpy as jnp

    tokens = tokens or TOKENS[:12]
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(m, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    return np.asarray(ctx.embed(tokens, pooling="mean"), np.float64)


@pytest.mark.parametrize("arch,fused", [("neo-bert", True),
                                        ("eurobert", False)])
def test_neobert_eurobert_numeric(tmp_path, arch, fused):
    # src/models/{neo-bert,eurobert}.cpp: pre-norm RMS encoders with
    # NON-CAUSAL attention; neo-bert NORM rope + fused SWIGLU, eurobert
    # NEOX rope + separate silu-PAR; final enc.output_norm
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
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    toks = TOKENS[:12]
    T = len(toks)
    pos = np.arange(T)
    mode = "norm" if arch == "neo-bert" else "neox"
    x = ws["token_embd.weight"][toks]
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = orc.rms_norm(x, ws[b + "attn_norm.weight"])
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        q = rope(q, pos, HD, mode)
        k = rope(k, pos, HD, mode)
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV,
                        causal=False)
        att = att @ ws[b + "attn_output.weight"].T
        ffn_inp = res + att
        h = orc.rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        x = ffn_inp + ffn(h, ws, b, fused=fused)
    x = orc.rms_norm(x, ws["enc.output_norm.weight"])
    want = x.mean(axis=0)
    got = ours_embed(p, toks)
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)


def test_gemma_embedding_numeric(tmp_path):
    # src/models/gemma-embedding.cpp: gemma3 stack run bidirectionally with
    # SYMMETRIC windows on local layers; embd * sqrt(E); per-head qk norm;
    # Q scaled by 1/sqrt(head_dim) then kq_scale 1.0; GELU-PAR; post-norms
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
    md, ws = load_f64(p)
    toks = TOKENS[:12]
    T = len(toks)
    pos = np.arange(T)
    x = ws["token_embd.weight"][toks] * np.sqrt(E)
    for il in range(L):
        b = f"blk.{il}."
        is_swa = il % 2 < 1
        res = x
        h = orc.rms_norm(x, ws[b + "attn_norm.weight"])
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        q = orc.rms_norm(q, ws[b + "attn_q_norm.weight"])
        k = orc.rms_norm(k, ws[b + "attn_k_norm.weight"])
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        q = q * (HD ** -0.5)
        # symmetric window (llama-hparams.h:402): |q - k| <= n_swa/2
        outs = []
        mask = np.zeros((T, T))
        if is_swa:
            d = pos[:, None] - pos[None, :]
            mask[np.abs(d) > 8] = -np.inf
        G = H // HKV
        for hh in range(H):
            s = q[:, hh] @ k[:, hh // G].T + mask
            outs.append(orc.softmax(np.where(np.isneginf(s), -1e30, s))
                        @ v[:, hh // G])
        att = np.concatenate(outs, -1) @ ws[b + "attn_output.weight"].T
        att = orc.rms_norm(att, ws[b + "attn_post_norm.weight"])
        ffn_inp = res + att
        h = orc.rms_norm(ffn_inp, ws[b + "ffn_norm.weight"])
        out = orc.gelu(h @ ws[b + "ffn_gate.weight"].T) * (
            h @ ws[b + "ffn_up.weight"].T) @ ws[b + "ffn_down.weight"].T
        out = orc.rms_norm(out, ws[b + "ffn_post_norm.weight"])
        x = ffn_inp + out
    x = orc.rms_norm(x, ws["output_norm.weight"])
    want = x.mean(axis=0)
    got = ours_embed(p, toks)
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)


def test_jina_bert_v3_numeric(tmp_path):
    # src/models/jina-bert-v3.cpp + shared bert.cpp graph: post-norm LN
    # encoder, type-0 embedding + token_embd_norm, NEOX rope, NON-CAUSAL
    # attention, plain GELU-SEQ FFN (bert.cpp:191-197 — no gate), residual
    # then attn_output_norm / layer_output_norm (both with bias)
    w = _writer("jina-bert-v3")
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "token_types.weight", 2, E, scale=0.05)
    emit(w, "token_embd_norm.weight", E, ones=True)
    emit(w, "token_embd_norm.bias", E, scale=0.01)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_q.bias", H * HD, scale=0.05)
        emit(w, b + "attn_k.bias", HKV * HD, scale=0.05)
        emit(w, b + "attn_v.bias", HKV * HD, scale=0.05)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "attn_output.bias", E, scale=0.05)
        emit(w, b + "attn_output_norm.weight", E, ones=True)
        emit(w, b + "attn_output_norm.bias", E, scale=0.01)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_up.bias", FF, scale=0.05)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_down.bias", E, scale=0.05)
        emit(w, b + "layer_output_norm.weight", E, ones=True)
        emit(w, b + "layer_output_norm.bias", E, scale=0.01)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    toks = TOKENS[:12]
    pos = np.arange(len(toks))
    x = ws["token_embd.weight"][toks] + ws["token_types.weight"][0]
    x = orc.layer_norm(x, ws["token_embd_norm.weight"],
                       ws["token_embd_norm.bias"])
    for il in range(L):
        b = f"blk.{il}."
        q = x @ ws[b + "attn_q.weight"].T + ws[b + "attn_q.bias"]
        k = x @ ws[b + "attn_k.weight"].T + ws[b + "attn_k.bias"]
        v = x @ ws[b + "attn_v.weight"].T + ws[b + "attn_v.bias"]
        q = rope(q.reshape(-1, H, HD), pos, HD, "neox")
        k = rope(k.reshape(-1, HKV, HD), pos, HD, "neox")
        v = v.reshape(-1, HKV, HD)
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV,
                        causal=False)
        att = att @ ws[b + "attn_output.weight"].T + ws[b + "attn_output.bias"]
        x = orc.layer_norm(att + x, ws[b + "attn_output_norm.weight"],
                           ws[b + "attn_output_norm.bias"])
        ffn_inp = x
        h = orc.gelu(x @ ws[b + "ffn_up.weight"].T + ws[b + "ffn_up.bias"])
        y = h @ ws[b + "ffn_down.weight"].T + ws[b + "ffn_down.bias"]
        x = orc.layer_norm(y + ffn_inp, ws[b + "layer_output_norm.weight"],
                           ws[b + "layer_output_norm.bias"])
    want = x.mean(axis=0)
    got = ours_embed(p, toks)
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)


def test_nomic_bert_moe_numeric(tmp_path):
    # src/models/nomic-bert-moe.cpp + bert.cpp: fused qkv+bias, NEOX rope,
    # every 2nd layer (i % 2 == 1) swaps the FFN for gate-less GELU experts
    # with softmax routing and RAW top-k weights (bert.cpp:179-189 passes
    # norm_w=false), dense GELU+bias FFN otherwise
    NEXP, NUSED = 4, 2
    w = _writer("nomic-bert-moe", extra_md={
        "moe_every_n_layers": np.uint32(2),
        "expert_count": np.uint32(NEXP),
        "expert_used_count": np.uint32(NUSED)})
    qkv_n = H * HD + 2 * (HKV * HD)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "token_types.weight", 2, E, scale=0.05)
    emit(w, "token_embd_norm.weight", E, ones=True)
    emit(w, "token_embd_norm.bias", E, scale=0.01)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_qkv.weight", qkv_n, E)
        emit(w, b + "attn_qkv.bias", qkv_n, scale=0.05)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "attn_output.bias", E, scale=0.05)
        emit(w, b + "attn_output_norm.weight", E, ones=True)
        emit(w, b + "attn_output_norm.bias", E, scale=0.01)
        if i % 2 == 1:
            emit(w, b + "ffn_gate_inp.weight", NEXP, E)
            emit(w, b + "ffn_up_exps.weight", NEXP, FF, E)
            emit(w, b + "ffn_down_exps.weight", NEXP, E, FF)
        else:
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_up.bias", FF, scale=0.05)
            emit(w, b + "ffn_down.weight", E, FF)
            emit(w, b + "ffn_down.bias", E, scale=0.05)
        emit(w, b + "layer_output_norm.weight", E, ones=True)
        emit(w, b + "layer_output_norm.bias", E, scale=0.01)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    toks = TOKENS[:12]
    pos = np.arange(len(toks))
    x = ws["token_embd.weight"][toks] + ws["token_types.weight"][0]
    x = orc.layer_norm(x, ws["token_embd_norm.weight"],
                       ws["token_embd_norm.bias"])
    for il in range(L):
        b = f"blk.{il}."
        q, k, v = qkv(x, ws, b, H, HKV, HD)
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV,
                        causal=False)
        att = att @ ws[b + "attn_output.weight"].T + ws[b + "attn_output.bias"]
        x = orc.layer_norm(att + x, ws[b + "attn_output_norm.weight"],
                           ws[b + "attn_output_norm.bias"])
        ffn_inp = x
        if il % 2 == 1:
            y = moe(x, ws, b, NEXP, NUSED, act="gelu", gating="softmax",
                    norm_w=False)
        else:
            h = orc.gelu(x @ ws[b + "ffn_up.weight"].T
                         + ws[b + "ffn_up.bias"])
            y = h @ ws[b + "ffn_down.weight"].T + ws[b + "ffn_down.bias"]
        x = orc.layer_norm(y + ffn_inp, ws[b + "layer_output_norm.weight"],
                           ws[b + "layer_output_norm.bias"])
    want = x.mean(axis=0)
    got = ours_embed(p, toks)
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)


def test_dream_numeric(tmp_path):
    # src/models/dream.cpp: qwen2-style graph (separate q/k/v with biases,
    # NEOX rope, swiglu) with FULL bidirectional attention (diffusion LM,
    # build_attn_inp_no_cache non-causal)
    w = _writer("dream")
    _common(w)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_q.bias", H * HD, scale=0.05)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_k.bias", HKV * HD, scale=0.05)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_v.bias", HKV * HD, scale=0.05)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    check(p, dense_forward(md, ws, TOKENS,
                           {"rope": "neox", "causal": False}))


def test_llada_numeric(tmp_path):
    # src/models/llada.cpp: llama graph (separate q/k/v, no biases, NORM
    # rope) with FULL bidirectional attention
    w = _writer("llada")
    _common(w)
    for i, b in _dense_layers(w):
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    check(p, dense_forward(md, ws, TOKENS,
                           {"rope": "norm", "causal": False}))


def test_nomic_bert_numeric(tmp_path):
    # src/models/bert.cpp plain NOMIC_BERT branches: fused qkv (no bias),
    # NEOX rope (bert.cpp:138), LN post-norms, gated SiLU-PAR FFN
    # (bert.cpp:209-213 final else), non-causal encoder
    w = _writer("nomic-bert", extra_md={
        "!tokenizer.ggml.token_type_count": np.uint32(2)})
    qkv_n = H * HD + 2 * (HKV * HD)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "token_types.weight", 2, E, scale=0.05)
    emit(w, "token_embd_norm.weight", E, ones=True)
    emit(w, "token_embd_norm.bias", E, scale=0.01)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_qkv.weight", qkv_n, E)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "attn_output_norm.weight", E, ones=True)
        emit(w, b + "attn_output_norm.bias", E, scale=0.01)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "layer_output_norm.weight", E, ones=True)
        emit(w, b + "layer_output_norm.bias", E, scale=0.01)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    md, ws = load_f64(p)
    toks = TOKENS[:12]
    pos = np.arange(len(toks))
    x = ws["token_embd.weight"][toks] + ws["token_types.weight"][0]
    x = orc.layer_norm(x, ws["token_embd_norm.weight"],
                       ws["token_embd_norm.bias"])
    for il in range(L):
        b = f"blk.{il}."
        q, k, v = qkv(x, ws, b, H, HKV, HD)
        q = rope(q, pos, HD, "neox")
        k = rope(k, pos, HD, "neox")
        att = attention(q, k, v, scale=HD ** -0.5, n_head_kv=HKV,
                        causal=False)
        att = att @ ws[b + "attn_output.weight"].T
        x = orc.layer_norm(att + x, ws[b + "attn_output_norm.weight"],
                           ws[b + "attn_output_norm.bias"])
        h = silu(x @ ws[b + "ffn_gate.weight"].T) * (
            x @ ws[b + "ffn_up.weight"].T)
        y = h @ ws[b + "ffn_down.weight"].T
        x = orc.layer_norm(x + y, ws[b + "layer_output_norm.weight"],
                           ws[b + "layer_output_norm.bias"])
    want = x.mean(axis=0)
    got = ours_embed(p, toks)
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)
