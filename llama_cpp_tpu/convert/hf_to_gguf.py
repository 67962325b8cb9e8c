"""HF checkpoint -> GGUF converter.

Analog of reference convert_hf_to_gguf.py + gguf-py writer (tensor-name
mapping per gguf-py/gguf/tensor_mapping.py). Llama q/k weights are permuted
for NORM-style rope exactly like the reference converter so GGUF files are
interchangeable between the two frameworks.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterable

import numpy as np

from ..gguf.constants import GGMLType, Keys, TokenType
from ..gguf.writer import GGUFWriter
from ..quant.quantize import quantize

_FTYPE_MAP = {
    "f32": GGMLType.F32,
    "f16": GGMLType.F16,
    "bf16": GGMLType.BF16,
    "q8_0": GGMLType.Q8_0,
    "q4_0": GGMLType.Q4_0,
    "q4_k": GGMLType.Q4_K,
    "q5_k": GGMLType.Q5_K,
    "q6_k": GGMLType.Q6_K,
}

_FTYPE_ID = {"f32": 0, "f16": 1, "bf16": 32, "q8_0": 7, "q4_0": 2, "q4_k": 15, "q5_k": 17, "q6_k": 18}


def permute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """Reorder q/k projection rows from HF half-split rope layout to the
    interleaved layout used by ggml NORM rope (reference convert_hf_to_gguf
    LlamaModel.permute)."""
    out_dim = w.shape[0]
    head_dim = out_dim // n_head
    return (
        w.reshape(n_head, 2, head_dim // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def _emit(writer: GGUFWriter, name: str, arr: np.ndarray, ftype: str):
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    qt = _FTYPE_MAP[ftype]
    # 1-D tensors and small/odd tensors stay f32 (reference quantizer policy)
    if arr.ndim == 1 or arr.shape[-1] % 256 != 0 or "norm" in name or name.endswith(".bias"):
        writer.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)
        return
    if qt == GGMLType.F32:
        data = arr.tobytes()
    elif qt == GGMLType.F16:
        data = arr.astype(np.float16).tobytes()
    elif qt == GGMLType.BF16:
        data = quantize(arr, GGMLType.BF16).tobytes()
    else:
        data = quantize(arr, qt).tobytes()
    writer.add_tensor(name, data, tuple(reversed(arr.shape)), qt)


def _add_vocab_from_hf_tokenizer(w: GGUFWriter, tokenizer) -> None:
    """Extract a GGUF BPE vocab from a HF fast tokenizer."""
    K = Keys.Tokenizer
    tj = json.loads(tokenizer._tokenizer.to_str())
    model = tj["model"]
    vocab = model["vocab"]
    id_to_tok = sorted(vocab.items(), key=lambda kv: kv[1])
    tokens = [t for t, _ in id_to_tok]
    merges = model.get("merges", [])
    merges = [" ".join(m) if isinstance(m, (list, tuple)) else m for m in merges]
    added = {t["content"]: t for t in tj.get("added_tokens", [])}
    types = []
    for t in tokens:
        if t in added:
            types.append(int(TokenType.CONTROL if added[t].get("special") else TokenType.USER_DEFINED))
        else:
            types.append(int(TokenType.NORMAL))
    w.add(K.MODEL, "gpt2")
    w.add(K.PRE, "llama-bpe")
    w.add(K.TOKENS, tokens)
    w.add(K.MERGES, merges)
    w.add(K.TOKEN_TYPE, np.asarray(types, dtype=np.int32))
    if tokenizer.bos_token_id is not None:
        w.add(K.BOS_ID, np.uint32(tokenizer.bos_token_id))
    if tokenizer.eos_token_id is not None:
        w.add(K.EOS_ID, np.uint32(tokenizer.eos_token_id))
    w.add(K.ADD_BOS, True)
    w.add(K.ADD_EOS, False)
    if getattr(tokenizer, "chat_template", None):
        w.add(K.CHAT_TEMPLATE, tokenizer.chat_template)


def convert_hf_model(
    model,  # transformers PreTrainedModel (llama/mistral/qwen2/3/mixtral/gemma)
    out_path: str,
    ftype: str = "f16",
    tokenizer=None,
    vocab_override: dict[str, Any] | None = None,
) -> str:
    cfg = model.config
    mtype = cfg.model_type
    n_deepstack = 0
    if mtype == "qwen3_vl":
        # text stack nested under text_config; deepstack width from the
        # vision tower (registry reads qwen3vl.n_deepstack_layers)
        n_deepstack = len(getattr(cfg.vision_config,
                                  "deepstack_visual_indexes", ()) or ())
        cfg = cfg.text_config
    arch = {
        "llama": "llama",
        "llama4_text": "llama4",
        "mistral": "llama",
        "qwen2": "qwen2",
        "qwen3": "qwen3",
        "mixtral": "llama",  # reference stores mixtral under llama arch w/ experts
        "gemma": "gemma",
        "gemma2": "gemma2",
        "gemma3_text": "gemma3",
        "phi3": "phi3",
        "starcoder2": "starcoder2",
        "qwen2_moe": "qwen2moe",
        "qwen3_moe": "qwen3moe",
        "olmoe": "olmoe",
        "falcon": "falcon",
        "smollm3": "smollm3",
        "granite": "granite",
        "olmo2": "olmo2",
        "cohere": "command-r",
        "glm4": "glm4",
        "nemotron": "nemotron",
        "gpt_oss": "gpt-oss",
        "mamba": "mamba",
        "falcon_mamba": "mamba",
        "mamba2": "mamba2",
        "jamba": "jamba",
        "deepseek_v2": "deepseek2",
        "bert": "bert",
        "roberta": "bert",
        "xlm-roberta": "bert",
        "deepseek_v3": "deepseek2",
        "gpt2": "gpt2",
        "gpt_neox": "gptneox",
        "phi": "phi2",
        "bloom": "bloom",
        "cohere2": "cohere2",
        "olmo": "olmo",
        "exaone4": "exaone4",
        "seed_oss": "seed_oss",
        "hunyuan_v1_dense": "hunyuan-dense",
        "ernie4_5": "ernie4_5",
        "ernie4_5_moe": "ernie4_5-moe",
        "dbrx": "dbrx",
        "granitemoe": "granitemoe",
        "dots1": "dots1",
        "glm4_moe": "glm4moe",
        "phimoe": "phimoe",
        "t5": "t5",
        "mt5": "t5",
        "falcon_h1": "falcon-h1",
        "granitemoehybrid": "granitehybrid",
        "lfm2": "lfm2",
        "lfm2_moe": "lfm2moe",
        "qwen3_next": "qwen3next",
        "arcee": "arcee",
        "apertus": "apertus",
        "chameleon": "chameleon",
        "modernbert": "modern-bert",
        "qwen2_vl": "qwen2vl",
        "qwen2_5_vl": "qwen2vl",
        "qwen3_vl": "qwen3vl",
        "qwen3_vl_text": "qwen3vl",
        "gemma3n_text": "gemma3n",
    }.get(mtype)
    if arch is None:
        raise NotImplementedError(f"convert: model_type {mtype}")

    if arch == "gemma3n":
        return _convert_gemma3n(model, out_path, ftype, tokenizer,
                                vocab_override)
    if arch == "mamba":
        return _convert_mamba(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "mamba2":
        return _convert_mamba2(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "jamba":
        return _convert_jamba(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "deepseek2":
        return _convert_deepseek2(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "bert":
        return _convert_bert(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "falcon":
        return _convert_falcon(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "dbrx":
        return _convert_dbrx(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "t5":
        return _convert_t5(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "modern-bert":
        return _convert_modernbert(model, out_path, ftype, tokenizer,
                                   vocab_override)
    if arch == "qwen3next":
        return _convert_qwen3next(model, out_path, ftype, tokenizer,
                                  vocab_override)
    if arch in ("lfm2", "lfm2moe"):
        return _convert_lfm2(model, arch, out_path, ftype, tokenizer,
                             vocab_override)
    if arch == "falcon-h1":
        return _convert_falcon_h1(model, out_path, ftype, tokenizer, vocab_override)
    if arch == "granitehybrid":
        return _convert_granite_hybrid(model, out_path, ftype, tokenizer,
                                       vocab_override)
    if arch in ("gpt2", "gptneox", "bloom", "phi2"):
        return _convert_ln_family(model, arch, out_path, ftype, tokenizer,
                                  vocab_override)

    n_head = cfg.num_attention_heads
    n_kv = getattr(cfg, "num_key_value_heads", n_head)
    n_embd = cfg.hidden_size
    head_dim = getattr(cfg, "head_dim", None) or n_embd // n_head

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, getattr(cfg, "name_or_path", "") or "converted")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = f"{arch}."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(getattr(cfg, "max_position_embeddings", 2048)))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(n_head))
    w.add(P + "attention.head_count_kv", np.uint32(n_kv))
    w.add(P + "attention.key_length", np.uint32(head_dim))
    w.add(P + "attention.value_length", np.uint32(head_dim))
    w.add(P + "attention.layer_norm_rms_epsilon", float(getattr(cfg, "rms_norm_eps", 1e-5)))
    w.add(P + "rope.freq_base", float(getattr(cfg, "rope_theta", 10000.0)))
    w.add(P + "rope.dimension_count", np.uint32(head_dim))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if mtype == "mixtral":
        w.add(P + "expert_count", np.uint32(cfg.num_local_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
    if mtype == "gpt_oss":
        w.add(P + "expert_count", np.uint32(cfg.num_local_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.intermediate_size))
        w.add(P + "attention.sliding_window", np.uint32(cfg.sliding_window))
    if mtype == "qwen2_moe":
        w.add(P + "expert_count", np.uint32(cfg.num_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.moe_intermediate_size))
        w.add(P + "expert_shared_count", np.uint32(1))
    if mtype in ("qwen3_moe", "olmoe"):
        w.add(P + "expert_count", np.uint32(cfg.num_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        if hasattr(cfg, "moe_intermediate_size"):
            w.add(P + "expert_feed_forward_length", np.uint32(cfg.moe_intermediate_size))
        w.add(P + "expert_weights_norm", bool(getattr(cfg, "norm_topk_prob", True)))
    if mtype == "llama4_text":
        w.add(P + "expert_count", np.uint32(cfg.num_local_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.intermediate_size))
        w.add(P + "interleave_moe_layer_step",
              np.uint32(getattr(cfg, "interleave_moe_layer_step", 1)))
        w.add(P + "use_qk_norm", bool(getattr(cfg, "use_qk_norm", False)))
        nl = getattr(cfg, "no_rope_layers", None)
        if nl:
            w.add(P + "no_rope_layers", [int(x) for x in nl])
    if mtype == "smollm3":
        nl = getattr(cfg, "no_rope_layers", None)
        if nl is not None:
            w.add(P + "no_rope_layers", [int(x) for x in nl])
    if mtype == "gemma2":
        w.add(P + "attn_logit_softcapping", float(cfg.attn_logit_softcapping))
        w.add(P + "final_logit_softcapping", float(cfg.final_logit_softcapping))
        w.add(P + "attention.sliding_window", np.uint32(cfg.sliding_window))
        w.add(P + "attention.scale",
              float(cfg.query_pre_attn_scalar) ** -0.5)
    if mtype == "gemma3_text":
        w.add(P + "attention.sliding_window", np.uint32(cfg.sliding_window or 0))
        w.add(P + "attention.sliding_window_pattern",
              np.uint32(getattr(cfg, "sliding_window_pattern", 6) or 6))
        w.add(P + "rope.freq_base_swa",
              float(getattr(cfg, "rope_local_base_freq", 10000.0)))
        w.add(P + "attention.scale",
              float(getattr(cfg, "query_pre_attn_scalar", 256)) ** -0.5)
    if mtype in ("granitemoe",):
        w.add(P + "expert_count", np.uint32(cfg.num_local_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.intermediate_size))
    if mtype == "phimoe":
        w.add(P + "expert_count", np.uint32(cfg.num_local_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.intermediate_size))
        w.add(P + "router_jitter", float(getattr(cfg, "router_jitter_noise", 0.01)))
        w.add(P + "attention.layer_norm_epsilon",
              float(getattr(cfg, "rms_norm_eps", 1e-5)))
    if mtype in ("dots1", "glm4_moe"):
        w.add(P + "expert_count", np.uint32(cfg.n_routed_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.moe_intermediate_size))
        w.add(P + "expert_shared_count", np.uint32(cfg.n_shared_experts or 0))
        w.add(P + "expert_weights_scale", float(getattr(cfg, "routed_scaling_factor", 1.0)))
        w.add(P + "expert_weights_norm", bool(getattr(cfg, "norm_topk_prob", True)))
        w.add(P + "leading_dense_block_count",
              np.uint32(getattr(cfg, "first_k_dense_replace", 0)))
    if mtype == "glm4_moe":
        prf = getattr(cfg, "partial_rotary_factor", 0.5)
        w.add(P + "rope.dimension_count", np.uint32(int(head_dim * prf)))
        w.add(P + "attention.use_qk_norm", bool(getattr(cfg, "use_qk_norm", False)))
    if mtype == "ernie4_5_moe":
        w.add(P + "expert_count", np.uint32(cfg.moe_num_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.moe_k))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.moe_intermediate_size))
        w.add(P + "expert_shared_count",
              np.uint32(getattr(cfg, "moe_num_shared_experts", 0) or 0))
    if mtype in ("cohere2",):
        w.add(P + "logit_scale", float(cfg.logit_scale))
        w.add(P + "attention.layer_norm_epsilon", float(cfg.layer_norm_eps))
        if getattr(cfg, "sliding_window", None):
            w.add(P + "attention.sliding_window", np.uint32(cfg.sliding_window))
            w.add(P + "attention.sliding_window_pattern",
                  np.uint32(getattr(cfg, "sliding_window_pattern", 4)))
    if mtype == "exaone4":
        sw = getattr(cfg, "sliding_window", None)
        if sw:
            pat = getattr(cfg, "sliding_window_pattern", 4)
            if isinstance(pat, str):  # e.g. "LLLG": global every len(pat)
                pat = len(pat)
            w.add(P + "attention.sliding_window", np.uint32(sw))
            w.add(P + "attention.sliding_window_pattern", np.uint32(pat))
    if mtype == "olmo":
        w.add(P + "attention.layer_norm_epsilon", 1e-5)
        if getattr(cfg, "clip_qkv", None):
            w.add(P + "attention.clamp_kqv", float(cfg.clip_qkv))
    if mtype == "hunyuan_v1_dense":
        rs = getattr(cfg, "rope_scaling", None) or {}
        alpha = rs.get("alpha") if isinstance(rs, dict) else None
        if alpha:  # NTK-aware: base' = base * alpha^(d/(d-2))
            base = float(getattr(cfg, "rope_theta", 10000.0))
            w.add(P + "rope.freq_base",
                  float(base * alpha ** (head_dim / (head_dim - 2))))
    if mtype == "apertus":
        sdp = model.state_dict()
        import torch as _torch
        ap, an, bt, ep = [], [], [], []
        for i in range(cfg.num_hidden_layers):
            pfx = f"model.layers.{i}.mlp.act_fn."
            beta = float(sdp[pfx + "beta"].float())
            ap.append(float(_torch.nn.functional.softplus(sdp[pfx + "alpha_p"].float())[0]))
            an.append(beta + float(_torch.nn.functional.softplus(sdp[pfx + "alpha_n"].float())[0]))
            bt.append(beta)
            ep.append(float(sdp[pfx + "eps"].float()))
        w.add(P + "xielu_alpha_p", ap)
        w.add(P + "xielu_alpha_n", an)
        w.add(P + "xielu_beta", bt)
        w.add(P + "xielu_eps", ep)
    if mtype == "chameleon":
        w.add(P + "swin_norm", bool(getattr(cfg, "swin_norm", False)))
    if mtype in ("granite", "granitemoe"):
        w.add(P + "embedding_scale", float(cfg.embedding_multiplier))
        w.add(P + "residual_scale", float(cfg.residual_multiplier))
        w.add(P + "attention.scale", float(cfg.attention_multiplier))
        w.add(P + "logit_scale", 1.0 / float(cfg.logits_scaling))
    if mtype == "cohere":
        w.add(P + "logit_scale", float(cfg.logit_scale))
        w.add(P + "attention.layer_norm_epsilon", float(cfg.layer_norm_eps))
    if mtype in ("glm4", "nemotron", "phi3"):
        prf = getattr(cfg, "partial_rotary_factor", 1.0)
        hd = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
        # overwrite rope dims for partial rotary
        w.add(P + "rope.dimension_count", np.uint32(int(hd * prf)))
    if mtype in ("qwen2_vl", "qwen2_5_vl", "qwen3_vl"):
        sec = list((getattr(cfg, "rope_scaling", None) or {}).get(
            "mrope_section", [16, 24, 24]))
        w.add(P + "rope.dimension_sections",
              [int(x) for x in (sec + [0] * (4 - len(sec)))[:4]])
    if mtype == "qwen3_vl" and n_deepstack:
        w.add(P + "n_deepstack_layers", np.uint32(n_deepstack))
    if mtype in ("starcoder2", "nemotron"):
        w.add(P + "attention.layer_norm_epsilon",
              float(getattr(cfg, "norm_eps", getattr(cfg, "layer_norm_epsilon", 1e-5))))

    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    if mtype in ("qwen2_vl", "qwen2_5_vl", "qwen3_vl"):
        # text stack lives under model.language_model.*; vision is exported
        # separately via convert_mmproj
        sd = {k.replace("model.language_model.", "model."): v
              for k, v in sd.items() if "visual" not in k}
    # NORM-rope archs with HF rotate_half layout need the q/k permute
    # (cohere/glm4 use interleaved rotary natively: NORM with no permute)
    permute = arch in ("llama", "granite", "granitemoe", "smollm3", "olmo",
                       "arcee", "chameleon")
    # gemma stores rmsnorm weights as (w - 1); nemotron uses layernorm1p
    norm_p1 = mtype in ("gemma", "gemma2", "gemma3_text", "nemotron")

    def get(name):
        return sd.get(name)

    def emit_norm(gname, hname):
        arr = get(hname)
        if arr is None:
            return
        _emit(w, gname, arr + 1.0 if norm_p1 else arr, ftype)

    emb = get("model.embed_tokens.weight")
    _emit(w, "token_embd.weight", emb, ftype)
    emit_norm("output_norm.weight", "model.norm.weight")
    if get("model.norm.bias") is not None:
        _emit(w, "output_norm.bias", get("model.norm.bias"), ftype)
    lm_head = get("lm_head.weight")
    if lm_head is not None and not getattr(cfg, "tie_word_embeddings", False):
        _emit(w, "output.weight", lm_head, ftype)
        if get("lm_head.bias") is not None:
            _emit(w, "output.bias", get("lm_head.bias"), ftype)

    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        emit_norm(b + "attn_norm.weight", p + "input_layernorm.weight")
        if mtype == "apertus":
            emit_norm(b + "attn_norm.weight", p + "attention_layernorm.weight")
            emit_norm(b + "ffn_norm.weight", p + "feedforward_layernorm.weight")
        if get(p + "input_layernorm.bias") is not None:
            _emit(w, b + "attn_norm.bias", get(p + "input_layernorm.bias"), ftype)
        if mtype == "phi3":
            _emit(w, b + "attn_qkv.weight", get(p + "self_attn.qkv_proj.weight"), ftype)
            _emit(w, b + "attn_output.weight", get(p + "self_attn.o_proj.weight"), ftype)
            emit_norm(b + "ffn_norm.weight", p + "post_attention_layernorm.weight")
            gu = get(p + "mlp.gate_up_proj.weight")
            nf = gu.shape[0] // 2
            _emit(w, b + "ffn_gate.weight", np.ascontiguousarray(gu[:nf]), ftype)
            _emit(w, b + "ffn_up.weight", np.ascontiguousarray(gu[nf:]), ftype)
            _emit(w, b + "ffn_down.weight", get(p + "mlp.down_proj.weight"), ftype)
            continue
        q = get(p + "self_attn.q_proj.weight")
        k = get(p + "self_attn.k_proj.weight")
        if permute:
            q = permute_rope(q, n_head)
            k = permute_rope(k, n_kv)
        _emit(w, b + "attn_q.weight", q, ftype)
        _emit(w, b + "attn_k.weight", k, ftype)
        _emit(w, b + "attn_v.weight", get(p + "self_attn.v_proj.weight"), ftype)
        _emit(w, b + "attn_output.weight", get(p + "self_attn.o_proj.weight"), ftype)
        for hf_b, gg_b in (("q_proj", "attn_q"), ("k_proj", "attn_k"), ("v_proj", "attn_v")):
            bias = get(p + f"self_attn.{hf_b}.bias")
            if bias is not None:
                if permute and gg_b in ("attn_q", "attn_k"):
                    bias = permute_rope(bias, n_head if gg_b == "attn_q" else n_kv)
                _emit(w, b + f"{gg_b}.bias", bias, ftype)
        ob = get(p + "self_attn.o_proj.bias")
        if ob is not None:
            _emit(w, b + "attn_output.bias", ob, ftype)
        qn = get(p + "self_attn.q_norm.weight")
        if mtype == "chameleon" and qn is not None:
            # permuted-rope layout needs the same channel reorder on the
            # per-head q/k norm params (reference conversion/chameleon.py
            # _reverse_hf_permute)
            def rev(a, heads):
                # [H, hd] per-head affine; reorder channels within each head
                a2 = np.asarray(a).reshape(heads, -1)
                hd = a2.shape[1]
                return np.ascontiguousarray(
                    a2.reshape(heads, 2, hd // 2).transpose(0, 2, 1)
                    .reshape(heads, hd))
            _emit(w, b + "attn_q_norm.weight", rev(qn, n_head), ftype)
            _emit(w, b + "attn_k_norm.weight",
                  rev(get(p + "self_attn.k_norm.weight"), n_kv), ftype)
            if get(p + "self_attn.q_norm.bias") is not None:
                _emit(w, b + "attn_q_norm.bias",
                      rev(get(p + "self_attn.q_norm.bias"), n_head), ftype)
                _emit(w, b + "attn_k_norm.bias",
                      rev(get(p + "self_attn.k_norm.bias"), n_kv), ftype)
        elif qn is not None:
            emit_norm(b + "attn_q_norm.weight", p + "self_attn.q_norm.weight")
            emit_norm(b + "attn_k_norm.weight", p + "self_attn.k_norm.weight")
        if get(p + "self_attn.query_layernorm.weight") is not None:  # hunyuan
            emit_norm(b + "attn_q_norm.weight", p + "self_attn.query_layernorm.weight")
            emit_norm(b + "attn_k_norm.weight", p + "self_attn.key_layernorm.weight")
        if mtype == "gpt_oss":
            # reference GGUF layout (conversion/gpt_oss.py): pre-FFN norm is
            # attn_post_norm; gate/up interleaved in gate_up_proj (::2 / 1::2)
            _emit(w, b + "attn_sinks.weight", get(p + "self_attn.sinks"), ftype)
            _emit(w, b + "attn_post_norm.weight", get(p + "post_attention_layernorm.weight"), ftype)
            _emit(w, b + "ffn_gate_inp.weight", get(p + "mlp.router.weight"), ftype)
            _emit(w, b + "ffn_gate_inp.bias", get(p + "mlp.router.bias"), ftype)
            gu = get(p + "mlp.experts.gate_up_proj").swapaxes(-1, -2)  # [E, 2F, H]
            _emit(w, b + "ffn_gate_exps.weight", np.ascontiguousarray(gu[:, ::2, :]), ftype)
            _emit(w, b + "ffn_up_exps.weight", np.ascontiguousarray(gu[:, 1::2, :]), ftype)
            gub = get(p + "mlp.experts.gate_up_proj_bias")
            _emit(w, b + "ffn_gate_exps.bias", np.ascontiguousarray(gub[:, ::2]), ftype)
            _emit(w, b + "ffn_up_exps.bias", np.ascontiguousarray(gub[:, 1::2]), ftype)
            down = get(p + "mlp.experts.down_proj").swapaxes(-1, -2)  # [E, H, F]
            _emit(w, b + "ffn_down_exps.weight", np.ascontiguousarray(down), ftype)
            _emit(w, b + "ffn_down_exps.bias", get(p + "mlp.experts.down_proj_bias"), ftype)
            continue
        if mtype in ("gemma2", "gemma3_text"):
            # post-norm set: post_attention -> attn_post, pre_ff -> ffn_norm
            emit_norm(b + "attn_post_norm.weight", p + "post_attention_layernorm.weight")
            emit_norm(b + "ffn_norm.weight", p + "pre_feedforward_layernorm.weight")
            emit_norm(b + "ffn_post_norm.weight", p + "post_feedforward_layernorm.weight")
        elif mtype in ("olmo2", "exaone4"):
            # norm-after archs: no pre-norms at all
            emit_norm(b + "attn_post_norm.weight", p + "post_attention_layernorm.weight")
            emit_norm(b + "ffn_post_norm.weight", p + "post_feedforward_layernorm.weight")
        elif mtype == "glm4":
            emit_norm(b + "attn_post_norm.weight", p + "post_self_attn_layernorm.weight")
            emit_norm(b + "ffn_norm.weight", p + "post_attention_layernorm.weight")
            emit_norm(b + "ffn_post_norm.weight", p + "post_mlp_layernorm.weight")
        elif mtype in ("cohere", "cohere2"):
            pass  # shared pre-norm only (parallel residual)
        else:
            emit_norm(b + "ffn_norm.weight", p + "post_attention_layernorm.weight")
            if get(p + "post_attention_layernorm.bias") is not None:
                _emit(w, b + "ffn_norm.bias",
                      get(p + "post_attention_layernorm.bias"), ftype)
        if mtype == "glm4":
            gu = get(p + "mlp.gate_up_proj.weight")
            nf = gu.shape[0] // 2
            _emit(w, b + "ffn_gate.weight", np.ascontiguousarray(gu[:nf]), ftype)
            _emit(w, b + "ffn_up.weight", np.ascontiguousarray(gu[nf:]), ftype)
            _emit(w, b + "ffn_down.weight", get(p + "mlp.down_proj.weight"), ftype)
            continue
        if mtype == "starcoder2":
            _emit(w, b + "ffn_up.weight", get(p + "mlp.c_fc.weight"), ftype)
            _emit(w, b + "ffn_up.bias", get(p + "mlp.c_fc.bias"), ftype)
            _emit(w, b + "ffn_down.weight", get(p + "mlp.c_proj.weight"), ftype)
            _emit(w, b + "ffn_down.bias", get(p + "mlp.c_proj.bias"), ftype)
            continue
        if mtype in ("nemotron", "arcee", "apertus"):
            _emit(w, b + "ffn_up.weight", get(p + "mlp.up_proj.weight"), ftype)
            _emit(w, b + "ffn_down.weight", get(p + "mlp.down_proj.weight"), ftype)
            continue
        if mtype == "llama4_text":
            ff = p + "feed_forward."
            if ff + "router.weight" in sd:
                _emit(w, b + "ffn_gate_inp.weight", get(ff + "router.weight"), ftype)
                gu = get(ff + "experts.gate_up_proj").swapaxes(-1, -2)  # [E, 2F, H]
                nf2 = gu.shape[1] // 2
                _emit(w, b + "ffn_gate_exps.weight",
                      np.ascontiguousarray(gu[:, :nf2]), ftype)
                _emit(w, b + "ffn_up_exps.weight",
                      np.ascontiguousarray(gu[:, nf2:]), ftype)
                _emit(w, b + "ffn_down_exps.weight",
                      np.ascontiguousarray(get(ff + "experts.down_proj").swapaxes(-1, -2)), ftype)
                _emit(w, b + "ffn_gate_shexp.weight", get(ff + "shared_expert.gate_proj.weight"), ftype)
                _emit(w, b + "ffn_up_shexp.weight", get(ff + "shared_expert.up_proj.weight"), ftype)
                _emit(w, b + "ffn_down_shexp.weight", get(ff + "shared_expert.down_proj.weight"), ftype)
            else:
                _emit(w, b + "ffn_gate.weight", get(ff + "gate_proj.weight"), ftype)
                _emit(w, b + "ffn_up.weight", get(ff + "up_proj.weight"), ftype)
                _emit(w, b + "ffn_down.weight", get(ff + "down_proj.weight"), ftype)
            continue
        if mtype in ("qwen3_moe", "olmoe"):
            moe = p + "mlp."
            _emit(w, b + "ffn_gate_inp.weight", get(moe + "gate.weight"), ftype)
            n_exp = cfg.num_experts
            for part, hf in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
                stack = np.stack([get(moe + f"experts.{e}.{hf}.weight")
                                  for e in range(n_exp)])
                _emit(w, b + f"ffn_{part}_exps.weight", stack, ftype)
            continue
        if mtype == "qwen2_moe":
            moe = p + "mlp."
            _emit(w, b + "ffn_gate_inp.weight", get(moe + "gate.weight"), ftype)
            n_exp = cfg.num_experts
            for part, hf in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
                stack = np.stack([get(moe + f"experts.{e}.{hf}.weight")
                                  for e in range(n_exp)])
                _emit(w, b + f"ffn_{part}_exps.weight", stack, ftype)
            _emit(w, b + "ffn_gate_shexp.weight", get(moe + "shared_expert.gate_proj.weight"), ftype)
            _emit(w, b + "ffn_up_shexp.weight", get(moe + "shared_expert.up_proj.weight"), ftype)
            _emit(w, b + "ffn_down_shexp.weight", get(moe + "shared_expert.down_proj.weight"), ftype)
            _emit(w, b + "ffn_gate_inp_shexp.weight", get(moe + "shared_expert_gate.weight"), ftype)
            continue
        if mtype == "granitemoe":
            moe = p + "block_sparse_moe."
            _emit(w, b + "ffn_gate_inp.weight", get(moe + "router.layer.weight"), ftype)
            il_w = get(moe + "input_linear.weight")  # [E, 2*ff, d]: gate; up
            ff2 = il_w.shape[1] // 2
            _emit(w, b + "ffn_gate_exps.weight",
                  np.ascontiguousarray(il_w[:, :ff2]), ftype)
            _emit(w, b + "ffn_up_exps.weight",
                  np.ascontiguousarray(il_w[:, ff2:]), ftype)
            _emit(w, b + "ffn_down_exps.weight",
                  get(moe + "output_linear.weight"), ftype)  # [E, d, ff]
            continue
        if (mtype in ("dots1", "glm4_moe", "ernie4_5_moe")
                and get(p + "mlp.gate.weight") is not None):
            moe = p + "mlp."
            _emit(w, b + "ffn_gate_inp.weight", get(moe + "gate.weight"), ftype)
            pb = get(moe + "gate.e_score_correction_bias")
            if pb is None:  # ernie stores it under moe_statics
                pb = get(moe + "moe_statics.e_score_correction_bias")
            if pb is not None:
                _emit(w, b + "exp_probs_b.bias", pb.reshape(-1), ftype)
            n_exp = (getattr(cfg, "n_routed_experts", 0)
                     or getattr(cfg, "moe_num_experts", 0))
            for part, hf in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
                stack = np.stack([get(moe + f"experts.{e}.{hf}.weight")
                                  for e in range(n_exp)])
                _emit(w, b + f"ffn_{part}_exps.weight", stack, ftype)
            if get(moe + "shared_experts.gate_proj.weight") is not None:
                _emit(w, b + "ffn_gate_shexp.weight", get(moe + "shared_experts.gate_proj.weight"), ftype)
                _emit(w, b + "ffn_up_shexp.weight", get(moe + "shared_experts.up_proj.weight"), ftype)
                _emit(w, b + "ffn_down_shexp.weight", get(moe + "shared_experts.down_proj.weight"), ftype)
            continue
        if mtype in ("mixtral", "phimoe"):
            moe = p + "block_sparse_moe."
            _emit(w, b + "ffn_gate_inp.weight", get(moe + "gate.weight"), ftype)
            if get(moe + "gate.weight") is None:  # phimoe router name
                _emit(w, b + "ffn_gate_inp.weight", get(moe + "router.weight"), ftype)
            gates = np.stack([get(moe + f"experts.{e}.w1.weight") for e in range(cfg.num_local_experts)])
            downs = np.stack([get(moe + f"experts.{e}.w2.weight") for e in range(cfg.num_local_experts)])
            ups = np.stack([get(moe + f"experts.{e}.w3.weight") for e in range(cfg.num_local_experts)])
            _emit(w, b + "ffn_gate_exps.weight", gates, ftype)
            _emit(w, b + "ffn_down_exps.weight", downs, ftype)
            _emit(w, b + "ffn_up_exps.weight", ups, ftype)
        else:
            _emit(w, b + "ffn_gate.weight", get(p + "mlp.gate_proj.weight"), ftype)
            _emit(w, b + "ffn_up.weight", get(p + "mlp.up_proj.weight"), ftype)
            _emit(w, b + "ffn_down.weight", get(p + "mlp.down_proj.weight"), ftype)

    w.write(out_path)
    return out_path




def _convert_gemma3n(model, out_path: str, ftype: str, tokenizer=None,
                     vocab_override=None) -> str:
    """Gemma 3n HF -> GGUF (altup/laurel/per-layer-embd tensor zoo of
    reference llama-arch.cpp:483-497; hparams gemma3n.cpp:3-21)."""
    from statistics import NormalDist

    cfg = model.config
    if hasattr(cfg, "text_config"):
        cfg = cfg.text_config
    n_embd = cfg.hidden_size
    head_dim = cfg.head_dim
    L = cfg.num_hidden_layers
    inter = cfg.intermediate_size
    inter0 = inter[0] if isinstance(inter, (list, tuple)) else inter
    layer_types = list(getattr(cfg, "layer_types", []) or [])
    # swa period: index of the first full-attention layer + 1
    pattern = 5
    for i, t in enumerate(layer_types):
        if t == "full_attention":
            pattern = i + 1
            break

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "gemma3n")
    w.add(Keys.General.NAME, getattr(cfg, "name_or_path", "") or "gemma3n")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "gemma3n."
    w.add(P + "block_count", np.uint32(L))
    w.add(P + "context_length",
          np.uint32(getattr(cfg, "max_position_embeddings", 32768)))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(inter0))
    w.add(P + "attention.head_count", np.uint32(cfg.num_attention_heads))
    w.add(P + "attention.head_count_kv", np.uint32(cfg.num_key_value_heads))
    w.add(P + "attention.key_length", np.uint32(head_dim))
    w.add(P + "attention.value_length", np.uint32(head_dim))
    w.add(P + "attention.layer_norm_rms_epsilon", float(cfg.rms_norm_eps))
    w.add(P + "attention.sliding_window", np.uint32(cfg.sliding_window))
    w.add(P + "attention.sliding_window_pattern", np.uint32(pattern))
    w.add(P + "attention.shared_kv_layers",
          np.uint32(getattr(cfg, "num_kv_shared_layers", 0)))
    w.add(P + "rope.freq_base", float(cfg.rope_theta))
    w.add(P + "rope.freq_base_swa",
          float(getattr(cfg, "rope_local_base_freq", 10000.0)))
    w.add(P + "rope.dimension_count", np.uint32(head_dim))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    w.add(P + "altup.num_inputs", np.uint32(cfg.altup_num_inputs))
    w.add(P + "altup.active_idx", np.uint32(cfg.altup_active_idx))
    w.add(P + "embedding_length_per_layer_input",
          np.uint32(cfg.hidden_size_per_layer_input))
    sp = list(getattr(cfg, "activation_sparsity_pattern", None)
              or [0.0] * L)
    nd = NormalDist()
    w.add(P + "activation_sparsity_scale",
          np.asarray([nd.inv_cdf(v) if v > 0 else 0.0 for v in sp],
                     dtype=np.float32))
    if getattr(cfg, "final_logit_softcapping", None):
        w.add(P + "final_logit_softcapping",
              float(cfg.final_logit_softcapping))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items()}
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def get(name):
        return sd[pre + name]

    _emit(w, "token_embd.weight", get("embed_tokens.weight"), ftype)
    _emit(w, "per_layer_token_embd.weight",
          get("embed_tokens_per_layer.weight"), ftype)
    _emit(w, "per_layer_model_proj.weight",
          get("per_layer_model_projection.weight"), ftype)
    _emit(w, "per_layer_proj_norm.weight",
          get("per_layer_projection_norm.weight"), ftype)
    A = cfg.altup_num_inputs
    _emit(w, "altup_proj.weight",
          np.stack([get(f"altup_projections.{i}.weight")
                    for i in range(A - 1)]), ftype)
    _emit(w, "altup_unembd_proj.weight",
          np.stack([get(f"altup_unembed_projections.{i}.weight")
                    for i in range(A - 1)]), ftype)
    _emit(w, "output_norm.weight", get("norm.weight"), ftype)

    for i in range(L):
        p = f"layers.{i}."
        b = f"blk.{i}."
        _emit(w, b + "attn_norm.weight", get(p + "input_layernorm.weight"), ftype)
        _emit(w, b + "attn_q.weight", get(p + "self_attn.q_proj.weight"), ftype)
        _emit(w, b + "attn_k.weight", get(p + "self_attn.k_proj.weight"), ftype)
        _emit(w, b + "attn_v.weight", get(p + "self_attn.v_proj.weight"), ftype)
        _emit(w, b + "attn_output.weight", get(p + "self_attn.o_proj.weight"), ftype)
        _emit(w, b + "attn_q_norm.weight", get(p + "self_attn.q_norm.weight"), ftype)
        _emit(w, b + "attn_k_norm.weight", get(p + "self_attn.k_norm.weight"), ftype)
        _emit(w, b + "post_attention_norm.weight",
              get(p + "post_attention_layernorm.weight"), ftype)
        _emit(w, b + "ffn_norm.weight",
              get(p + "pre_feedforward_layernorm.weight"), ftype)
        _emit(w, b + "post_ffw_norm.weight",
              get(p + "post_feedforward_layernorm.weight"), ftype)
        _emit(w, b + "ffn_gate.weight", get(p + "mlp.gate_proj.weight"), ftype)
        _emit(w, b + "ffn_up.weight", get(p + "mlp.up_proj.weight"), ftype)
        _emit(w, b + "ffn_down.weight", get(p + "mlp.down_proj.weight"), ftype)
        _emit(w, b + "altup_correct_coef.weight",
              get(p + "altup.correction_coefs.weight"), ftype)
        _emit(w, b + "altup_predict_coef.weight",
              get(p + "altup.prediction_coefs.weight"), ftype)
        _emit(w, b + "altup_router.weight",
              get(p + "altup.modality_router.weight"), ftype)
        _emit(w, b + "altup_router_norm.weight",
              get(p + "altup.router_norm.weight"), ftype)
        _emit(w, b + "altup_correct_scale.weight",
              get(p + "altup.correct_output_scale"), ftype)
        _emit(w, b + "laurel_l.weight",
              get(p + "laurel.linear_left.weight"), ftype)
        _emit(w, b + "laurel_r.weight",
              get(p + "laurel.linear_right.weight"), ftype)
        _emit(w, b + "laurel_post_norm.weight",
              get(p + "laurel.post_laurel_norm.weight"), ftype)
        _emit(w, b + "inp_gate.weight",
              get(p + "per_layer_input_gate.weight"), ftype)
        _emit(w, b + "proj.weight",
              get(p + "per_layer_projection.weight"), ftype)
        _emit(w, b + "post_norm.weight",
              get(p + "post_per_layer_input_norm.weight"), ftype)

    w.write(out_path)
    return out_path



def _convert_mamba(model, out_path: str, ftype: str, tokenizer=None,
                   vocab_override=None) -> str:
    """Mamba-1/FalconMamba HF -> GGUF (reference conversion/mamba.py:
    A = -exp(A_log), conv1d weight squeezed to [d_inner, d_conv])."""
    cfg = model.config
    d_model = cfg.hidden_size
    d_conv = getattr(cfg, "conv_kernel", 4)
    d_inner = getattr(cfg, "intermediate_size", 2 * d_model)
    d_state = getattr(cfg, "state_size", 16)
    dt_rank = getattr(cfg, "time_step_rank", None)
    if dt_rank is None or dt_rank == "auto":
        dt_rank = -(d_model // -16)

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "mamba")
    w.add(Keys.General.NAME, getattr(cfg, "name_or_path", "") or "mamba")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "mamba."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(1 << 20))
    w.add(P + "embedding_length", np.uint32(d_model))
    w.add(P + "feed_forward_length", np.uint32(0))
    w.add(P + "attention.head_count", np.uint32(0))
    w.add(P + "attention.layer_norm_rms_epsilon",
          float(getattr(cfg, "layer_norm_epsilon", 1e-5)))
    w.add(P + "ssm.conv_kernel", np.uint32(d_conv))
    w.add(P + "ssm.inner_size", np.uint32(d_inner))
    w.add(P + "ssm.state_size", np.uint32(d_state))
    w.add(P + "ssm.time_step_rank", np.uint32(int(dt_rank)))
    w.add(P + "ssm.dt_b_c_rms", bool(cfg.model_type == "falcon_mamba"))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}

    def get(name):
        return sd[name]

    emb = get("backbone.embeddings.weight")
    _emit(w, "token_embd.weight", emb, ftype)
    _emit(w, "output_norm.weight", get("backbone.norm_f.weight"), ftype)
    lm_head = sd.get("lm_head.weight")
    if lm_head is not None and not np.array_equal(lm_head, emb):
        _emit(w, "output.weight", lm_head, ftype)

    for i in range(cfg.num_hidden_layers):
        p = f"backbone.layers.{i}."
        b = f"blk.{i}."
        _emit(w, b + "attn_norm.weight", get(p + "norm.weight"), ftype)
        _emit(w, b + "ssm_in.weight", get(p + "mixer.in_proj.weight"), ftype)
        _emit(w, b + "ssm_conv1d.weight",
              get(p + "mixer.conv1d.weight").squeeze(1), ftype)
        if p + "mixer.conv1d.bias" in sd:
            _emit(w, b + "ssm_conv1d.bias", get(p + "mixer.conv1d.bias"), ftype)
        _emit(w, b + "ssm_x.weight", get(p + "mixer.x_proj.weight"), ftype)
        _emit(w, b + "ssm_dt.weight", get(p + "mixer.dt_proj.weight"), ftype)
        _emit(w, b + "ssm_dt.bias", get(p + "mixer.dt_proj.bias"), ftype)
        _emit(w, b + "ssm_a", -np.exp(get(p + "mixer.A_log")), ftype)
        _emit(w, b + "ssm_d", get(p + "mixer.D"), ftype)
        _emit(w, b + "ssm_out.weight", get(p + "mixer.out_proj.weight"), ftype)

    w.write(out_path)
    return out_path


def _neox_qkv_fix(w: np.ndarray, n_head: int, head_dim: int) -> np.ndarray:
    """[n_head, 3, head_dim, ...] interleaved -> [Q;K;V] contiguous blocks
    (reference conversion/gptneox.py modify_tensors)."""
    tail = w.shape[1:] if w.ndim > 1 else ()
    g = w.reshape(n_head, 3, head_dim, *tail)
    return np.concatenate(
        [g[:, 0].reshape(-1, *tail), g[:, 1].reshape(-1, *tail),
         g[:, 2].reshape(-1, *tail)], axis=0)


def _convert_ln_family(model, arch: str, out_path: str, ftype: str,
                       tokenizer=None, vocab_override=None) -> str:
    """gpt2 / gptneox / bloom / phi2 — LayerNorm families with fused or
    biased projections (reference conversion/{gpt2,gptneox,bloom}.py)."""
    cfg = model.config
    n_layer = cfg.num_hidden_layers if hasattr(cfg, "num_hidden_layers") else cfg.n_layer
    n_embd = getattr(cfg, "hidden_size", None) or cfg.n_embd
    n_head = getattr(cfg, "num_attention_heads", None) or cfg.n_head
    head_dim = n_embd // n_head
    n_ff = getattr(cfg, "intermediate_size", None) or getattr(cfg, "n_inner", None) or 4 * n_embd
    n_ctx = getattr(cfg, "max_position_embeddings", None) or getattr(cfg, "n_positions", 2048)
    eps = getattr(cfg, "layer_norm_epsilon", None) or getattr(cfg, "layer_norm_eps", 1e-5)

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, getattr(cfg, "name_or_path", "") or arch)
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = f"{arch}."
    w.add(P + "block_count", np.uint32(n_layer))
    w.add(P + "context_length", np.uint32(n_ctx))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(n_ff))
    w.add(P + "attention.head_count", np.uint32(n_head))
    w.add(P + "attention.head_count_kv", np.uint32(n_head))
    w.add(P + "attention.layer_norm_epsilon", float(eps))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if arch == "gptneox":
        w.add(P + "rope.freq_base", float(getattr(cfg, "rotary_emb_base", 10000.0)))
        w.add(P + "rope.dimension_count",
              np.uint32(int(head_dim * getattr(cfg, "rotary_pct", 1.0))))
        w.add(P + "use_parallel_residual",
              bool(getattr(cfg, "use_parallel_residual", True)))
    if arch == "phi2":
        w.add(P + "rope.freq_base", float(getattr(cfg, "rope_theta", 10000.0)))
        w.add(P + "rope.dimension_count",
              np.uint32(int(head_dim * getattr(cfg, "partial_rotary_factor", 1.0))))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}

    def E(name, arr):
        _emit(w, name, arr, ftype)

    if arch == "gpt2":
        E("token_embd.weight", sd["transformer.wte.weight"])
        E("position_embd.weight", sd["transformer.wpe.weight"])
        E("output_norm.weight", sd["transformer.ln_f.weight"])
        E("output_norm.bias", sd["transformer.ln_f.bias"])
        for i in range(n_layer):
            p, b = f"transformer.h.{i}.", f"blk.{i}."
            E(b + "attn_norm.weight", sd[p + "ln_1.weight"])
            E(b + "attn_norm.bias", sd[p + "ln_1.bias"])
            E(b + "attn_qkv.weight", sd[p + "attn.c_attn.weight"].T)
            E(b + "attn_qkv.bias", sd[p + "attn.c_attn.bias"])
            E(b + "attn_output.weight", sd[p + "attn.c_proj.weight"].T)
            E(b + "attn_output.bias", sd[p + "attn.c_proj.bias"])
            E(b + "ffn_norm.weight", sd[p + "ln_2.weight"])
            E(b + "ffn_norm.bias", sd[p + "ln_2.bias"])
            E(b + "ffn_up.weight", sd[p + "mlp.c_fc.weight"].T)
            E(b + "ffn_up.bias", sd[p + "mlp.c_fc.bias"])
            E(b + "ffn_down.weight", sd[p + "mlp.c_proj.weight"].T)
            E(b + "ffn_down.bias", sd[p + "mlp.c_proj.bias"])
    elif arch == "gptneox":
        E("token_embd.weight", sd["gpt_neox.embed_in.weight"])
        E("output_norm.weight", sd["gpt_neox.final_layer_norm.weight"])
        E("output_norm.bias", sd["gpt_neox.final_layer_norm.bias"])
        E("output.weight", sd["embed_out.weight"])
        for i in range(n_layer):
            p, b = f"gpt_neox.layers.{i}.", f"blk.{i}."
            E(b + "attn_norm.weight", sd[p + "input_layernorm.weight"])
            E(b + "attn_norm.bias", sd[p + "input_layernorm.bias"])
            E(b + "attn_qkv.weight",
              _neox_qkv_fix(sd[p + "attention.query_key_value.weight"], n_head, head_dim))
            E(b + "attn_qkv.bias",
              _neox_qkv_fix(sd[p + "attention.query_key_value.bias"], n_head, head_dim))
            E(b + "attn_output.weight", sd[p + "attention.dense.weight"])
            E(b + "attn_output.bias", sd[p + "attention.dense.bias"])
            E(b + "ffn_norm.weight", sd[p + "post_attention_layernorm.weight"])
            E(b + "ffn_norm.bias", sd[p + "post_attention_layernorm.bias"])
            E(b + "ffn_up.weight", sd[p + "mlp.dense_h_to_4h.weight"])
            E(b + "ffn_up.bias", sd[p + "mlp.dense_h_to_4h.bias"])
            E(b + "ffn_down.weight", sd[p + "mlp.dense_4h_to_h.weight"])
            E(b + "ffn_down.bias", sd[p + "mlp.dense_4h_to_h.bias"])
    elif arch == "bloom":
        E("token_embd.weight", sd["transformer.word_embeddings.weight"])
        E("token_embd_norm.weight", sd["transformer.word_embeddings_layernorm.weight"])
        E("token_embd_norm.bias", sd["transformer.word_embeddings_layernorm.bias"])
        E("output_norm.weight", sd["transformer.ln_f.weight"])
        E("output_norm.bias", sd["transformer.ln_f.bias"])
        for i in range(n_layer):
            p, b = f"transformer.h.{i}.", f"blk.{i}."
            E(b + "attn_norm.weight", sd[p + "input_layernorm.weight"])
            E(b + "attn_norm.bias", sd[p + "input_layernorm.bias"])
            E(b + "attn_qkv.weight",
              _neox_qkv_fix(sd[p + "self_attention.query_key_value.weight"], n_head, head_dim))
            E(b + "attn_qkv.bias",
              _neox_qkv_fix(sd[p + "self_attention.query_key_value.bias"], n_head, head_dim))
            E(b + "attn_output.weight", sd[p + "self_attention.dense.weight"])
            E(b + "attn_output.bias", sd[p + "self_attention.dense.bias"])
            E(b + "ffn_norm.weight", sd[p + "post_attention_layernorm.weight"])
            E(b + "ffn_norm.bias", sd[p + "post_attention_layernorm.bias"])
            E(b + "ffn_up.weight", sd[p + "mlp.dense_h_to_4h.weight"])
            E(b + "ffn_up.bias", sd[p + "mlp.dense_h_to_4h.bias"])
            E(b + "ffn_down.weight", sd[p + "mlp.dense_4h_to_h.weight"])
            E(b + "ffn_down.bias", sd[p + "mlp.dense_4h_to_h.bias"])
    elif arch == "phi2":
        E("token_embd.weight", sd["model.embed_tokens.weight"])
        E("output_norm.weight", sd["model.final_layernorm.weight"])
        E("output_norm.bias", sd["model.final_layernorm.bias"])
        E("output.weight", sd["lm_head.weight"])
        E("output.bias", sd["lm_head.bias"])
        for i in range(n_layer):
            p, b = f"model.layers.{i}.", f"blk.{i}."
            E(b + "attn_norm.weight", sd[p + "input_layernorm.weight"])
            E(b + "attn_norm.bias", sd[p + "input_layernorm.bias"])
            for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                           ("v_proj", "attn_v"), ("dense", "attn_output")):
                E(b + f"{gg}.weight", sd[p + f"self_attn.{hf}.weight"])
                E(b + f"{gg}.bias", sd[p + f"self_attn.{hf}.bias"])
            E(b + "ffn_up.weight", sd[p + "mlp.fc1.weight"])
            E(b + "ffn_up.bias", sd[p + "mlp.fc1.bias"])
            E(b + "ffn_down.weight", sd[p + "mlp.fc2.weight"])
            E(b + "ffn_down.bias", sd[p + "mlp.fc2.bias"])

    w.write(out_path)
    return out_path


def _convert_mamba2(model, out_path: str, ftype: str, tokenizer=None,
                    vocab_override=None) -> str:
    """Mamba-2 HF -> GGUF (reference conversion/mamba.py Mamba2Model:
    A/D unsqueezed to [nh,1], norm reshaped to [n_group, d_inner/n_group])."""
    cfg = model.config
    d_model = cfg.hidden_size
    d_conv = getattr(cfg, "conv_kernel", 4)
    expand = getattr(cfg, "expand", 2)
    d_inner = getattr(cfg, "intermediate_size", None) or expand * d_model
    d_state = getattr(cfg, "state_size", 128)
    head_dim = getattr(cfg, "head_dim", 64)
    n_group = getattr(cfg, "n_groups", 1)
    nh = d_inner // head_dim

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "mamba2")
    w.add(Keys.General.NAME, getattr(cfg, "name_or_path", "") or "mamba2")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "mamba2."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(1 << 20))
    w.add(P + "embedding_length", np.uint32(d_model))
    w.add(P + "feed_forward_length", np.uint32(0))
    w.add(P + "attention.head_count", np.uint32(0))
    w.add(P + "attention.layer_norm_rms_epsilon",
          float(getattr(cfg, "layer_norm_epsilon", 1e-5)))
    w.add(P + "ssm.conv_kernel", np.uint32(d_conv))
    w.add(P + "ssm.inner_size", np.uint32(d_inner))
    w.add(P + "ssm.state_size", np.uint32(d_state))
    w.add(P + "ssm.time_step_rank", np.uint32(nh))
    w.add(P + "ssm.group_count", np.uint32(n_group))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    emb = sd["backbone.embeddings.weight"]
    _emit(w, "token_embd.weight", emb, ftype)
    _emit(w, "output_norm.weight", sd["backbone.norm_f.weight"], ftype)
    lm_head = sd.get("lm_head.weight")
    if lm_head is not None and not np.array_equal(lm_head, emb):
        _emit(w, "output.weight", lm_head, ftype)
    for i in range(cfg.num_hidden_layers):
        p, b = f"backbone.layers.{i}.", f"blk.{i}."
        _emit(w, b + "attn_norm.weight", sd[p + "norm.weight"], ftype)
        _emit(w, b + "ssm_in.weight", sd[p + "mixer.in_proj.weight"], ftype)
        _emit(w, b + "ssm_conv1d.weight", sd[p + "mixer.conv1d.weight"].squeeze(1), ftype)
        if p + "mixer.conv1d.bias" in sd:
            _emit(w, b + "ssm_conv1d.bias", sd[p + "mixer.conv1d.bias"], ftype)
        _emit(w, b + "ssm_dt.bias", sd[p + "mixer.dt_bias"], ftype)
        _emit(w, b + "ssm_a", -np.exp(sd[p + "mixer.A_log"]).reshape(-1, 1), ftype)
        _emit(w, b + "ssm_d", sd[p + "mixer.D"].reshape(-1, 1), ftype)
        _emit(w, b + "ssm_norm.weight",
              sd[p + "mixer.norm.weight"].reshape(n_group, d_inner // n_group), ftype)
        _emit(w, b + "ssm_out.weight", sd[p + "mixer.out_proj.weight"], ftype)
    w.write(out_path)
    return out_path


def _convert_jamba(model, out_path: str, ftype: str, tokenizer=None,
                   vocab_override=None) -> str:
    """Jamba hybrid HF -> GGUF (reference conversion/jamba.py): interleaved
    mamba/attention layers + optional per-layer MoE."""
    cfg = model.config
    d_model = cfg.hidden_size
    d_conv = cfg.mamba_d_conv
    d_state = cfg.mamba_d_state
    d_inner = cfg.mamba_expand * d_model
    dt_rank = cfg.mamba_dt_rank

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "jamba")
    w.add(Keys.General.NAME, getattr(cfg, "name_or_path", "") or "jamba")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "jamba."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(getattr(cfg, "max_position_embeddings", 2048)))
    w.add(P + "embedding_length", np.uint32(d_model))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(cfg.num_attention_heads))
    w.add(P + "attention.head_count_kv", np.uint32(cfg.num_key_value_heads))
    w.add(P + "attention.layer_norm_rms_epsilon", float(getattr(cfg, "rms_norm_eps", 1e-6)))
    w.add(P + "ssm.conv_kernel", np.uint32(d_conv))
    w.add(P + "ssm.inner_size", np.uint32(d_inner))
    w.add(P + "ssm.state_size", np.uint32(d_state))
    w.add(P + "ssm.time_step_rank", np.uint32(dt_rank))
    if getattr(cfg, "num_experts", 1) > 1:
        w.add(P + "expert_count", np.uint32(cfg.num_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    emb = sd["model.embed_tokens.weight"]
    _emit(w, "token_embd.weight", emb, ftype)
    _emit(w, "output_norm.weight", sd["model.final_layernorm.weight"], ftype)
    lm_head = sd.get("lm_head.weight")
    if lm_head is not None and not getattr(cfg, "tie_word_embeddings", False):
        _emit(w, "output.weight", lm_head, ftype)

    for i in range(cfg.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        _emit(w, b + "attn_norm.weight", sd[p + "input_layernorm.weight"], ftype)
        _emit(w, b + "ffn_norm.weight", sd[p + "pre_ff_layernorm.weight"], ftype)
        if p + "mamba.in_proj.weight" in sd:
            m = p + "mamba."
            _emit(w, b + "ssm_in.weight", sd[m + "in_proj.weight"], ftype)
            _emit(w, b + "ssm_conv1d.weight", sd[m + "conv1d.weight"].squeeze(1), ftype)
            if m + "conv1d.bias" in sd:
                _emit(w, b + "ssm_conv1d.bias", sd[m + "conv1d.bias"], ftype)
            _emit(w, b + "ssm_x.weight", sd[m + "x_proj.weight"], ftype)
            _emit(w, b + "ssm_dt.weight", sd[m + "dt_proj.weight"], ftype)
            _emit(w, b + "ssm_dt.bias", sd[m + "dt_proj.bias"], ftype)
            _emit(w, b + "ssm_a", -np.exp(sd[m + "A_log"]), ftype)
            _emit(w, b + "ssm_d", sd[m + "D"], ftype)
            _emit(w, b + "ssm_out.weight", sd[m + "out_proj.weight"], ftype)
            _emit(w, b + "ssm_dt_norm.weight", sd[m + "dt_layernorm.weight"], ftype)
            _emit(w, b + "ssm_b_norm.weight", sd[m + "b_layernorm.weight"], ftype)
            _emit(w, b + "ssm_c_norm.weight", sd[m + "c_layernorm.weight"], ftype)
        else:
            for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                           ("v_proj", "attn_v"), ("o_proj", "attn_output")):
                _emit(w, b + f"{gg}.weight", sd[p + f"self_attn.{hf}.weight"], ftype)
        ff = p + "feed_forward."
        if ff + "router.weight" in sd:
            _emit(w, b + "ffn_gate_inp.weight", sd[ff + "router.weight"], ftype)
            n_exp = cfg.num_experts
            for part in ("gate", "up", "down"):
                stack = np.stack([sd[ff + f"experts.{e}.{part}_proj.weight"]
                                  for e in range(n_exp)])
                _emit(w, b + f"ffn_{part}_exps.weight", stack, ftype)
        else:
            _emit(w, b + "ffn_gate.weight", sd[ff + "gate_proj.weight"], ftype)
            _emit(w, b + "ffn_up.weight", sd[ff + "up_proj.weight"], ftype)
            _emit(w, b + "ffn_down.weight", sd[ff + "down_proj.weight"], ftype)

    w.write(out_path)
    return out_path


def _convert_deepseek2(model, out_path: str, ftype: str, tokenizer=None,
                       vocab_override=None) -> str:
    """DeepSeek-V2/V3 MLA HF -> GGUF (reference conversion/deepseek.py
    DeepseekV2Model): latent-attention projections kept whole; *_mla head
    dims recorded alongside the compressed key length."""
    cfg = model.config
    qk_nope = cfg.qk_nope_head_dim
    qk_rope = cfg.qk_rope_head_dim
    v_dim = cfg.v_head_dim
    kv_lora = cfg.kv_lora_rank
    q_lora = getattr(cfg, "q_lora_rank", None)

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "deepseek2")
    w.add(Keys.General.NAME, getattr(cfg, "name_or_path", "") or "deepseek2")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "deepseek2."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(getattr(cfg, "max_position_embeddings", 4096)))
    w.add(P + "embedding_length", np.uint32(cfg.hidden_size))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(cfg.num_attention_heads))
    w.add(P + "attention.head_count_kv", np.uint32(1))
    w.add(P + "attention.key_length", np.uint32(kv_lora + qk_rope))
    w.add(P + "attention.value_length", np.uint32(kv_lora))
    w.add(P + "attention.key_length_mla", np.uint32(qk_nope + qk_rope))
    w.add(P + "attention.value_length_mla", np.uint32(v_dim))
    w.add(P + "attention.kv_lora_rank", np.uint32(kv_lora))
    if q_lora:
        w.add(P + "attention.q_lora_rank", np.uint32(q_lora))
    w.add(P + "attention.layer_norm_rms_epsilon",
          float(getattr(cfg, "rms_norm_eps", 1e-6)))
    w.add(P + "rope.freq_base", float(getattr(cfg, "rope_theta", 10000.0)))
    w.add(P + "rope.dimension_count", np.uint32(qk_rope))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if getattr(cfg, "n_routed_experts", 0):
        w.add(P + "expert_count", np.uint32(cfg.n_routed_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.moe_intermediate_size))
        w.add(P + "expert_shared_count", np.uint32(getattr(cfg, "n_shared_experts", 0) or 0))
        w.add(P + "expert_weights_scale", float(getattr(cfg, "routed_scaling_factor", 1.0)))
        w.add(P + "expert_weights_norm", bool(getattr(cfg, "norm_topk_prob", False)))
        w.add(P + "expert_gating_func",
              np.uint32(1 if getattr(cfg, "scoring_func", "softmax") == "softmax" else 2))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    _emit(w, "token_embd.weight", sd["model.embed_tokens.weight"], ftype)
    _emit(w, "output_norm.weight", sd["model.norm.weight"], ftype)
    if not getattr(cfg, "tie_word_embeddings", False):
        _emit(w, "output.weight", sd["lm_head.weight"], ftype)

    for i in range(cfg.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        _emit(w, b + "attn_norm.weight", sd[p + "input_layernorm.weight"], ftype)
        _emit(w, b + "ffn_norm.weight", sd[p + "post_attention_layernorm.weight"], ftype)
        sa = p + "self_attn."
        if sa + "q_a_proj.weight" in sd:
            _emit(w, b + "attn_q_a.weight", sd[sa + "q_a_proj.weight"], ftype)
            _emit(w, b + "attn_q_a_norm.weight", sd[sa + "q_a_layernorm.weight"], ftype)
            _emit(w, b + "attn_q_b.weight", sd[sa + "q_b_proj.weight"], ftype)
        else:
            _emit(w, b + "attn_q.weight", sd[sa + "q_proj.weight"], ftype)
        _emit(w, b + "attn_kv_a_mqa.weight", sd[sa + "kv_a_proj_with_mqa.weight"], ftype)
        _emit(w, b + "attn_kv_a_norm.weight", sd[sa + "kv_a_layernorm.weight"], ftype)
        _emit(w, b + "attn_kv_b.weight", sd[sa + "kv_b_proj.weight"], ftype)
        _emit(w, b + "attn_output.weight", sd[sa + "o_proj.weight"], ftype)
        mlp = p + "mlp."
        if mlp + "gate.weight" in sd:
            _emit(w, b + "ffn_gate_inp.weight", sd[mlp + "gate.weight"], ftype)
            if mlp + "gate.e_score_correction_bias" in sd:  # deepseek-v3
                _emit(w, b + "exp_probs_b.bias",
                      sd[mlp + "gate.e_score_correction_bias"], ftype)
            n_exp = cfg.n_routed_experts
            for part in ("gate", "up", "down"):
                stack = np.stack([sd[mlp + f"experts.{e}.{part}_proj.weight"]
                                  for e in range(n_exp)])
                _emit(w, b + f"ffn_{part}_exps.weight", stack, ftype)
            if mlp + "shared_experts.gate_proj.weight" in sd:
                _emit(w, b + "ffn_gate_shexp.weight", sd[mlp + "shared_experts.gate_proj.weight"], ftype)
                _emit(w, b + "ffn_up_shexp.weight", sd[mlp + "shared_experts.up_proj.weight"], ftype)
                _emit(w, b + "ffn_down_shexp.weight", sd[mlp + "shared_experts.down_proj.weight"], ftype)
        else:
            _emit(w, b + "ffn_gate.weight", sd[mlp + "gate_proj.weight"], ftype)
            _emit(w, b + "ffn_up.weight", sd[mlp + "up_proj.weight"], ftype)
            _emit(w, b + "ffn_down.weight", sd[mlp + "down_proj.weight"], ftype)
    w.write(out_path)
    return out_path


def _convert_bert(model, out_path: str, ftype: str, tokenizer=None,
                  vocab_override=None) -> str:
    """BERT encoder HF -> GGUF (reference conversion/bert.py layout)."""
    cfg = model.config
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "bert")
    w.add(Keys.General.NAME, getattr(cfg, "name_or_path", "") or "bert")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "bert."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(cfg.max_position_embeddings))
    w.add(P + "embedding_length", np.uint32(cfg.hidden_size))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(cfg.num_attention_heads))
    w.add(P + "attention.layer_norm_epsilon", float(cfg.layer_norm_eps))
    w.add(P + "attention.causal", False)
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    w.add(P + "pooling_type", np.uint32(2))  # CLS
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    base = model
    for attr in ("bert", "roberta"):
        if hasattr(model, attr):
            base = getattr(model, attr)
    sd = {k: v.detach().cpu().float().numpy() for k, v in base.state_dict().items()}
    _emit(w, "token_embd.weight", sd["embeddings.word_embeddings.weight"], ftype)
    pos_w = sd["embeddings.position_embeddings.weight"]
    if cfg.model_type in ("roberta", "xlm-roberta"):
        # roberta position ids start at pad_token_id + 1: chop the offset
        # rows so position 0 lands on the first used row (reference
        # conversion/bert.py RobertaModel._position_offset)
        pos_w = pos_w[int(cfg.pad_token_id) + 1:]
    _emit(w, "position_embd.weight", pos_w, ftype)
    _emit(w, "token_types.weight", sd["embeddings.token_type_embeddings.weight"], ftype)
    _emit(w, "token_embd_norm.weight", sd["embeddings.LayerNorm.weight"], ftype)
    _emit(w, "token_embd_norm.bias", sd["embeddings.LayerNorm.bias"], ftype)
    for i in range(cfg.num_hidden_layers):
        p, b = f"encoder.layer.{i}.", f"blk.{i}."
        for hf, gg in (("attention.self.query", "attn_q"),
                       ("attention.self.key", "attn_k"),
                       ("attention.self.value", "attn_v"),
                       ("attention.output.dense", "attn_output"),
                       ("intermediate.dense", "ffn_up"),
                       ("output.dense", "ffn_down")):
            _emit(w, b + gg + ".weight", sd[p + hf + ".weight"], ftype)
            _emit(w, b + gg + ".bias", sd[p + hf + ".bias"], ftype)
        _emit(w, b + "attn_output_norm.weight", sd[p + "attention.output.LayerNorm.weight"], ftype)
        _emit(w, b + "attn_output_norm.bias", sd[p + "attention.output.LayerNorm.bias"], ftype)
        _emit(w, b + "layer_output_norm.weight", sd[p + "output.LayerNorm.weight"], ftype)
        _emit(w, b + "layer_output_norm.bias", sd[p + "output.LayerNorm.bias"], ftype)
    w.write(out_path)
    return out_path


def _convert_t5(model, out_path: str, ftype: str, tokenizer=None,
                vocab_override=None) -> str:
    """T5/flan HF -> GGUF (reference conversion/t5.py): enc./dec. tensor
    namespaces; tied lm_head emitted pre-scaled by d_model**-0.5 (the HF
    tied-head convention, modeling_t5.py T5ForConditionalGeneration)."""
    cfg = model.config
    d = cfg.d_model
    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    enc_only = not any(k.startswith("decoder.") for k in sd)
    arch = "t5encoder" if enc_only else "t5"

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, "t5")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = arch + "."
    w.add(P + "block_count", np.uint32(cfg.num_layers))
    if not enc_only:
        w.add(P + "decoder_block_count",
              np.uint32(getattr(cfg, "num_decoder_layers", cfg.num_layers)))
        w.add(P + "decoder_start_token_id",
              np.uint32(getattr(cfg, "decoder_start_token_id", 0) or 0))
    w.add(P + "context_length", np.uint32(512))
    w.add(P + "embedding_length", np.uint32(d))
    w.add(P + "feed_forward_length", np.uint32(cfg.d_ff))
    w.add(P + "attention.head_count", np.uint32(cfg.num_heads))
    w.add(P + "attention.head_count_kv", np.uint32(cfg.num_heads))
    w.add(P + "attention.key_length", np.uint32(cfg.d_kv))
    w.add(P + "attention.value_length", np.uint32(cfg.d_kv))
    w.add(P + "attention.layer_norm_rms_epsilon", float(cfg.layer_norm_epsilon))
    w.add(P + "attention.relative_buckets_count",
          np.uint32(cfg.relative_attention_num_buckets))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    _emit(w, "token_embd.weight", sd["shared.weight"], ftype)
    tied = bool(getattr(cfg, "tie_word_embeddings", True))
    if not enc_only:
        if not tied and "lm_head.weight" in sd:
            _emit(w, "output.weight", sd["lm_head.weight"], ftype)
        else:  # tied head: HF scales the decoder output by d**-0.5
            _emit(w, "output.weight", sd["shared.weight"] * d ** -0.5, ftype)

    def ffn(src, dst):
        if src + "DenseReluDense.wi_0.weight" in sd:  # gated (flan)
            _emit(w, dst + "ffn_gate.weight", sd[src + "DenseReluDense.wi_0.weight"], ftype)
            _emit(w, dst + "ffn_up.weight", sd[src + "DenseReluDense.wi_1.weight"], ftype)
        else:
            _emit(w, dst + "ffn_up.weight", sd[src + "DenseReluDense.wi.weight"], ftype)
        _emit(w, dst + "ffn_down.weight", sd[src + "DenseReluDense.wo.weight"], ftype)
        _emit(w, dst + "ffn_norm.weight", sd[src + "layer_norm.weight"], ftype)

    _emit(w, "enc.output_norm.weight", sd["encoder.final_layer_norm.weight"], ftype)
    for i in range(cfg.num_layers):
        p, b = f"encoder.block.{i}.layer.", f"enc.blk.{i}."
        sa = p + "0.SelfAttention."
        for hf, gg in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v"), ("o", "attn_o")):
            _emit(w, b + gg + ".weight", sd[sa + hf + ".weight"], ftype)
        if sa + "relative_attention_bias.weight" in sd:
            _emit(w, b + "attn_rel_b.weight",
                  sd[sa + "relative_attention_bias.weight"], ftype)
        _emit(w, b + "attn_norm.weight", sd[p + "0.layer_norm.weight"], ftype)
        ffn(p + "1.", b)
    if enc_only:
        w.write(out_path)
        return out_path

    _emit(w, "dec.output_norm.weight", sd["decoder.final_layer_norm.weight"], ftype)
    for i in range(getattr(cfg, "num_decoder_layers", cfg.num_layers)):
        p, b = f"decoder.block.{i}.layer.", f"dec.blk.{i}."
        sa = p + "0.SelfAttention."
        for hf, gg in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v"), ("o", "attn_o")):
            _emit(w, b + gg + ".weight", sd[sa + hf + ".weight"], ftype)
        if sa + "relative_attention_bias.weight" in sd:
            _emit(w, b + "attn_rel_b.weight",
                  sd[sa + "relative_attention_bias.weight"], ftype)
        _emit(w, b + "attn_norm.weight", sd[p + "0.layer_norm.weight"], ftype)
        ca = p + "1.EncDecAttention."
        for hf, gg in (("q", "cross_attn_q"), ("k", "cross_attn_k"),
                       ("v", "cross_attn_v"), ("o", "cross_attn_o")):
            _emit(w, b + gg + ".weight", sd[ca + hf + ".weight"], ftype)
        _emit(w, b + "cross_attn_norm.weight", sd[p + "1.layer_norm.weight"], ftype)
        ffn(p + "2.", b)
    w.write(out_path)
    return out_path


def _convert_modernbert(model, out_path: str, ftype: str, tokenizer=None,
                        vocab_override=None) -> str:
    """ModernBERT HF -> GGUF: pre-norm encoder, fused Wqkv, GEGLU Wi."""
    cfg = model.config
    E = cfg.hidden_size
    n_head = cfg.num_attention_heads
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "modern-bert")
    w.add(Keys.General.NAME, "modern-bert")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "modern-bert."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(getattr(cfg, "max_position_embeddings", 8192)))
    w.add(P + "embedding_length", np.uint32(E))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(n_head))
    w.add(P + "attention.head_count_kv", np.uint32(n_head))
    w.add(P + "attention.layer_norm_epsilon", float(getattr(cfg, "norm_eps", 1e-5)))
    w.add(P + "attention.sliding_window", np.uint32(cfg.local_attention))
    w.add(P + "attention.sliding_window_pattern",
          np.uint32(cfg.global_attn_every_n_layers))
    w.add(P + "rope.freq_base", float(cfg.global_rope_theta))
    w.add(P + "rope.freq_base_swa", float(cfg.local_rope_theta))
    w.add(P + "rope.dimension_count", np.uint32(E // n_head))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)
    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pfx = "model." if "model.embeddings.tok_embeddings.weight" in sd else ""
    _emit(w, "token_embd.weight", sd[pfx + "embeddings.tok_embeddings.weight"], ftype)
    _emit(w, "token_embd_norm.weight", sd[pfx + "embeddings.norm.weight"], ftype)
    _emit(w, "output_norm.weight", sd[pfx + "final_norm.weight"], ftype)
    for i in range(cfg.num_hidden_layers):
        p, b = f"{pfx}layers.{i}.", f"blk.{i}."
        if p + "attn_norm.weight" in sd:
            _emit(w, b + "attn_norm.weight", sd[p + "attn_norm.weight"], ftype)
        _emit(w, b + "attn_qkv.weight", sd[p + "attn.Wqkv.weight"], ftype)
        _emit(w, b + "attn_output.weight", sd[p + "attn.Wo.weight"], ftype)
        _emit(w, b + "ffn_norm.weight", sd[p + "mlp_norm.weight"], ftype)
        _emit(w, b + "ffn_up.weight", sd[p + "mlp.Wi.weight"], ftype)
        _emit(w, b + "ffn_down.weight", sd[p + "mlp.Wo.weight"], ftype)
    w.write(out_path)
    return out_path


def _convert_qwen3next(model, out_path: str, ftype: str, tokenizer=None,
                       vocab_override=None) -> str:
    """Qwen3-Next HF -> GGUF: gated DeltaNet linear layers (raw qkvz/ba
    projections, conv, -exp(A_log)) + gated full-attention layers (q/gate
    de-interleaved per head); zero-centered norms emitted +1-folded."""
    cfg = model.config
    E = cfg.hidden_size
    Hk = cfg.linear_num_key_heads
    Hv = cfg.linear_num_value_heads
    Dk = cfg.linear_key_head_dim
    Dv = cfg.linear_value_head_dim
    d_inner = Hv * Dv
    hd = cfg.head_dim
    n_head = cfg.num_attention_heads

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "qwen3next")
    w.add(Keys.General.NAME, "qwen3next")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "qwen3next."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(getattr(cfg, "max_position_embeddings", 2048)))
    w.add(P + "embedding_length", np.uint32(E))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(n_head))
    w.add(P + "attention.head_count_kv", np.uint32(cfg.num_key_value_heads))
    w.add(P + "attention.key_length", np.uint32(hd))
    w.add(P + "attention.value_length", np.uint32(hd))
    w.add(P + "attention.layer_norm_rms_epsilon", float(cfg.rms_norm_eps))
    w.add(P + "rope.freq_base", float(getattr(cfg, "rope_theta", 10000.0)))
    w.add(P + "rope.dimension_count",
          np.uint32(int(hd * getattr(cfg, "partial_rotary_factor", 0.25))))
    w.add(P + "ssm.conv_kernel", np.uint32(cfg.linear_conv_kernel_dim))
    w.add(P + "ssm.inner_size", np.uint32(d_inner))
    w.add(P + "ssm.state_size", np.uint32(Dk))
    w.add(P + "ssm.time_step_rank", np.uint32(Hv))
    w.add(P + "ssm.group_count", np.uint32(Hk))
    if getattr(cfg, "num_experts", 0):
        w.add(P + "expert_count", np.uint32(cfg.num_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length",
              np.uint32(cfg.moe_intermediate_size))
        w.add(P + "expert_weights_norm", bool(getattr(cfg, "norm_topk_prob", True)))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    _emit(w, "token_embd.weight", sd["model.embed_tokens.weight"], ftype)
    _emit(w, "output_norm.weight", sd["model.norm.weight"] + 1.0, ftype)
    if not getattr(cfg, "tie_word_embeddings", False) and "lm_head.weight" in sd:
        _emit(w, "output.weight", sd["lm_head.weight"], ftype)

    for i in range(cfg.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        _emit(w, b + "attn_norm.weight", sd[p + "input_layernorm.weight"] + 1.0, ftype)
        _emit(w, b + "ffn_norm.weight",
              sd[p + "post_attention_layernorm.weight"] + 1.0, ftype)
        la = p + "linear_attn."
        if la + "in_proj_qkvz.weight" in sd:
            _emit(w, b + "ssm_in.weight", sd[la + "in_proj_qkvz.weight"], ftype)
            _emit(w, b + "ssm_ba.weight", sd[la + "in_proj_ba.weight"], ftype)
            _emit(w, b + "ssm_conv1d.weight", sd[la + "conv1d.weight"].squeeze(1), ftype)
            _emit(w, b + "ssm_dt.bias", sd[la + "dt_bias"], ftype)
            _emit(w, b + "ssm_a", -np.exp(sd[la + "A_log"]), ftype)
            _emit(w, b + "ssm_norm.weight", sd[la + "norm.weight"], ftype)
            _emit(w, b + "ssm_out.weight", sd[la + "out_proj.weight"], ftype)
        else:
            qg = sd[p + "self_attn.q_proj.weight"].reshape(n_head, 2 * hd, E)
            _emit(w, b + "attn_q.weight",
                  np.ascontiguousarray(qg[:, :hd].reshape(n_head * hd, E)), ftype)
            _emit(w, b + "attn_gate.weight",
                  np.ascontiguousarray(qg[:, hd:].reshape(n_head * hd, E)), ftype)
            _emit(w, b + "attn_k.weight", sd[p + "self_attn.k_proj.weight"], ftype)
            _emit(w, b + "attn_v.weight", sd[p + "self_attn.v_proj.weight"], ftype)
            _emit(w, b + "attn_output.weight", sd[p + "self_attn.o_proj.weight"], ftype)
            _emit(w, b + "attn_q_norm.weight", sd[p + "self_attn.q_norm.weight"] + 1.0, ftype)
            _emit(w, b + "attn_k_norm.weight", sd[p + "self_attn.k_norm.weight"] + 1.0, ftype)
        moe = p + "mlp."
        if moe + "gate.weight" in sd:
            _emit(w, b + "ffn_gate_inp.weight", sd[moe + "gate.weight"], ftype)
            n_exp = cfg.num_experts
            for part, hf in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
                stack = np.stack([sd[moe + f"experts.{e}.{hf}.weight"]
                                  for e in range(n_exp)])
                _emit(w, b + f"ffn_{part}_exps.weight", stack, ftype)
            _emit(w, b + "ffn_gate_shexp.weight", sd[moe + "shared_expert.gate_proj.weight"], ftype)
            _emit(w, b + "ffn_up_shexp.weight", sd[moe + "shared_expert.up_proj.weight"], ftype)
            _emit(w, b + "ffn_down_shexp.weight", sd[moe + "shared_expert.down_proj.weight"], ftype)
            _emit(w, b + "ffn_gate_inp_shexp.weight", sd[moe + "shared_expert_gate.weight"], ftype)
        else:
            _emit(w, b + "ffn_gate.weight", sd[moe + "gate_proj.weight"], ftype)
            _emit(w, b + "ffn_up.weight", sd[moe + "up_proj.weight"], ftype)
            _emit(w, b + "ffn_down.weight", sd[moe + "down_proj.weight"], ftype)
    w.write(out_path)
    return out_path


def _convert_lfm2(model, arch: str, out_path: str, ftype: str, tokenizer=None,
                  vocab_override=None) -> str:
    """LFM2 HF -> GGUF: conv layers emit shortconv.* tensors; the final norm
    keeps the reference's token_embd_norm name (llama-arch.cpp:385)."""
    cfg = model.config
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, arch)
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = arch + "."
    n_head = cfg.num_attention_heads
    n_kv = cfg.num_key_value_heads
    hd = getattr(cfg, "head_dim", None) or cfg.hidden_size // n_head
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(getattr(cfg, "max_position_embeddings", 2048)))
    w.add(P + "embedding_length", np.uint32(cfg.hidden_size))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(n_head))
    w.add(P + "attention.head_count_kv", np.uint32(n_kv))
    w.add(P + "attention.key_length", np.uint32(hd))
    w.add(P + "attention.value_length", np.uint32(hd))
    w.add(P + "attention.layer_norm_rms_epsilon",
          float(getattr(cfg, "norm_eps", 1e-5)))
    w.add(P + "rope.freq_base", float(getattr(cfg, "rope_theta", 1e6)))
    w.add(P + "rope.dimension_count", np.uint32(hd))
    w.add(P + "shortconv.l_cache", np.uint32(cfg.conv_L_cache))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if getattr(cfg, "num_experts", 0):
        w.add(P + "expert_count", np.uint32(cfg.num_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length",
              np.uint32(getattr(cfg, "moe_intermediate_size", cfg.intermediate_size)))
        w.add(P + "expert_weights_norm", bool(getattr(cfg, "norm_topk_prob", True)))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    _emit(w, "token_embd.weight", sd["model.embed_tokens.weight"], ftype)
    _emit(w, "token_embd_norm.weight", sd["model.embedding_norm.weight"], ftype)
    if not getattr(cfg, "tie_word_embeddings", True) and "lm_head.weight" in sd:
        _emit(w, "output.weight", sd["lm_head.weight"], ftype)
    for i in range(cfg.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        _emit(w, b + "attn_norm.weight", sd[p + "operator_norm.weight"], ftype)
        _emit(w, b + "ffn_norm.weight", sd[p + "ffn_norm.weight"], ftype)
        if p + "conv.in_proj.weight" in sd:
            _emit(w, b + "shortconv.in_proj.weight", sd[p + "conv.in_proj.weight"], ftype)
            _emit(w, b + "shortconv.out_proj.weight", sd[p + "conv.out_proj.weight"], ftype)
            _emit(w, b + "shortconv.conv.weight",
                  sd[p + "conv.conv.weight"].squeeze(1), ftype)
        else:
            _emit(w, b + "attn_q.weight", sd[p + "self_attn.q_proj.weight"], ftype)
            _emit(w, b + "attn_k.weight", sd[p + "self_attn.k_proj.weight"], ftype)
            _emit(w, b + "attn_v.weight", sd[p + "self_attn.v_proj.weight"], ftype)
            _emit(w, b + "attn_output.weight", sd[p + "self_attn.out_proj.weight"], ftype)
            _emit(w, b + "attn_q_norm.weight", sd[p + "self_attn.q_layernorm.weight"], ftype)
            _emit(w, b + "attn_k_norm.weight", sd[p + "self_attn.k_layernorm.weight"], ftype)
        ff = p + "feed_forward."
        if ff + "gate.weight" in sd:  # lfm2moe router
            _emit(w, b + "ffn_gate_inp.weight", sd[ff + "gate.weight"], ftype)
            if ff + "expert_bias" in sd:
                _emit(w, b + "exp_probs_b.bias", sd[ff + "expert_bias"], ftype)
            n_exp = cfg.num_experts
            for part, hf in (("gate", "w1"), ("up", "w3"), ("down", "w2")):
                stack = np.stack([sd[ff + f"experts.{e}.{hf}.weight"]
                                  for e in range(n_exp)])
                _emit(w, b + f"ffn_{part}_exps.weight", stack, ftype)
        else:
            _emit(w, b + "ffn_gate.weight", sd[ff + "w1.weight"], ftype)
            _emit(w, b + "ffn_up.weight", sd[ff + "w3.weight"], ftype)
            _emit(w, b + "ffn_down.weight", sd[ff + "w2.weight"], ftype)
    w.write(out_path)
    return out_path


def _convert_falcon_h1(model, out_path: str, ftype: str, tokenizer=None,
                       vocab_override=None) -> str:
    """Falcon-H1 HF -> GGUF (reference conversion/falcon_h1.py): parallel
    attention + mamba2 per layer; all channel multipliers folded into the
    emitted weights."""
    cfg = model.config
    d_model = cfg.hidden_size
    d_inner = cfg.mamba_d_ssm or cfg.mamba_expand * d_model
    d_state = cfg.mamba_d_state
    n_group = cfg.mamba_n_groups
    nh = cfg.mamba_n_heads
    head_dim = getattr(cfg, "head_dim", None) or d_model // cfg.num_attention_heads

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "falcon-h1")
    w.add(Keys.General.NAME, "falcon-h1")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "falcon-h1."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(getattr(cfg, "max_position_embeddings", 2048)))
    w.add(P + "embedding_length", np.uint32(d_model))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(cfg.num_attention_heads))
    w.add(P + "attention.head_count_kv", np.uint32(cfg.num_key_value_heads))
    w.add(P + "attention.key_length", np.uint32(head_dim))
    w.add(P + "attention.value_length", np.uint32(head_dim))
    w.add(P + "attention.layer_norm_rms_epsilon", float(cfg.rms_norm_eps))
    w.add(P + "rope.freq_base", float(getattr(cfg, "rope_theta", 10000.0)))
    w.add(P + "rope.dimension_count", np.uint32(head_dim))
    w.add(P + "ssm.conv_kernel", np.uint32(cfg.mamba_d_conv))
    w.add(P + "ssm.inner_size", np.uint32(d_inner))
    w.add(P + "ssm.state_size", np.uint32(d_state))
    w.add(P + "ssm.time_step_rank", np.uint32(nh))
    w.add(P + "ssm.group_count", np.uint32(n_group))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    m_attn_in = float(getattr(cfg, "attention_in_multiplier", 1.0))
    m_attn_out = float(getattr(cfg, "attention_out_multiplier", 1.0))
    m_key = float(getattr(cfg, "key_multiplier", 1.0))
    m_ssm_in = float(getattr(cfg, "ssm_in_multiplier", 1.0))
    m_ssm_out = float(getattr(cfg, "ssm_out_multiplier", 1.0))
    m_mlp = list(getattr(cfg, "mlp_multipliers", (1.0, 1.0)))
    m_zxbcdt = list(getattr(cfg, "ssm_multipliers", (1.0,) * 5))

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    emb = sd["model.embed_tokens.weight"]
    m_emb = float(getattr(cfg, "embedding_multiplier", 1.0))
    m_head = float(getattr(cfg, "lm_head_multiplier", 1.0))
    _emit(w, "token_embd.weight", emb * m_emb, ftype)
    _emit(w, "output_norm.weight", sd["model.final_layernorm.weight"], ftype)
    head = sd.get("lm_head.weight", emb)
    _emit(w, "output.weight", head * m_head, ftype)

    for i in range(cfg.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        _emit(w, b + "attn_norm.weight", sd[p + "input_layernorm.weight"], ftype)
        _emit(w, b + "ffn_norm.weight", sd[p + "pre_ff_layernorm.weight"], ftype)
        _emit(w, b + "attn_q.weight", sd[p + "self_attn.q_proj.weight"] * m_attn_in, ftype)
        _emit(w, b + "attn_k.weight", sd[p + "self_attn.k_proj.weight"] * m_key * m_attn_in, ftype)
        _emit(w, b + "attn_v.weight", sd[p + "self_attn.v_proj.weight"] * m_attn_in, ftype)
        _emit(w, b + "attn_output.weight", sd[p + "self_attn.o_proj.weight"] * m_attn_out, ftype)
        m = p + "mamba."
        inp = sd[m + "in_proj.weight"] * m_ssm_in
        gts = n_group * d_state
        inp[:d_inner] *= m_zxbcdt[0]
        inp[d_inner:2 * d_inner] *= m_zxbcdt[1]
        inp[2 * d_inner:2 * d_inner + gts] *= m_zxbcdt[2]
        inp[2 * d_inner + gts:2 * d_inner + 2 * gts] *= m_zxbcdt[3]
        inp[2 * d_inner + 2 * gts:] *= m_zxbcdt[4]
        _emit(w, b + "ssm_in.weight", inp, ftype)
        _emit(w, b + "ssm_conv1d.weight", sd[m + "conv1d.weight"].squeeze(1), ftype)
        if m + "conv1d.bias" in sd:
            _emit(w, b + "ssm_conv1d.bias", sd[m + "conv1d.bias"], ftype)
        _emit(w, b + "ssm_dt.bias", sd[m + "dt_bias"], ftype)
        _emit(w, b + "ssm_a", -np.exp(sd[m + "A_log"]).reshape(-1, 1), ftype)
        _emit(w, b + "ssm_d", sd[m + "D"].reshape(-1, 1), ftype)
        if m + "norm.weight" in sd:
            _emit(w, b + "ssm_norm.weight",
                  sd[m + "norm.weight"].reshape(n_group, d_inner // n_group), ftype)
        _emit(w, b + "ssm_out.weight", sd[m + "out_proj.weight"] * m_ssm_out, ftype)
        ff = p + "feed_forward."
        _emit(w, b + "ffn_gate.weight", sd[ff + "gate_proj.weight"] * m_mlp[0], ftype)
        _emit(w, b + "ffn_up.weight", sd[ff + "up_proj.weight"], ftype)
        _emit(w, b + "ffn_down.weight", sd[ff + "down_proj.weight"] * m_mlp[1], ftype)
    w.write(out_path)
    return out_path


def _convert_granite_hybrid(model, out_path: str, ftype: str, tokenizer=None,
                            vocab_override=None) -> str:
    """Granite-4 hybrid HF -> GGUF: per-layer mamba2/attention, granitemoe
    router + fused expert mats, gated shared FFN as *_shexp."""
    cfg = model.config
    d_model = cfg.hidden_size
    d_inner = cfg.mamba_expand * d_model
    d_state = cfg.mamba_d_state
    n_group = cfg.mamba_n_groups
    nh = cfg.mamba_n_heads
    head_dim = getattr(cfg, "head_dim", None) or d_model // cfg.num_attention_heads

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "granitehybrid")
    w.add(Keys.General.NAME, "granitehybrid")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "granitehybrid."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(getattr(cfg, "max_position_embeddings", 2048)))
    w.add(P + "embedding_length", np.uint32(d_model))
    w.add(P + "feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add(P + "attention.head_count", np.uint32(cfg.num_attention_heads))
    w.add(P + "attention.head_count_kv", np.uint32(cfg.num_key_value_heads))
    w.add(P + "attention.key_length", np.uint32(head_dim))
    w.add(P + "attention.value_length", np.uint32(head_dim))
    w.add(P + "attention.layer_norm_rms_epsilon", float(cfg.rms_norm_eps))
    w.add(P + "embedding_scale", float(getattr(cfg, "embedding_multiplier", 1.0)))
    w.add(P + "residual_scale", float(getattr(cfg, "residual_multiplier", 1.0)))
    w.add(P + "attention.scale", float(getattr(cfg, "attention_multiplier", 0.0)))
    w.add(P + "logit_scale", 1.0 / float(getattr(cfg, "logits_scaling", 1.0)))
    w.add(P + "ssm.conv_kernel", np.uint32(cfg.mamba_d_conv))
    w.add(P + "ssm.inner_size", np.uint32(d_inner))
    w.add(P + "ssm.state_size", np.uint32(d_state))
    w.add(P + "ssm.time_step_rank", np.uint32(nh))
    w.add(P + "ssm.group_count", np.uint32(n_group))
    if getattr(cfg, "num_local_experts", 0):
        w.add(P + "expert_count", np.uint32(cfg.num_local_experts))
        w.add(P + "expert_used_count", np.uint32(cfg.num_experts_per_tok))
        w.add(P + "expert_feed_forward_length", np.uint32(cfg.intermediate_size))
    if getattr(cfg, "shared_intermediate_size", 0):
        w.add(P + "expert_shared_count", np.uint32(1))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    emb = sd["model.embed_tokens.weight"]
    _emit(w, "token_embd.weight", emb, ftype)
    _emit(w, "output_norm.weight", sd["model.norm.weight"], ftype)
    lm_head = sd.get("lm_head.weight")
    if lm_head is not None and not getattr(cfg, "tie_word_embeddings", False):
        _emit(w, "output.weight", lm_head, ftype)

    for i in range(cfg.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        _emit(w, b + "attn_norm.weight", sd[p + "input_layernorm.weight"], ftype)
        _emit(w, b + "ffn_norm.weight", sd[p + "post_attention_layernorm.weight"], ftype)
        m = p + "mamba."
        if m + "in_proj.weight" in sd:
            _emit(w, b + "ssm_in.weight", sd[m + "in_proj.weight"], ftype)
            _emit(w, b + "ssm_conv1d.weight", sd[m + "conv1d.weight"].squeeze(1), ftype)
            if m + "conv1d.bias" in sd:
                _emit(w, b + "ssm_conv1d.bias", sd[m + "conv1d.bias"], ftype)
            _emit(w, b + "ssm_dt.bias", sd[m + "dt_bias"], ftype)
            _emit(w, b + "ssm_a", -np.exp(sd[m + "A_log"]).reshape(-1, 1), ftype)
            _emit(w, b + "ssm_d", sd[m + "D"].reshape(-1, 1), ftype)
            _emit(w, b + "ssm_norm.weight",
                  sd[m + "norm.weight"].reshape(n_group, d_inner // n_group), ftype)
            _emit(w, b + "ssm_out.weight", sd[m + "out_proj.weight"], ftype)
        else:
            for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                           ("v_proj", "attn_v"), ("o_proj", "attn_output")):
                _emit(w, b + f"{gg}.weight", sd[p + f"self_attn.{hf}.weight"], ftype)
        moe = p + "block_sparse_moe."
        if moe + "router.layer.weight" in sd:
            _emit(w, b + "ffn_gate_inp.weight", sd[moe + "router.layer.weight"], ftype)
            il_w = sd[moe + "input_linear.weight"]  # [E, 2ff, d]
            ff2 = il_w.shape[1] // 2
            _emit(w, b + "ffn_gate_exps.weight", np.ascontiguousarray(il_w[:, :ff2]), ftype)
            _emit(w, b + "ffn_up_exps.weight", np.ascontiguousarray(il_w[:, ff2:]), ftype)
            _emit(w, b + "ffn_down_exps.weight", sd[moe + "output_linear.weight"], ftype)
        sh = p + "shared_mlp."
        if sh + "input_linear.weight" in sd:
            shw = sd[sh + "input_linear.weight"]  # [2*sf, d]: gate; up
            sf = shw.shape[0] // 2
            _emit(w, b + "ffn_gate_shexp.weight", np.ascontiguousarray(shw[:sf]), ftype)
            _emit(w, b + "ffn_up_shexp.weight", np.ascontiguousarray(shw[sf:]), ftype)
            _emit(w, b + "ffn_down_shexp.weight", sd[sh + "output_linear.weight"], ftype)
    w.write(out_path)
    return out_path


def _convert_dbrx(model, out_path: str, ftype: str, tokenizer=None,
                  vocab_override=None) -> str:
    """DBRX HF -> GGUF (reference conversion/dbrx.py): fused clamped Wqkv
    kept fused; expert mats w1/v1 [E*ff, d] -> [E, ff, d] gate/up, w2
    -> [E, d, ff] down."""
    cfg = model.config
    n_head = cfg.n_heads
    n_kv = cfg.attn_config.kv_n_heads
    n_embd = cfg.d_model
    hd = n_embd // n_head
    ffn = cfg.ffn_config
    n_ff = ffn.ffn_hidden_size
    n_exp = ffn.moe_num_experts

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "dbrx")
    w.add(Keys.General.NAME, "dbrx")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "dbrx."
    w.add(P + "block_count", np.uint32(cfg.n_layers))
    w.add(P + "context_length", np.uint32(cfg.max_seq_len))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(n_ff))
    w.add(P + "attention.head_count", np.uint32(n_head))
    w.add(P + "attention.head_count_kv", np.uint32(n_kv))
    w.add(P + "attention.layer_norm_epsilon", 1e-5)
    w.add(P + "attention.clamp_kqv", float(cfg.attn_config.clip_qkv))
    w.add(P + "rope.freq_base", float(cfg.attn_config.rope_theta))
    w.add(P + "rope.dimension_count", np.uint32(hd))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    w.add(P + "expert_count", np.uint32(n_exp))
    w.add(P + "expert_used_count", np.uint32(ffn.moe_top_k))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    _emit(w, "token_embd.weight", sd["transformer.wte.weight"], ftype)
    _emit(w, "output_norm.weight", sd["transformer.norm_f.weight"], ftype)
    _emit(w, "output.weight", sd["lm_head.weight"], ftype)
    for i in range(cfg.n_layers):
        p, b = f"transformer.blocks.{i}.", f"blk.{i}."
        nan = p + "norm_attn_norm."
        _emit(w, b + "attn_norm.weight", sd[nan + "norm_1.weight"], ftype)
        _emit(w, b + "attn_qkv.weight", sd[nan + "attn.Wqkv.weight"], ftype)
        _emit(w, b + "attn_output.weight", sd[nan + "attn.out_proj.weight"], ftype)
        _emit(w, b + "ffn_norm.weight", sd[nan + "norm_2.weight"], ftype)
        _emit(w, b + "ffn_gate_inp.weight", sd[p + "ffn.router.layer.weight"], ftype)
        _emit(w, b + "ffn_gate_exps.weight",
              sd[p + "ffn.experts.mlp.w1"].reshape(n_exp, n_ff, n_embd), ftype)
        _emit(w, b + "ffn_up_exps.weight",
              sd[p + "ffn.experts.mlp.v1"].reshape(n_exp, n_ff, n_embd), ftype)
        _emit(w, b + "ffn_down_exps.weight",
              np.ascontiguousarray(
                  sd[p + "ffn.experts.mlp.w2"].reshape(n_exp, n_ff, n_embd)
                  .transpose(0, 2, 1)), ftype)
    w.write(out_path)
    return out_path


def _convert_falcon(model, out_path: str, ftype: str, tokenizer=None,
                    vocab_override=None) -> str:
    """Falcon (new decoder arch) HF -> GGUF: regroup the per-kv-group fused
    QKV into contiguous [Q;K;V] (reference conversion/falcon.py)."""
    cfg = model.config
    n_head = cfg.num_attention_heads
    n_kv = getattr(cfg, "num_kv_heads", None) or 1
    n_embd = cfg.hidden_size
    hd = n_embd // n_head

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "falcon")
    w.add(Keys.General.NAME, "falcon")
    w.add(Keys.General.FILE_TYPE, np.uint32(_FTYPE_ID[ftype]))
    P = "falcon."
    w.add(P + "block_count", np.uint32(cfg.num_hidden_layers))
    w.add(P + "context_length", np.uint32(2048))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(4 * n_embd))
    w.add(P + "attention.head_count", np.uint32(n_head))
    w.add(P + "attention.head_count_kv", np.uint32(n_kv))
    w.add(P + "attention.layer_norm_epsilon",
          float(getattr(cfg, "layer_norm_epsilon", 1e-5)))
    w.add(P + "rope.freq_base", float(getattr(cfg, "rope_theta", 10000.0)))
    w.add(P + "rope.dimension_count", np.uint32(hd))
    w.add(P + "vocab_size", np.uint32(cfg.vocab_size))
    if tokenizer is not None:
        _add_vocab_from_hf_tokenizer(w, tokenizer)
    elif vocab_override:
        w.add_all(vocab_override)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    _emit(w, "token_embd.weight", sd["transformer.word_embeddings.weight"], ftype)
    _emit(w, "output_norm.weight", sd["transformer.ln_f.weight"], ftype)
    _emit(w, "output_norm.bias", sd["transformer.ln_f.bias"], ftype)
    _emit(w, "output.weight", sd["lm_head.weight"], ftype)
    for i in range(cfg.num_hidden_layers):
        p, b = f"transformer.h.{i}.", f"blk.{i}."
        qkv = sd[p + "self_attention.query_key_value.weight"]
        g = qkv.reshape(n_kv, n_head // n_kv + 2, hd, n_embd)
        q = g[:, :-2].reshape(n_head * hd, n_embd)
        k = g[:, [-2]].reshape(n_kv * hd, n_embd)
        v = g[:, [-1]].reshape(n_kv * hd, n_embd)
        _emit(w, b + "attn_qkv.weight", np.concatenate([q, k, v]), ftype)
        _emit(w, b + "attn_output.weight", sd[p + "self_attention.dense.weight"], ftype)
        # new-arch: ln_attn feeds attention, ln_mlp feeds the mlp branch
        _emit(w, b + "attn_norm.weight", sd[p + "ln_attn.weight"], ftype)
        _emit(w, b + "attn_norm.bias", sd[p + "ln_attn.bias"], ftype)
        _emit(w, b + "ffn_norm.weight", sd[p + "ln_mlp.weight"], ftype)
        _emit(w, b + "ffn_norm.bias", sd[p + "ln_mlp.bias"], ftype)
        _emit(w, b + "ffn_up.weight", sd[p + "mlp.dense_h_to_4h.weight"], ftype)
        _emit(w, b + "ffn_down.weight", sd[p + "mlp.dense_4h_to_h.weight"], ftype)
    w.write(out_path)
    return out_path
