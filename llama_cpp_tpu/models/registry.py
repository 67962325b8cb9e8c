"""Architecture registry: per-arch config tweaks over the generic decoder.

Analog of reference src/llama-arch.h LLM_ARCH_* enum + per-arch classes in
src/models/*.cpp. Each entry adjusts ModelConfig flags; the forward pass is
the shared graph in transformer.py (new archs with exotic blocks register a
custom forward).
"""

from __future__ import annotations

from typing import Any, Callable

from ..ops.rope import ROPE_TYPE_NEOX, ROPE_TYPE_NONE, ROPE_TYPE_NORM
from .config import ModelConfig

ArchTweak = Callable[[ModelConfig, dict[str, Any]], ModelConfig]

_REGISTRY: dict[str, ArchTweak] = {}


def register(name: str):
    def deco(fn: ArchTweak):
        _REGISTRY[name] = fn
        return fn

    return deco


def apply_arch(cfg: ModelConfig, md: dict[str, Any]) -> ModelConfig:
    fn = _REGISTRY.get(cfg.arch)
    if fn is None:
        raise NotImplementedError(
            f"architecture {cfg.arch!r} not implemented (have: {sorted(_REGISTRY)})"
        )
    return fn(cfg, md)


def supported_archs() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------


@register("llama")
def _llama(cfg: ModelConfig, md) -> ModelConfig:
    # GGUF llama q/k weights are permuted for NORM-style rope
    # (reference src/models/llama.cpp:99-247); MoE (mixtral) normalizes the
    # top-k router weights (build_moe_ffn norm_w=true, src/models/llama.cpp:196)
    return cfg.with_(rope_type=ROPE_TYPE_NORM, expert_weights_norm=True)


@register("llama4")
def _llama4(cfg: ModelConfig, md) -> ModelConfig:
    """Llama-4 (reference src/models/llama4 graph): interleaved MoE with the
    gate applied to the expert INPUT, post-rope weightless qk l2-norm, NoPE
    layers, always-on shared expert."""
    skip = md.get("llama4.no_rope_layers")
    if skip is not None:
        cfg.extra["no_rope_layers"] = tuple(
            i for i, use in enumerate(skip) if not int(use))
    cfg.extra.update(moe_weight_before=True, qk_norm_after_rope=True)
    return cfg.with_(
        rope_type=ROPE_TYPE_NORM,
        qk_norm=bool(md.get("llama4.use_qk_norm", False)),
        expert_gating="sigmoid",
        n_expert_shared=1,
        moe_every=int(md.get("llama4.interleave_moe_layer_step", 1)),
    )


@register("mistral")
def _mistral(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("qwen2")
def _qwen2(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, attn_bias=True)


@register("qwen2vl")
def _qwen2vl(cfg: ModelConfig, md) -> ModelConfig:
    """Qwen2-VL text model (reference src/models/qwen2vl.cpp): qwen2 graph
    with M-RoPE sections over t/h/w position streams."""
    sec = md.get("qwen2vl.rope.dimension_sections", [16, 24, 24, 0])
    if hasattr(sec, "tolist"):
        sec = sec.tolist()
    cfg.extra["mrope_sections"] = tuple(int(x) for x in sec if int(x) > 0)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, attn_bias=True)


@register("paddleocr")
def _paddleocr(cfg: ModelConfig, md) -> ModelConfig:
    """PaddleOCR text model (reference src/models/paddleocr.cpp): the
    qwen2vl graph with OPTIONAL qkv biases."""
    sec = md.get("paddleocr.rope.dimension_sections", [16, 24, 24, 0])
    if hasattr(sec, "tolist"):
        sec = sec.tolist()
    cfg.extra["mrope_sections"] = tuple(int(x) for x in sec if int(x) > 0)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX)


@register("hunyuan_vl")
def _hunyuan_vl(cfg: ModelConfig, md) -> ModelConfig:
    """Hunyuan-VL text model (reference src/models/hunyuan-vl.cpp): qwen2
    graph with per-head q/k rms-norm AFTER rope, optional M-RoPE sections,
    and XDRoPE NTK-alpha frequency scaling (hunyuan-vl.cpp:8-12)."""
    c = cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                  tie_embeddings=True)
    c.extra["qk_norm_after_rope"] = True
    sec = md.get("hunyuan_vl.rope.dimension_sections")
    if sec is not None:
        if hasattr(sec, "tolist"):
            sec = sec.tolist()
        sec = [int(x) for x in sec]
        if sec and sec[0] > 0 and sec[1] > 0:  # use_mrope()
            c.extra["mrope_sections"] = tuple(x for x in sec if x > 0)
    alpha = float(md.get("hunyuan_vl.rope.scaling.alpha", 0.0) or 0.0)
    if alpha > 0.0:
        d = cfg.head_dim_k
        c = c.with_(rope_freq_base=cfg.rope_freq_base
                    * alpha ** (float(d) / (d - 2)))
    return c


@register("cogvlm")
def _cogvlm(cfg: ModelConfig, md) -> ModelConfig:
    """CogVLM (reference src/models/cogvlm.cpp): llama graph with a
    PARALLEL vision-expert weight set — image-embedding ubatches run the
    visexp qkv/o/ffn weights, text ubatches the regular ones."""
    cfg.extra["visexp"] = True
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, tie_embeddings=True)


@register("deepseek2-ocr")
def _deepseek2_ocr(cfg: ModelConfig, md) -> ModelConfig:
    """DeepSeek-OCR text decoder (reference src/models/deepseek2ocr.cpp):
    the deepseek2 MoE stack (leading dense layers, shared experts, gating
    func enum) but PLAIN MHA — no MLA latents."""
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        tie_embeddings=True,
        expert_gating="softmax"
        if int(md.get("deepseek2-ocr.expert_gating_func", 1)) == 1
        else "sigmoid",
        expert_weights_norm=bool(
            md.get("deepseek2-ocr.expert_weights_norm", False)),
        expert_weights_scale=float(
            md.get("deepseek2-ocr.expert_weights_scale", 1.0)),
    )


@register("qwen3")
def _qwen3(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True)


@register("qwen2moe")
def _qwen2moe(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, attn_bias=True, expert_weights_norm=False)


@register("qwen3moe")
def _qwen3moe(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True, expert_weights_norm=True)


@register("gemma")
def _gemma(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        act="gelu",
        embd_scale=float(cfg.n_embd) ** 0.5,
        tie_embeddings=True,
    )


@register("gemma2")
def _gemma2(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        act="gelu",
        embd_scale=float(cfg.n_embd) ** 0.5,
        post_norms=True,
        tie_embeddings=True,
        swa_pattern=2,
        attn_scale=float(md.get("gemma2.attention.scale", 0.0)),
    )


@register("gemma3")
def _gemma3(cfg: ModelConfig, md) -> ModelConfig:
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        act="gelu",
        embd_scale=float(cfg.n_embd) ** 0.5,
        post_norms=True,
        qk_norm=True,
        tie_embeddings=True,
        swa_pattern=int(md.get("gemma3.attention.sliding_window_pattern", 6)),
        attn_scale=float(md.get("gemma3.attention.scale", 0.0))
        or 1.0 / (float(cfg.head_dim_k) ** 0.5),
    )
    c.extra["rope_freq_base_swa"] = float(
        md.get("gemma3.rope.freq_base_swa", 10000.0))
    return c


def _kv_reuse_layers(cfg: ModelConfig, n_shared: int,
                     default_from_start: int | None = None) -> list[int]:
    """Cross-layer KV sharing map (reference llama-model.cpp:2311-2320 /
    modeling_gemma3n.py kv_shared_layer_index): each layer past
    n_layer_kv_from_start reuses the LAST owned layer of its own SWA class."""
    L = cfg.n_layers
    from_start = L - n_shared if n_shared > 0 else (default_from_start or L)
    from_start = max(1, min(from_start, L))
    reuse = []
    for il in range(L):
        if il < from_start:
            reuse.append(-1)
            continue
        cls = cfg.is_swa_layer(il)
        src = next((j for j in range(from_start - 1, -1, -1)
                    if cfg.is_swa_layer(j) == cls), -1)
        reuse.append(src)
    return reuse


@register("gemma3n")
def _gemma3n(cfg: ModelConfig, md) -> ModelConfig:
    """Gemma 3n (reference src/models/gemma3n.cpp): AltUp streams, LAUREL,
    per-layer token embeddings, activation sparsity, shared-KV tail layers.
    Graph lives in models/gemma3n.py."""
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        act="gelu",
        embd_scale=float(cfg.n_embd) ** 0.5,
        post_norms=True,
        qk_norm=True,
        tie_embeddings=True,
        attn_scale=1.0,  # f_attention_scale = 1.0 (gemma3n.cpp:10)
        swa_pattern=int(md.get(
            "gemma3n.attention.sliding_window_pattern", 5)),
    )
    c.extra["gemma3n"] = True
    c.extra["v_rms_norm"] = True
    c.extra["rope_freq_base_swa"] = float(
        md.get("gemma3n.rope.freq_base_swa", 10000.0))
    c.extra["n_altup"] = int(md.get("gemma3n.altup.num_inputs", 4))
    c.extra["i_altup_act"] = int(md.get("gemma3n.altup.active_idx", 0))
    c.extra["n_embd_altup"] = int(md.get(
        "gemma3n.embedding_length_per_layer_input", 256))
    # per-layer activation-sparsity std multipliers; default mirrors the
    # reference constants (models.h:804-805: first 10 layers, icdf(0.95))
    sp = md.get("gemma3n.activation_sparsity_scale")
    if sp is None:
        sp = [1.6448533535003662 if il < 10 else 0.0
              for il in range(cfg.n_layers)]
    c.extra["act_sparsity_std"] = [float(v) for v in sp]
    n_shared = int(md.get("gemma3n.attention.shared_kv_layers", 0))
    c.extra["kv_reuse"] = _kv_reuse_layers(
        c, n_shared, default_from_start=min(20, cfg.n_layers))
    return c


@register("gemma4")
def _gemma4(cfg: ModelConfig, md) -> ModelConfig:
    """Gemma 4 (reference src/models/gemma4.cpp): per-layer SWA array with
    class-specific head dims, shared-KV tail, alternative attention (V from
    the K projection), dual-branch MoE, per-layer embeddings, proportional
    rope on full layers, per-layer output scalars.  Graph: models/gemma3n.py
    forward_gemma4."""
    import numpy as _np

    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        act="gelu",
        embd_scale=float(cfg.n_embd) ** 0.5,
        post_norms=True,
        qk_norm=True,
        tie_embeddings=True,
        attn_scale=1.0,  # self.scaling = 1.0 (gemma4.cpp:11)
        expert_weights_norm=True,  # build_moe_ffn(..., norm_w=true)
    )
    pat = md.get("gemma4.attention.sliding_window_pattern")
    if isinstance(pat, (list, tuple, _np.ndarray)):
        c.extra["is_swa_layers"] = [bool(v) for v in pat]
        c = c.with_(swa_pattern=1)  # marker: per-layer array drives routing
    else:
        c = c.with_(swa_pattern=int(pat or 6))
    c.extra["gemma4"] = True
    c.extra["v_rms_norm"] = True
    c.extra["rope_factors_full_only"] = True
    c.extra["rope_freq_base_swa"] = float(
        md.get("gemma4.rope.freq_base_swa", 10000.0))
    dk_swa = int(md.get("gemma4.attention.key_length_swa", 0))
    if dk_swa and dk_swa != cfg.head_dim_k:
        c.extra["head_dim_k_swa"] = dk_swa
        c.extra["head_dim_v_swa"] = int(
            md.get("gemma4.attention.value_length_swa", dk_swa))
        c.extra["rope_dims_swa"] = dk_swa
    c.extra["n_embd_altup"] = int(md.get(
        "gemma4.embedding_length_per_layer_input", 0))
    n_shared = int(md.get("gemma4.attention.shared_kv_layers", 0))
    if n_shared > 0:
        c.extra["kv_reuse"] = _kv_reuse_layers(c, n_shared)
    return c


@register("gemma4-assistant")
def _gemma4_assistant(cfg: ModelConfig, md) -> ModelConfig:
    """Gemma 4 MTP assistant (reference src/models/gemma4-assistant.cpp):
    a q-only drafter whose every layer attends the TARGET context's KV
    cache; consumed via models.gemma3n.Gemma4AssistantSpeculator (the
    kv_reuse map into the target layer space is bound at speculator init)."""
    import numpy as _np

    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        act="gelu",
        post_norms=True,
        qk_norm=True,
        tie_embeddings=True,
        attn_scale=1.0,
    )
    pat = md.get("gemma4-assistant.attention.sliding_window_pattern")
    if isinstance(pat, (list, tuple, _np.ndarray)):
        c.extra["is_swa_layers"] = [bool(v) for v in pat]
        c = c.with_(swa_pattern=1)
    else:
        c = c.with_(swa_pattern=int(pat or 6))
    c.extra["gemma4_assistant"] = True
    c.extra["rope_factors_full_only"] = True
    c.extra["rope_freq_base_swa"] = float(
        md.get("gemma4-assistant.rope.freq_base_swa", 10000.0))
    dk_swa = int(md.get("gemma4-assistant.attention.key_length_swa", 0))
    if dk_swa and dk_swa != cfg.head_dim_k:
        c.extra["head_dim_k_swa"] = dk_swa
        c.extra["head_dim_v_swa"] = int(
            md.get("gemma4-assistant.attention.value_length_swa", dk_swa))
        c.extra["rope_dims_swa"] = dk_swa
    # target hidden width (EMBEDDING_LENGTH_OUT, llama-arch.cpp:181)
    c.extra["n_embd_out"] = int(md.get(
        "gemma4-assistant.embedding_length_out", cfg.n_embd))
    c.extra["n_layer_nextn"] = int(md.get(
        "gemma4-assistant.nextn_predict_layers", cfg.n_layers))
    return c


@register("phi3")
def _phi3(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NEOX)


@register("stablelm")
def _stablelm(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False)


@register("starcoder2")
def _starcoder2(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     act="gelu", glu=False, attn_bias=True)


@register("smollm3")
def _smollm3(cfg: ModelConfig, md) -> ModelConfig:
    # every-4th layer runs without positional encoding (NoPE)
    skip = md.get("smollm3.no_rope_layers")
    if skip is not None:
        cfg.extra["no_rope_layers"] = tuple(
            i for i, use in enumerate(skip) if not int(use))
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("granite")
def _granite(cfg: ModelConfig, md) -> ModelConfig:
    a = cfg.arch
    return cfg.with_(
        rope_type=ROPE_TYPE_NORM,
        embd_scale=float(md.get(f"{a}.embedding_scale", 1.0)),
        attn_scale=float(md.get(f"{a}.attention.scale", 0.0)),
        residual_scale=float(md.get(f"{a}.residual_scale", 1.0)),
        logit_scale=float(md.get(f"{a}.logit_scale", 1.0)),
    )


@register("olmo2")
def _olmo2(cfg: ModelConfig, md) -> ModelConfig:
    """OLMo-2 (reference src/models/olmo2.cpp): norm-after blocks + full-width
    q/k rmsnorm (normalized over n_embd, not per head)."""
    cfg.extra["qk_norm_full"] = True
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, norm_after=True, qk_norm=True)


@register("glm4")
def _glm4(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NORM, post_norms=True)


@register("nemotron")
def _nemotron(cfg: ModelConfig, md) -> ModelConfig:
    # layernorm1p weights arrive +1-folded from the converter
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     act="relu2", glu=False)


def _mla_absorb_extras(cfg: ModelConfig) -> None:
    """Absorbed-latent MLA cache config (reference build_attn_mha MLA path,
    src/llama-graph.cpp:2499-2618): the cache stores the 576-dim compressed
    [c_kv | k_pe] latent per token as ONE kv head instead of the expanded
    per-head K/V — ~(2*H*(Dk+Dv))/(c+rot) x fewer KV bytes/token. The pad
    keeps the row a lane multiple for the flash kernel; it sits BETWEEN c_kv
    and k_pe so the context-shift re-rotation's tail-rope convention holds."""
    import os as _os

    if _os.environ.get("LLAMA_TPU_MLA_NAIVE"):
        return
    c = cfg.extra["kv_lora_rank"]
    rot = cfg.rope_dims
    pad = (-(c + rot)) % 128
    cfg.extra.update(
        mla_absorb=True, mla_pad=pad,
        cache_n_kv_heads=1,
        cache_head_dim_k=c + pad + rot,
        cache_head_dim_v=c,
    )


@register("deepseek2")
def _deepseek2(cfg: ModelConfig, md) -> ModelConfig:
    """DeepSeek-V2/V3 MLA (reference src/models/deepseek2.cpp): latent KV
    compression expanded to MHA; head dims come from the *_mla keys."""
    head_k = int(md.get("deepseek2.attention.key_length_mla", cfg.head_dim_k))
    head_v = int(md.get("deepseek2.attention.value_length_mla", cfg.head_dim_v))
    cfg.extra.update(
        kv_lora_rank=int(md.get("deepseek2.attention.kv_lora_rank", 512)),
        q_lora_rank=int(md.get("deepseek2.attention.q_lora_rank", 0) or 0),
        # converter stores 0.1*mscale_all_dim (reference deepseek2.cpp
        # TAG_DEEPSEEK2_YARN_LOG_MUL_FIX divides it back out)
        yarn_log_mul=float(md.get("deepseek2.rope.scaling.yarn_log_mul", 0.0)) / 0.1
        if md.get("deepseek2.rope.scaling.yarn_log_mul") else 0.0,
    )
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        n_kv_heads=cfg.n_heads,  # naive MHA expansion of the latent
        head_dim_k=head_k,
        head_dim_v=head_v,
        expert_gating="softmax"
        if int(md.get("deepseek2.expert_gating_func", 1)) == 1
        else "sigmoid",
        expert_weights_norm=bool(md.get("deepseek2.expert_weights_norm", False)),
        expert_weights_scale=float(md.get("deepseek2.expert_weights_scale", 1.0)),
    )
    _mla_absorb_extras(c)
    return c


@register("deepseek32")
def _deepseek32(cfg: ModelConfig, md) -> ModelConfig:
    """DeepSeek V3.2 sparse attention (reference src/models/deepseek32.cpp +
    llama_kv_cache_dsa): deepseek2 MLA plus the lightning indexer whose
    per-query top-k columns gate the attention mask."""
    md2 = {k.replace("deepseek32.", "deepseek2."): v for k, v in md.items()}
    c = _deepseek2(cfg.with_(arch="deepseek2"), md2).with_(arch=cfg.arch)
    for k in ("mla_absorb", "mla_pad", "cache_n_kv_heads",
              "cache_head_dim_k", "cache_head_dim_v"):
        c.extra.pop(k, None)  # DSA keeps the naive expanded cache for now
    c.extra.update(
        dsa=True,
        indexer_n_head=int(md.get("deepseek32.attention.indexer.head_count", 64)),
        indexer_head_size=int(md.get("deepseek32.attention.indexer.key_length", 128)),
        indexer_top_k=int(md.get("deepseek32.attention.indexer.top_k", 2048)),
    )
    return c


@register("gpt2")
def _gpt2(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(rope_type=ROPE_TYPE_NONE, use_rms_norm=False,
                     act="gelu", glu=False, tie_embeddings=True)


@register("gptneox")
def _gptneox(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, use_rms_norm=False, act="gelu", glu=False,
        parallel_residual=bool(md.get("gptneox.use_parallel_residual", True)),
    )


@register("phi2")
def _phi2(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, use_rms_norm=False, act="gelu", glu=False,
        parallel_residual=True, shared_parallel_norm=True,
    )


@register("bloom")
def _bloom(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(
        rope_type=ROPE_TYPE_NONE, use_rms_norm=False, act="gelu", glu=False,
        alibi_bias=8.0,
    )


@register("mpt")
def _mpt(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(
        rope_type=ROPE_TYPE_NONE, use_rms_norm=False, act="gelu", glu=False,
        alibi_bias=float(md.get("mpt.attention.max_alibi_bias", 8.0)),
    )


@register("command-r")
def _command_r(cfg: ModelConfig, md) -> ModelConfig:
    return cfg.with_(
        rope_type=ROPE_TYPE_NORM, use_rms_norm=False,
        parallel_residual=True, shared_parallel_norm=True,
        logit_scale=float(md.get("command-r.logit_scale", 1.0)),
    )


@register("olmoe")
def _olmoe(cfg: ModelConfig, md) -> ModelConfig:
    """OLMoE: full-width q/k rmsnorm + top-k-normalized experts."""
    cfg.extra["qk_norm_full"] = True
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                     expert_weights_norm=bool(md.get("olmoe.expert_weights_norm", True)))


@register("falcon")
def _falcon(cfg: ModelConfig, md) -> ModelConfig:
    """Falcon new-decoder arch: dual-norm parallel residual, regrouped
    fused QKV (reference conversion/falcon.py layout fix)."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     act="gelu", glu=False, parallel_residual=True)


@register("mamba")
def _mamba(cfg: ModelConfig, md) -> ModelConfig:
    """Mamba-1 / FalconMamba (reference src/models/mamba.cpp): pure SSM
    stack with recurrent (conv + ssm) state memory instead of a KV cache."""
    a = cfg.arch
    cfg.extra.update(
        memory="recurrent",
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=int(md.get(f"{a}.ssm.inner_size", 2 * cfg.n_embd)),
        ssm_d_state=int(md.get(f"{a}.ssm.state_size", 16)),
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", -(cfg.n_embd // -16))),
        ssm_dt_b_c_rms=bool(md.get(f"{a}.ssm.dt_b_c_rms", False)),
    )
    return cfg


@register("mamba2")
def _mamba2(cfg: ModelConfig, md) -> ModelConfig:
    """Mamba-2 (reference src/models/mamba2.cpp): fused zxBCdt projection,
    scalar per-head decay, grouped B/C, gated grouped RMS norm."""
    a = cfg.arch
    d_inner = int(md.get(f"{a}.ssm.inner_size", 2 * cfg.n_embd))
    d_state = int(md.get(f"{a}.ssm.state_size", 128))
    n_group = int(md.get(f"{a}.ssm.group_count", 1))
    cfg.extra.update(
        memory="recurrent",
        ssm_version=2,
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=d_inner,
        ssm_d_state=d_state,
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", d_inner // 64)),
        ssm_n_group=n_group,
        ssm_conv_dim=d_inner + 2 * n_group * d_state,
    )
    return cfg


@register("bert")
def _bert(cfg: ModelConfig, md) -> ModelConfig:
    """BERT encoder (reference src/models/bert.cpp): post-norm bidirectional
    blocks, learned positions, token types; used for embeddings/rerank."""
    cfg.extra["encoder"] = True
    return cfg.with_(rope_type=ROPE_TYPE_NONE, use_rms_norm=False,
                     act="gelu", glu=False)


@register("modern-bert")
def _modern_bert(cfg: ModelConfig, md) -> ModelConfig:
    """ModernBERT (reference src/models/modern-bert.cpp): pre-norm encoder,
    fused qkv, GEGLU FFN, symmetric local windows with global layers every
    Nth (il %% N == 0) and a separate local rope base."""
    a = cfg.arch
    cfg.extra.update(encoder=True, pre_norm_encoder=True,
                     swa_first_global=True)
    swa_base = md.get(f"{a}.rope.freq_base_swa")
    if swa_base:
        cfg.extra["rope_freq_base_swa"] = float(swa_base)
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 0)),
        swa_pattern=int(md.get(f"{a}.attention.sliding_window_pattern", 3)),
    )


@register("nomic-bert")
def _nomic_bert(cfg: ModelConfig, md) -> ModelConfig:
    """Plain nomic-bert: NEOX rope (bert.cpp:138) and a gated SiLU-PAR FFN
    (bert.cpp:209-213 final else branch — NOT the BERT GELU path)."""
    cfg.extra["encoder"] = True
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     act="silu", glu=True)


@register("rwkv6")
def _rwkv6(cfg: ModelConfig, md) -> ModelConfig:
    """RWKV6 (reference src/models/rwkv6.cpp): token-shift states in the
    recurrent conv window, wkv head state in the ssm plane."""
    a = cfg.arch
    hs = int(md.get(f"{a}.wkv.head_size", 64))
    cfg.extra.update(
        memory="recurrent",
        rwkv=True,
        wkv_head_size=hs,
        rescale_every=int(md.get(f"{a}.rescale_every_n_layers", 0)),
        # reuse the recurrent-state geometry: conv window=2 token shifts,
        # ssm plane [head_size, n_embd]
        ssm_d_conv=3,
        ssm_d_inner=cfg.n_embd,
        ssm_d_state=hs,
    )
    return cfg.with_(use_rms_norm=False)


@register("rwkv7")
def _rwkv7(cfg: ModelConfig, md) -> ModelConfig:
    """RWKV-7 Goose (reference src/models/rwkv7.cpp + rwkv7-base.cpp):
    rank-1-update wkv state, value residual from layer 0, lora-projected
    decay/iclr/gate; channel mix without the receptance gate."""
    a = cfg.arch
    hs = int(md.get(f"{a}.wkv.head_size", 64))
    cfg.extra.update(
        memory="recurrent",
        rwkv=True,
        wkv_head_size=hs,
        ssm_d_conv=3,
        ssm_d_inner=cfg.n_embd,
        ssm_d_state=hs,
    )
    return cfg.with_(use_rms_norm=False)


@register("jamba")
def _jamba(cfg: ModelConfig, md) -> ModelConfig:
    """Jamba hybrid (reference src/models/jamba.cpp): interleaved mamba-1 and
    attention layers (attention without RoPE), optional MoE FFN."""
    a = cfg.arch
    cfg.extra.update(
        memory="hybrid",
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=int(md.get(f"{a}.ssm.inner_size", 2 * cfg.n_embd)),
        ssm_d_state=int(md.get(f"{a}.ssm.state_size", 16)),
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", -(cfg.n_embd // -16))),
    )
    return cfg.with_(rope_type=ROPE_TYPE_NONE, expert_weights_norm=False)


@register("qwen3next")
def _qwen3next(cfg: ModelConfig, md) -> ModelConfig:
    """Qwen3-Next (reference src/models/qwen3next.cpp): gated DeltaNet
    linear-attention layers + gated full-attention layers (partial rope),
    qwen3moe-style MoE with gated shared expert; zero-centered rmsnorm
    weights arrive +1-folded from the converter."""
    a = cfg.arch
    d_inner = int(md.get(f"{a}.ssm.inner_size", 0))
    cfg.extra.update(
        memory="hybrid", ssm_version=2,
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=d_inner,
        ssm_d_state=int(md.get(f"{a}.ssm.state_size", 128)),
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", 1)),
        ssm_n_group=int(md.get(f"{a}.ssm.group_count", 1)),
        ssm_conv_dim=2 * int(md.get(f"{a}.ssm.group_count", 1))
        * int(md.get(f"{a}.ssm.state_size", 128)) + d_inner,
    )
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                     expert_weights_norm=True, n_expert_shared=1)


@register("lfm2")
def _lfm2(cfg: ModelConfig, md) -> ModelConfig:
    """LFM2 (reference src/models/lfm2.cpp): short-conv mixer layers +
    full-attention layers (per-head qk norm); the final norm is stored
    under the token_embd_norm name (reference llama-arch.cpp:385 quirk)."""
    a = cfg.arch
    L = int(md.get(f"{a}.shortconv.l_cache", 3))
    cfg.extra.update(
        memory="hybrid", shortconv_l=L,
        ssm_d_conv=L, ssm_d_inner=cfg.n_embd, ssm_d_state=1,
        ssm_conv_dim=cfg.n_embd,
        tensor_remap={"token_embd_norm": "output_norm"},
    )
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                     tie_embeddings=True)


@register("lfm2moe")
def _lfm2moe(cfg: ModelConfig, md) -> ModelConfig:
    c = _lfm2(cfg, md)
    return c.with_(
        expert_gating="sigmoid"
        if int(md.get("lfm2moe.expert_gating_func", 2)) == 2 else "softmax",
        expert_weights_norm=bool(md.get("lfm2moe.expert_weights_norm", True)),
        expert_weights_scale=float(md.get("lfm2moe.expert_weights_scale", 1.0)),
    )


@register("internlm2")
def _internlm2(cfg: ModelConfig, md) -> ModelConfig:
    """InternLM2 (reference src/models/internlm2.cpp): llama-family graph."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("orion")
def _orion(cfg: ModelConfig, md) -> ModelConfig:
    """Orion (reference src/models/orion.cpp): layernorm(+bias) llama."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False)


@register("xverse")
def _xverse(cfg: ModelConfig, md) -> ModelConfig:
    """XVERSE (reference src/models/xverse.cpp): llama-family graph."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("baichuan")
def _baichuan(cfg: ModelConfig, md) -> ModelConfig:
    """Baichuan 7B (reference src/models/baichuan.cpp; the 13B ALiBi
    variant keys off model size)."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("exaone")
def _exaone(cfg: ModelConfig, md) -> ModelConfig:
    """EXAONE-3 (reference src/models/exaone.cpp): llama-family, NEOX."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX)


@register("deepseek")
def _deepseek(cfg: ModelConfig, md) -> ModelConfig:
    """DeepSeek V1 MoE (reference src/models/deepseek.cpp): softmax router,
    scaled weights, shared experts, dense lead layers."""
    return cfg.with_(
        rope_type=ROPE_TYPE_NORM,
        expert_weights_scale=float(md.get("deepseek.expert_weights_scale", 1.0)),
    )


@register("minicpm")
def _minicpm(cfg: ModelConfig, md) -> ModelConfig:
    """MiniCPM (reference src/models/minicpm.cpp): llama graph with fixed
    default mu-param scales (embd 12, residual 1.4/sqrt(L), logit 256/E)."""
    a = cfg.arch
    return cfg.with_(
        rope_type=ROPE_TYPE_NORM,
        embd_scale=float(md.get(f"{a}.embedding_scale", 12.0)),
        residual_scale=float(md.get(f"{a}.residual_scale",
                                    1.4 / (cfg.n_layers ** 0.5))),
        logit_scale=float(md.get(f"{a}.logit_scale",
                                 256.0 / max(cfg.n_embd, 1))),
        tie_embeddings=True,
    )


@register("jais")
def _jais(cfg: ModelConfig, md) -> ModelConfig:
    """Jais (reference src/models/jais.cpp): gpt2-style layernorm blocks,
    ALiBi positions, gated (biased) swiglu FFN."""
    return cfg.with_(
        rope_type=ROPE_TYPE_NONE, use_rms_norm=False,
        alibi_bias=float(md.get("jais.attention.max_alibi_bias", 8.0)),
        tie_embeddings=True,
    )


@register("arcee")
def _arcee(cfg: ModelConfig, md) -> ModelConfig:
    """Arcee AFM (reference src/models/arcee.cpp): llama graph with a
    non-gated relu^2 FFN."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM, act="relu2", glu=False)


@register("apertus")
def _apertus(cfg: ModelConfig, md) -> ModelConfig:
    """Apertus (reference src/models/apertus.cpp): per-head qk rmsnorm and
    the xIELU activation with per-layer learned scalars."""
    a = cfg.arch
    n = cfg.n_layers

    def arr(key, default):
        v = md.get(f"{a}.{key}", default)
        if hasattr(v, "tolist"):
            v = v.tolist()
        if not isinstance(v, (list, tuple)):
            v = [float(v)] * n
        return tuple(float(x) for x in v)

    cfg.extra["xielu"] = {
        "alpha_n": arr("xielu_alpha_n", 0.8), "alpha_p": arr("xielu_alpha_p", 0.8),
        "beta": arr("xielu_beta", 0.5), "eps": arr("xielu_eps", -1e-6),
    }
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                     act="xielu", glu=False)


@register("chameleon")
def _chameleon(cfg: ModelConfig, md) -> ModelConfig:
    """Chameleon (reference src/models/chameleon.cpp): per-head qk LayerNorm
    with bias; optional swin post-norm ordering."""
    cfg.extra["qk_layernorm"] = True
    c = cfg.with_(rope_type=ROPE_TYPE_NORM, qk_norm=True)
    if bool(md.get("chameleon.swin_norm", False)):
        c = c.with_(norm_after=True)
    return c


@register("dream")
def _dream(cfg: ModelConfig, md) -> ModelConfig:
    """Dream 7B diffusion LM (reference src/models/dream.cpp): qwen2 graph
    with full bidirectional attention; generation via iterative unmasking
    (examples/diffusion)."""
    cfg.extra.update(non_causal=True, diffusion=True, diffusion_shift_logits=True)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, attn_bias=True)


@register("llada")
def _llada(cfg: ModelConfig, md) -> ModelConfig:
    """LLaDA 8B diffusion LM (reference src/models/llada.cpp): llama graph
    with full bidirectional attention."""
    cfg.extra.update(non_causal=True, diffusion=True, diffusion_shift_logits=False)
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("nemotron_h")
def _nemotron_h(cfg: ModelConfig, md) -> ModelConfig:
    """Nemotron-H (reference src/models/nemotron-h.cpp): each layer is ONE
    block — mamba-2, NoPE attention, or relu^2 FFN — on a shared norm."""
    a = cfg.arch
    d_inner = int(md.get(f"{a}.ssm.inner_size", 2 * cfg.n_embd))
    d_state = int(md.get(f"{a}.ssm.state_size", 128))
    n_group = int(md.get(f"{a}.ssm.group_count", 1))
    cfg.extra.update(
        memory="hybrid", ssm_version=2,
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=d_inner, ssm_d_state=d_state,
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", d_inner // 64)),
        ssm_n_group=n_group,
        ssm_conv_dim=d_inner + 2 * n_group * d_state,
    )
    return cfg.with_(rope_type=ROPE_TYPE_NONE, act="relu2", glu=False,
                     attn_scale=float(md.get(f"{a}.attention.scale", 0.0)))


@register("falcon-h1")
def _falcon_h1(cfg: ModelConfig, md) -> ModelConfig:
    """Falcon-H1 (reference src/models/falcon-h1.cpp): EVERY layer runs
    attention and a mamba-2 SSM in parallel on the same normed input and
    sums them; channel multipliers are folded into weights at conversion."""
    a = cfg.arch
    d_inner = int(md.get(f"{a}.ssm.inner_size", 2 * cfg.n_embd))
    d_state = int(md.get(f"{a}.ssm.state_size", 128))
    n_group = int(md.get(f"{a}.ssm.group_count", 1))
    cfg.extra.update(
        memory="hybrid", dual_mixer=True, ssm_version=2,
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=d_inner, ssm_d_state=d_state,
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", d_inner // 64)),
        ssm_n_group=n_group,
        ssm_conv_dim=d_inner + 2 * n_group * d_state,
    )
    return cfg.with_(rope_type=ROPE_TYPE_NEOX)


@register("granitehybrid")
def _granitehybrid(cfg: ModelConfig, md) -> ModelConfig:
    """Granite-4 hybrid (reference src/models/granite-hybrid.cpp): per-layer
    mamba-2 or attention (NoPE unless rope.finetuned), granite multipliers,
    granitemoe-style MoE with an always-on gated shared FFN."""
    a = cfg.arch
    d_inner = int(md.get(f"{a}.ssm.inner_size", 2 * cfg.n_embd))
    d_state = int(md.get(f"{a}.ssm.state_size", 128))
    n_group = int(md.get(f"{a}.ssm.group_count", 1))
    cfg.extra.update(
        memory="hybrid", ssm_version=2,
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=d_inner, ssm_d_state=d_state,
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", d_inner // 64)),
        ssm_n_group=n_group,
        ssm_conv_dim=d_inner + 2 * n_group * d_state,
    )
    if not bool(md.get(f"{a}.rope.finetuned", False)):
        cfg.extra["no_rope_layers"] = tuple(range(cfg.n_layers))
    return cfg.with_(
        rope_type=ROPE_TYPE_NORM,
        embd_scale=float(md.get(f"{a}.embedding_scale", 1.0)),
        attn_scale=float(md.get(f"{a}.attention.scale", 0.0)),
        residual_scale=float(md.get(f"{a}.residual_scale", 1.0)),
        logit_scale=float(md.get(f"{a}.logit_scale", 1.0)),
        expert_weights_norm=True,
    )


@register("cohere2")
def _cohere2(cfg: ModelConfig, md) -> ModelConfig:
    """Command-R7B (reference src/models/cohere2.cpp): command-r parallel
    residual + iSWA (period-4 pattern) with rope applied on SWA layers only."""
    pat = int(md.get("cohere2.attention.sliding_window_pattern", 4))
    c = cfg.with_(
        rope_type=ROPE_TYPE_NORM, use_rms_norm=False,
        parallel_residual=True, shared_parallel_norm=True,
        logit_scale=float(md.get("cohere2.logit_scale", 1.0)),
        sliding_window=int(md.get("cohere2.attention.sliding_window", 0)),
        swa_pattern=pat,
        tie_embeddings=True,
    )
    if c.sliding_window > 0:
        c.extra["no_rope_layers"] = tuple(
            il for il in range(c.n_layers) if not c.is_swa_layer(il))
    return c


@register("olmo")
def _olmo(cfg: ModelConfig, md) -> ModelConfig:
    """OLMo-1 (reference src/models/olmo.cpp): non-parametric layernorm
    (no norm weights at all) + optional clamped qkv."""
    cfg.extra["weightless_norm"] = True
    clamp = md.get("olmo.attention.clamp_kqv")
    if clamp:
        cfg.extra["clamp_kqv"] = float(clamp)
    return cfg.with_(rope_type=ROPE_TYPE_NORM, use_rms_norm=False)


@register("exaone4")
def _exaone4(cfg: ModelConfig, md) -> ModelConfig:
    """EXAONE-4.0 (reference src/models/exaone4.cpp): post-norm blocks
    (x + post_norm(mixer(x))), per-head qk rmsnorm before rope, iSWA with
    rope on SWA layers only."""
    pat = int(md.get("exaone4.attention.sliding_window_pattern", 4))
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX, norm_after=True, qk_norm=True,
        sliding_window=int(md.get("exaone4.attention.sliding_window", 0)),
        swa_pattern=pat,
    )
    if c.sliding_window > 0:
        c.extra["no_rope_layers"] = tuple(
            il for il in range(c.n_layers) if not c.is_swa_layer(il))
    return c


@register("seed_oss")
def _seed_oss(cfg: ModelConfig, md) -> ModelConfig:
    """Seed-OSS (reference src/models/seed-oss.cpp): llama-family graph with
    an optional fixed attention scale."""
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        attn_scale=float(md.get("seed_oss.attention.scale", 0.0)),
    )


@register("hunyuan-dense")
def _hunyuan_dense(cfg: ModelConfig, md) -> ModelConfig:
    """HunYuan dense (reference src/models/hunyuan-vl.cpp graph): per-head
    weighted qk rmsnorm applied AFTER rope."""
    cfg.extra["qk_norm_after_rope"] = True
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True)


@register("ernie4_5")
def _ernie4_5(cfg: ModelConfig, md) -> ModelConfig:
    """ERNIE 4.5 dense (reference src/models/ernie4-5.cpp): llama-family."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("ernie4_5-moe")
def _ernie4_5_moe(cfg: ModelConfig, md) -> ModelConfig:
    """ERNIE 4.5 MoE (reference src/models/ernie4-5-moe.cpp): softmax top-k
    with normalized weights; dense lead / interval layers carry plain FFN
    tensors (converter decides per layer); shared experts as dense ffn."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM, expert_weights_norm=True)


@register("dbrx")
def _dbrx(cfg: ModelConfig, md) -> ModelConfig:
    """DBRX (reference src/models/dbrx.cpp): layernorm, fused clamped qkv,
    16-expert top-4 softmax MoE with normalized weights."""
    clamp = md.get("dbrx.attention.clamp_kqv")
    if clamp:
        cfg.extra["clamp_kqv"] = float(clamp)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     expert_weights_norm=True)


@register("granitemoe")
def _granitemoe(cfg: ModelConfig, md) -> ModelConfig:
    """Granite MoE (reference src/models/granite-moe.cpp): granite scalar
    multipliers + mixtral-style MoE (norm_w=true)."""
    return _granite(cfg, md).with_(expert_weights_norm=True)


@register("dots1")
def _dots1(cfg: ModelConfig, md) -> ModelConfig:
    """dots.llm1 (reference src/models/dots1.cpp): deepseek-v3-style MoE
    (sigmoid gating + selection bias + normalized weights, dense lead
    layers, shared experts) with per-head qk norm."""
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        expert_gating="sigmoid"
        if int(md.get("dots1.expert_gating_func", 2)) == 2 else "softmax",
        expert_weights_norm=bool(md.get("dots1.expert_weights_norm", True)),
        expert_weights_scale=float(md.get("dots1.expert_weights_scale", 1.0)),
    )


@register("glm4moe")
def _glm4moe(cfg: ModelConfig, md) -> ModelConfig:
    """GLM-4.5 MoE (reference src/models/glm4-moe.cpp): partial-rotary NEOX,
    optional qk norm, sigmoid gating with selection bias, shared expert,
    dense lead layers; NextN/MTP tail layers are skipped at conversion."""
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        qk_norm=bool(md.get("glm4moe.attention.use_qk_norm", False)),
        expert_gating="sigmoid",
        expert_weights_norm=bool(md.get("glm4moe.expert_weights_norm", True)),
        expert_weights_scale=float(md.get("glm4moe.expert_weights_scale", 1.0)),
    )


@register("phimoe")
def _phimoe(cfg: ModelConfig, md) -> ModelConfig:
    """PhiMoE (reference src/models/phimoe.cpp): phi3-family layernorm+bias
    blocks with the HF sparsemixer router."""
    cfg.extra["router_jitter"] = float(md.get("phimoe.router_jitter", 0.01))
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     expert_gating="sparsemixer")


@register("t5")
def _t5(cfg: ModelConfig, md) -> ModelConfig:
    """T5/flan-t5/mt5 encoder-decoder (reference src/models/t5.cpp).
    cfg.n_layers becomes the DECODER depth (that is what the KV cache and
    the layers list cover); encoder depth lands in extra."""
    cfg.extra.update(
        t5=True, encoder_decoder=True,
        rel_buckets=int(md.get("t5.attention.relative_buckets_count", 32)),
        enc_n_layers=cfg.n_layers,
        decoder_start_token=int(md.get("t5.decoder_start_token_id", 0)),
    )
    return cfg.with_(
        rope_type=ROPE_TYPE_NONE,
        n_layers=int(md.get("t5.decoder_block_count", cfg.n_layers)),
    )


@register("t5encoder")
def _t5encoder(cfg: ModelConfig, md) -> ModelConfig:
    cfg.extra.update(
        t5=True, t5_encoder_only=True,
        rel_buckets=int(md.get("t5encoder.attention.relative_buckets_count", 32)),
        enc_n_layers=cfg.n_layers,
    )
    return cfg.with_(rope_type=ROPE_TYPE_NONE)


@register("gpt-oss")
def _gpt_oss(cfg: ModelConfig, md) -> ModelConfig:
    """gpt-oss-20B/120B (reference src/models/openai-moe.cpp): alternating
    SWA/dense layers (period 2, SWA on even layers), attention sinks, qkv+out
    biases, MoE every layer with router bias, top-k-then-softmax gating
    (SOFTMAX_WEIGHT) and the clamped swiglu_oai activation; MXFP4 experts."""
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        swa_pattern=int(md.get("gpt-oss.attention.sliding_window_pattern", 2)),
        expert_gating="softmax_weight",
        moe_act="swiglu_oai",
        expert_weights_norm=False,
    )
    swa_base = md.get("gpt-oss.rope.freq_base_swa")
    if swa_base:
        c.extra["rope_freq_base_swa"] = float(swa_base)
    # reference pre-FFN norm is stored as attn_post_norm for this arch
    c.extra["tensor_remap"] = {"attn_post_norm": "ffn_norm"}
    return c


# ---------------------------------------------------------------------------
# round-2 tranche (VERDICT r1 item 9): qwen/chatglm/codeshell/refact/plamo/
# grok/arctic/bitnet/minicpm3/bailingmoe/smallthinker/mistral3/maincoder/
# llama-embed
# ---------------------------------------------------------------------------


@register("qwen")
def _qwen(cfg: ModelConfig, md) -> ModelConfig:
    """Qwen v1 (reference src/models/qwen.cpp): fused QKV with bias, NEOX
    rope, SiLU-GLU FFN."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX)


@register("chatglm")
def _chatglm(cfg: ModelConfig, md) -> ModelConfig:
    """ChatGLM/GLM-3 (reference src/models/chatglm.cpp): partial NORM rope,
    fused QKV (+bias), single fused gate|up SWIGLU tensor."""
    # the single ffn_up tensor holds gate|up halves (LLM_FFN_SWIGLU)
    cfg.extra["tensor_remap"] = {"ffn_up": "ffn_gateup"}
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("codeshell")
def _codeshell(cfg: ModelConfig, md) -> ModelConfig:
    """CodeShell (reference src/models/codeshell.cpp): gpt-bigcode-style
    LayerNorm+bias blocks, fused QKV, GELU FFN, NEOX rope."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     act="gelu", glu=False)


@register("refact")
def _refact(cfg: ModelConfig, md) -> ModelConfig:
    """Refact-1.6B (reference src/models/refact.cpp): ALiBi attention
    (max bias 8), no rope, SiLU-GLU FFN, RMS norms."""
    return cfg.with_(rope_type=ROPE_TYPE_NONE, alibi_bias=8.0)


@register("plamo")
def _plamo(cfg: ModelConfig, md) -> ModelConfig:
    """PLaMo-13B (reference src/models/plamo.cpp): parallel residual with the
    shared attn_norm feeding both attention and FFN, full-head NEOX rope."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, parallel_residual=True,
                     shared_parallel_norm=True)


@register("grok")
def _grok(cfg: ModelConfig, md) -> ModelConfig:
    """Grok-1 (reference src/models/grok.cpp): GELU MoE (+optional dense FFN
    summed then scaled sqrt(2)/2), attention logits scaled by the output
    multiplier inside a 30.0 tanh softcap, embedding/logit scales, post
    norms on both halves."""
    a = cfg.arch
    cfg.extra["dense_moe_scale"] = 0.7071067811865476
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        act="gelu",
        expert_weights_norm=True,
        embd_scale=float(md.get(f"{a}.embedding_scale", 78.38367176906169)),
        logit_scale=float(md.get(f"{a}.logit_scale", 0.5773502691896257)),
        attn_scale=float(md.get(f"{a}.attention.output_scale",
                                0.08838834764831845)),
        attn_logit_softcap=float(md.get(f"{a}.attn_logit_softcapping", 30.0)),
        final_logit_softcap=float(md.get(f"{a}.final_logit_softcapping", 0.0)),
        post_norms=True,
    )


@register("arctic")
def _arctic(cfg: ModelConfig, md) -> ModelConfig:
    """Snowflake Arctic (reference src/models/arctic.cpp): dense FFN residual
    plus a 128-expert MoE branch normed separately off the layer input
    (ffn_norm_exps; wired in transformer.forward)."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM, expert_weights_norm=True)


@register("bitnet")
def _bitnet(cfg: ModelConfig, md) -> ModelConfig:
    """BitNet b1.58 (reference src/models/bitnet.cpp): ternary weights with
    per-tensor scalar scales (folded at load), sub-norms before o_proj and
    ffn_down, tied head."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX)


@register("minicpm3")
def _minicpm3(cfg: ModelConfig, md) -> ModelConfig:
    """MiniCPM3 (reference src/models/minicpm3.cpp): MLA attention like
    deepseek2 (q-LoRA + kv latent) with MiniCPM mu-param scales (embd 12,
    residual 1.4/sqrt(L), logit n_embd/dim_model_base)."""
    a = cfg.arch
    cfg.extra.update(
        kv_lora_rank=int(md.get(f"{a}.attention.kv_lora_rank", 256)),
        q_lora_rank=int(md.get(f"{a}.attention.q_lora_rank", 0) or 0),
    )
    dim_base = float(md.get(f"{a}.embedding_scale_base",
                            md.get(f"{a}.dim_model_base", 256.0)) or 256.0)
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        n_kv_heads=cfg.n_heads,  # naive MHA expansion of the latent
        embd_scale=12.0,
        residual_scale=1.4 / (cfg.n_layers ** 0.5),
        # lm_head scaled by n_embd_base/n_embd (minicpm3.cpp:248)
        logit_scale=dim_base / max(cfg.n_embd, 1),
        tie_embeddings=True,
    )
    _mla_absorb_extras(c)
    return c


@register("bailingmoe")
def _bailingmoe(cfg: ModelConfig, md) -> ModelConfig:
    """BailingMoE / Ling (reference src/models/bailingmoe.cpp): partial NORM
    rope (head dim = n_rot), softmax-gated MoE with shared experts and
    leading dense layers."""
    a = cfg.arch
    return cfg.with_(
        rope_type=ROPE_TYPE_NORM,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", False)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 0)),
    )


@register("smallthinker")
def _smallthinker(cfg: ModelConfig, md) -> ModelConfig:
    """SmallThinker MoE (reference src/models/smallthinker.cpp): ReLU expert
    FFNs, router fed the RAW residual stream (not the normed input), optional
    SWA pattern."""
    a = cfg.arch
    cfg.extra["router_raw_input"] = True
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 1) or 1), "softmax")
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, act="relu",
                     expert_weights_norm=True, expert_gating=gating)


@register("mistral3")
def _mistral3(cfg: ModelConfig, md) -> ModelConfig:
    """Mistral-3 (reference src/models/mistral3.cpp): llama graph with NORM
    rope; optional attention-temperature scaling is not applied (reference
    uses it only when f_attn_temp_scale != 0)."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("maincoder")
def _maincoder(cfg: ModelConfig, md) -> ModelConfig:
    """MainCoder (reference src/models/maincoder.cpp): llama-style graph,
    NORM rope."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("llama-embed")
def _llama_embed(cfg: ModelConfig, md) -> ModelConfig:
    """llama-embed (reference src/models/llama-embed.cpp): the llama graph
    instantiated for embeddings (non-causal pooling handled by the runtime)."""
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("mellum")
def _mellum(cfg: ModelConfig, md) -> ModelConfig:
    """JetBrains Mellum (reference src/models/mellum.cpp): qk per-head
    rmsnorm, MoE FFN, optional SWA pattern with a local freq base."""
    a = cfg.arch
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        expert_weights_norm=True,  # mellum.cpp build_moe_ffn norm_w=true
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 0)),
        swa_pattern=int(md.get(f"{a}.attention.sliding_window_pattern", 4)),
    )
    swa_base = md.get(f"{a}.rope.freq_base_swa")
    if swa_base:
        c.extra["rope_freq_base_swa"] = float(swa_base)
    return c


@register("pangu-embedded")
def _pangu_embedded(cfg: ModelConfig, md) -> ModelConfig:
    """Pangu Embedded (reference src/models/pangu-embed.cpp): llama-family
    graph, NEOX rope, optional attention/ffn biases."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX)


@register("minimax-m2")
def _minimax_m2(cfg: ModelConfig, md) -> ModelConfig:
    """MiniMax-M2 (reference src/models/minimax-m2.cpp): full-width qk
    rmsnorm before rope, MoE with expert-selection bias (exp_probs_b) and
    a configurable gating function."""
    a = cfg.arch
    cfg.extra["qk_norm_full"] = True
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 2) or 2), "sigmoid")
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", True)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
    )


@register("hunyuan-moe")
def _hunyuan_moe(cfg: ModelConfig, md) -> ModelConfig:
    """HunYuan MoE (reference src/models/hunyuan-moe.cpp): per-head qk
    rmsnorm after rope (hunyuan-dense style) + MoE with a gated shared
    expert FFN."""
    a = cfg.arch
    cfg.extra["qk_norm_after_rope"] = True
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        expert_weights_norm=True,  # hunyuan-moe.cpp: norm_topk_prob=true
        n_expert_shared=max(1, int(md.get(f"{a}.expert_shared_count", 1))),
    )


@register("exaone-moe")
def _exaone_moe(cfg: ModelConfig, md) -> ModelConfig:
    """EXAONE-MoE (reference src/models/exaone-moe.cpp): pre-norm blocks,
    per-head qk rmsnorm before rope, iSWA pattern (default window 128 /
    period 4) with rope ONLY on the local layers, MoE with gated shared
    expert and a configurable gating function."""
    a = cfg.arch
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 1) or 1), "softmax")
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 128)),
        swa_pattern=int(md.get(f"{a}.attention.sliding_window_pattern", 4)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 0)),
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", False)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
    )
    # exaone-moe.cpp ropes only is_swa (local) layers
    c.extra["no_rope_layers"] = tuple(
        il for il in range(c.n_layers) if not c.is_swa_layer(il))
    swa_base = md.get(f"{a}.rope.freq_base_swa")
    if swa_base:
        c.extra["rope_freq_base_swa"] = float(swa_base)
    return c


@register("cohere2moe")
def _cohere2moe(cfg: ModelConfig, md) -> ModelConfig:
    """Command-A MoE (reference src/models/cohere2moe.cpp): cohere2 parallel
    residual + iSWA and rope-on-SWA-only, with a sigmoid/softmax-gated MoE
    and shared dense FFN."""
    a = cfg.arch
    pat = int(md.get(f"{a}.attention.sliding_window_pattern", 4))
    # gating defaults to SIGMOID when the key is absent (cohere2moe.cpp:27)
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 2) or 2), "sigmoid")
    # RMS when a rms-eps key is present, LN otherwise (cohere2moe.cpp:5-9)
    has_rms = f"{a}.attention.layer_norm_rms_epsilon" in md
    # swa layers are dense-FIRST: il % pat != 0 (set_swa_pattern(p, true))
    cfg.extra["swa_first_global"] = True
    c = cfg.with_(
        rope_type=ROPE_TYPE_NORM, use_rms_norm=has_rms,
        parallel_residual=True, shared_parallel_norm=True,
        logit_scale=float(md.get(f"{a}.logit_scale", 1.0)),
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 0)),
        swa_pattern=pat,
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", False)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 0)),
        tie_embeddings=True,
    )
    if c.sliding_window > 0:
        c.extra["no_rope_layers"] = tuple(
            il for il in range(c.n_layers) if not c.is_swa_layer(il))
    return c


@register("llada-moe")
def _llada_moe(cfg: ModelConfig, md) -> ModelConfig:
    """LLaDA-MoE diffusion LM (reference src/models/llada-moe.cpp): full
    bidirectional attention, per-head qk rmsnorm, softmax MoE with RAW
    top-k weights (build_moe_ffn norm_w=false, llada-moe.cpp:133)."""
    cfg.extra.update(non_causal=True, diffusion=True,
                     diffusion_shift_logits=False)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                     expert_weights_norm=False)


@register("rnd1")
def _rnd1(cfg: ModelConfig, md) -> ModelConfig:
    """RND1 diffusion LM (reference src/models/rnd1.cpp): qwen3moe-style
    blocks (per-head qk norm, MoE) with non-causal attention."""
    cfg.extra.update(non_causal=True, diffusion=True,
                     diffusion_shift_logits=False)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                     expert_weights_norm=True)


@register("minimax-m3")
def _minimax_m3(cfg: ModelConfig, md) -> ModelConfig:
    """MiniMax-M3 MSA (reference src/models/minimax-m3.cpp + src/llama-kv-
    cache-msa.h): dense-lead layers then block-sparse attention — a per-GQA-
    group indexer scores positions, block-max pooling + forced local blocks,
    top-k blocks gate the mask. Per-head qk rmsnorm (+1 baked), partial
    rope, MoE with shared experts."""
    a = cfg.arch
    cfg.extra.update(
        msa=True,
        indexer_n_head=int(md.get(f"{a}.attention.indexer.head_count",
                                  cfg.n_kv_heads)),
        indexer_head_size=int(md.get(f"{a}.attention.indexer.key_length", 128)),
        indexer_top_k=int(md.get(f"{a}.attention.indexer.top_k", 16)),
        indexer_block_size=int(md.get(f"{a}.attention.indexer.block_size", 64)),
        indexer_local_blocks=int(md.get(f"{a}.attention.indexer.local_blocks", 1)),
        msa_dense_lead=int(md.get(f"{a}.leading_dense_block_count", 0)),
    )
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 1) or 1), "softmax")
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", False)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 0)),
    )


@register("neo-bert")
def _neo_bert(cfg: ModelConfig, md) -> ModelConfig:
    """NeoBERT (reference src/models/neo-bert.cpp): pre-norm RMS encoder,
    NORM rope (llama-model.cpp rope-type table), fused gate|up SWIGLU FFN,
    enc.output_norm final norm."""
    cfg.extra.update(encoder=True, pre_norm_encoder=True)
    return cfg.with_(rope_type=ROPE_TYPE_NORM, act="silu")


@register("eurobert")
def _eurobert(cfg: ModelConfig, md) -> ModelConfig:
    """EuroBERT (reference src/models/eurobert.cpp): pre-norm RMS encoder
    with llama-style gated SiLU FFN and NEOX rope."""
    cfg.extra.update(encoder=True, pre_norm_encoder=True)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, act="silu")


@register("nomic-bert-moe")
def _nomic_bert_moe(cfg: ModelConfig, md) -> ModelConfig:
    """nomic-embed-text-v2 MoE (reference src/models/nomic-bert-moe.cpp):
    nomic encoder where every moe_every_n-th layer swaps the FFN for
    gate-less GELU experts with softmax-normalized top-k routing."""
    cfg.extra["encoder"] = True
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     act="gelu", glu=False)


def _swa_pattern_extra(cfg: ModelConfig, md, a: str,
                       scalar_is_array: bool = False) -> ModelConfig:
    """Shared SWA-pattern plumbing: scalar period or per-layer bool array
    (LLM_KV_ATTENTION_SLIDING_WINDOW_PATTERN get_key_or_arr), plus the
    optional local-layer rope base."""
    pat = md.get(f"{a}.attention.sliding_window_pattern", 4)
    if isinstance(pat, (list, tuple)) or hasattr(pat, "__len__"):
        cfg.extra["is_swa_layers"] = tuple(bool(int(v)) for v in pat)
        pat_i = 0
    elif scalar_is_array:
        # mimo2.cpp/step35.cpp read the pattern with get_key_or_arr into
        # the PER-LAYER array: a scalar key broadcasts, so any nonzero
        # scalar means every layer is SWA
        cfg.extra["is_swa_layers"] = tuple([bool(int(pat))] * cfg.n_layers)
        pat_i = 0
    else:
        pat_i = int(pat)
    swa_base = md.get(f"{a}.rope.freq_base_swa")
    if swa_base:
        cfg.extra["rope_freq_base_swa"] = float(swa_base)
    return cfg.with_(
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 0)),
        swa_pattern=pat_i,
    )


@register("bailingmoe2")
def _bailingmoe2(cfg: ModelConfig, md) -> ModelConfig:
    """Ling/Ring 2.0 (reference src/models/bailingmoe2.cpp): NEOX rope,
    per-head qk rmsnorm, dense-lead layers then MoE with selection bias +
    gated shared expert; optional nextn (MTP) tail layers are draft-only
    tensors and are skipped here."""
    a = cfg.arch
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 1) or 1), "softmax")
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", False)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 0)),
    )


@register("step35")
def _step35(cfg: ModelConfig, md) -> ModelConfig:
    """Step-3.5 (reference src/models/step35.cpp): NEOX MoE with sigmoid
    gating by default, shared expert, per-layer SWA pattern array with a
    local rope base."""
    a = cfg.arch
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 2) or 2), "sigmoid")
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", False)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 0)),
    )
    return _swa_pattern_extra(c, md, a, scalar_is_array=True)


@register("mimo2")
def _mimo2(cfg: ModelConfig, md) -> ModelConfig:
    """MiMo-2 (reference src/models/mimo2.cpp): sigmoid-gated normed MoE +
    per-layer SWA array (scalar pattern key broadcasts to every layer),
    attention sinks, optional value scale folded by the converter; nextn
    (MTP) tail layers skipped."""
    a = cfg.arch
    # mimo2.cpp hard-codes GATING_FUNC_TYPE_SIGMOID with norm_w=true
    c = cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                  expert_gating="sigmoid", expert_weights_norm=True)
    return _swa_pattern_extra(c, md, a, scalar_is_array=True)


@register("grovemoe")
def _grovemoe(cfg: ModelConfig, md) -> ModelConfig:
    """GroveMoE (reference src/models/grovemoe.cpp): softmax MoE plus
    adjugate per-group chunk experts applied to the expert-mix output and
    scaled by expert_group_scale; per-head qk rmsnorm, NEOX rope."""
    a = cfg.arch
    cfg.extra.update(
        n_group_experts=int(md.get(f"{a}.experts_per_group", 1)),
        expert_group_scale=float(md.get(f"{a}.expert_group_scale", 0.05)),
    )
    n_group = max(1, cfg.extra["n_group_experts"])
    n_exp = int(md.get(f"{a}.expert_count", 0) or 0)
    if n_exp:
        cfg.extra["n_chunk_expert"] = max(1, n_exp // n_group)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True)


@register("gemma-embedding")
def _gemma_embedding(cfg: ModelConfig, md) -> ModelConfig:
    """EmbeddingGemma (reference src/models/gemma-embedding.cpp): the gemma3
    stack run bidirectionally with SYMMETRIC sliding windows; pooling is the
    runtime's job (Context.embed)."""
    a = cfg.arch
    cfg.extra.update(non_causal=True)
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        act="gelu",
        embd_scale=float(cfg.n_embd) ** 0.5,
        post_norms=True,
        qk_norm=True,
        tie_embeddings=True,
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 0)),
        swa_pattern=int(md.get(f"{a}.attention.sliding_window_pattern", 6)),
        attn_scale=1.0 / (float(cfg.head_dim_k) ** 0.5),
    )
    swa_base = md.get(f"{a}.rope.freq_base_swa")
    if swa_base:
        c.extra["rope_freq_base_swa"] = float(swa_base)
    return c


@register("jina-bert-v3")
def _jina_bert_v3(cfg: ModelConfig, md) -> ModelConfig:
    """jina-embeddings-v3 (reference src/models/jina-bert-v3.cpp): post-norm
    BERT encoder with rope (NEOX) and GLU FFN; the attn_out_norm tensor is
    this family's per-layer output norm."""
    cfg.extra["encoder"] = True
    # the loader's grok-oriented attn_out_norm->attn_post_norm mapping must
    # land on the encoder's attn_output_norm slot here
    cfg.extra["tensor_remap"] = {"attn_post_norm": "attn_output_norm",
                                 "ffn_post_norm": "layer_output_norm"}
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False, act="gelu")


@register("afmoe")
def _afmoe(cfg: ModelConfig, md) -> ModelConfig:
    """AFMoE (reference src/models/afmoe.cpp): sigmoid attention gate before
    o_proj (qwen3next-style attn_gate), per-head qk rmsnorm, periodic NoPE
    layers, dual post-norms, dense-lead then sigmoid-gated MoE with
    selection bias and shared experts, optional SWA pattern."""
    a = cfg.arch
    step = int(md.get(f"{a}.rope.no_rope_layer_step", 0) or 0)
    if step > 0:
        cfg.extra["no_rope_layers"] = tuple(
            il for il in range(cfg.n_layers) if (il + 1) % step == 0)
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 2) or 2), "sigmoid")
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True, post_norms=True,
        embd_scale=float(cfg.n_embd) ** 0.5,  # afmoe.cpp: inpL * sqrt(E)
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", True)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 0)),
    )
    return _swa_pattern_extra(c, md, a)


@register("plamo2")
def _plamo2(cfg: ModelConfig, md) -> ModelConfig:
    """PLaMo-2 hybrid (reference src/models/plamo2.cpp): interleaved mamba
    (per-head dt/A/D, post-conv x_proj with rms-normed B/C/dt, swiglu z
    gate) and attention (fused qkv, per-head-weight qk rmsnorm, full-dim
    rope) layers; post-norms on both block halves; fused SWIGLU FFN. Uses
    the PLaMo-2 Aho-Corasick/Viterbi tokenizer (tokenizer/PLaMo2Tokenizer)."""
    a = cfg.arch
    d_inner = int(md.get(f"{a}.ssm.inner_size", 2 * cfg.n_embd))
    cfg.extra.update(
        memory="hybrid", plamo2=True,
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=d_inner,
        ssm_d_state=int(md.get(f"{a}.ssm.state_size", 64)),
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", d_inner // 64)),
        ssm_n_group=0,
        ssm_conv_dim=d_inner,
    )
    cfg.extra["tensor_remap"] = {"ffn_up": "ffn_gateup"}
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True, post_norms=True)


@register("plamo3")
def _plamo3(cfg: ModelConfig, md) -> ModelConfig:
    """PLaMo-3 (reference src/models/plamo3.cpp): pure-attention plamo2
    successor — fused qkv, per-head qk rmsnorm, post-norms on both halves,
    fused SWIGLU FFN, optional SWA with a local rope base."""
    a = cfg.arch
    cfg.extra["tensor_remap"] = {"ffn_up": "ffn_gateup"}
    c = cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True, post_norms=True)
    return _swa_pattern_extra(c, md, a)


@register("talkie")
def _talkie(cfg: ModelConfig, md) -> ModelConfig:
    """Talkie (reference src/models/talkie.cpp): weightless RMS norms
    throughout, qk-norm after rope (per-head scalar weight on q only), and
    the rms-normalized EMBEDDING added to every layer output scaled by a
    per-layer layer_output_scale scalar; logit scale on the head."""
    a = cfg.arch
    cfg.extra.update(weightless_norm=True, embd_skip=True,
                     qk_norm_after_rope=True)
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        logit_scale=float(md.get(f"{a}.logit_scale", 1.0)),
    )


@register("eagle3")
def _eagle3(cfg: ModelConfig, md) -> ModelConfig:
    """EAGLE3 speculative draft head (reference src/models/eagle3.cpp):
    ONE llama-style decoder layer whose attention input is
    concat(norm(tok_embd), norm(g)) — 2*n_embd wide — plus an `fc`
    feature-fusion encoder over 3 extracted target layers. Driven by
    models/eagle3.py::Eagle3Speculator, not the shared forward."""
    ids = md.get("eagle3.target_layers")
    if ids is None:
        raise ValueError("EAGLE3 model requires eagle3.target_layers metadata")
    if hasattr(ids, "tolist"):
        ids = ids.tolist()
    cfg.extra.update(
        target_layers=tuple(int(i) for i in ids),
        target_hidden_size=int(md.get("eagle3.target_hidden_size", cfg.n_embd)),
        norm_before_residual=bool(md.get("eagle3.norm_before_residual", False)),
        norm_before_fc=bool(md.get("eagle3.norm_before_fc", False)),
        draft_only=True,  # no standalone generate: paired with a target
    )
    return cfg.with_(rope_type=ROPE_TYPE_NORM)


@register("dflash")
def _dflash(cfg: ModelConfig, md) -> ModelConfig:
    """DFlash block-diffusion drafter (reference src/models/dflash.cpp):
    an `fc` encoder fusing N extracted target-layer inputs into g
    embeddings that are injected as the drafter's K/V context, plus a small
    llama-style stack (per-head qk rmsnorm, swiglu) that denoises a
    [id_last, <mask>...] block non-causally. NEOX rope for the legacy
    backbone (llama-model.cpp:2689; the DSV4/DSpark variant is NORM and
    not yet implemented here). Driven by models/dflash.py, not the shared
    forward."""
    ids = md.get("dflash.target_layers")
    if ids is None:
        raise ValueError("DFlash model requires dflash.target_layers "
                         "metadata (dflash.cpp:7-9)")
    if hasattr(ids, "tolist"):
        ids = ids.tolist()
    if int(md.get("dflash.hyper_connection_count", 0) or 0) > 0:
        raise NotImplementedError("DSpark/DSV4 dflash variant")
    cfg.extra.update(
        target_layers=tuple(int(i) for i in ids),
        block_size=int(md.get("dflash.block_size", 16)),
        mask_token_id=int(md.get("tokenizer.ggml.mask_token_id", 0)),
        draft_only=True,
        no_qkv_fuse=True,  # KV injection needs standalone wk/wv
    )
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True)


def _as_arr(v):
    """GGUF per-layer int array -> tuple (handles numpy arrays/lists)."""
    if v is None:
        return None
    if hasattr(v, "tolist"):
        v = v.tolist()
    if not isinstance(v, (list, tuple)):
        return None  # scalar: uniform across layers, no array needed
    return tuple(int(x) for x in v)


@register("starcoder")
def _starcoder(cfg: ModelConfig, md) -> ModelConfig:
    """StarCoder / gpt-bigcode (reference src/models/starcoder.cpp): learned
    absolute positions, layernorm blocks, fused biased QKV (MQA), sequential
    gelu FFN with biases; output falls back to tok_embd."""
    return cfg.with_(rope_type=ROPE_TYPE_NONE, use_rms_norm=False,
                     act="gelu", glu=False, tie_embeddings=True)


@register("jais2")
def _jais2(cfg: ModelConfig, md) -> ModelConfig:
    """Jais-2 (reference src/models/jais2.cpp): layernorm blocks, separate
    biased Q/K/V + NEOX RoPE (llama-model.cpp:2664 rope table), non-gated
    relu^2 FFN with biases."""
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, use_rms_norm=False,
                     act="relu2", glu=False, tie_embeddings=True)


@register("openelm")
def _openelm(cfg: ModelConfig, md) -> ModelConfig:
    """Apple OpenELM (reference src/models/openelm.cpp): per-layer head/kv
    head/ffn arrays, fused QKV split [q|k|v] per layer, shared [head_dim]
    q/k rmsnorm, NEOX rope, silu GLU FFN, tied output."""
    a = cfg.arch
    heads = _as_arr(md.get(f"{a}.attention.head_count"))
    kvh = _as_arr(md.get(f"{a}.attention.head_count_kv"))
    if heads is not None:
        cfg.extra.update(n_head_arr=heads)
    if kvh is not None:
        cfg.extra.update(n_head_kv_arr=kvh)
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                     tie_embeddings=True)


@register("deci")
def _deci(cfg: ModelConfig, md) -> ModelConfig:
    """DeciLM / Llama-3_1-Nemotron NAS (reference src/models/deci.cpp):
    llama graph with per-layer head arrays where a layer may be normal
    attention, "linear attention" (n_head>0, n_head_kv==0: out = wo@norm(x)),
    attention-free (n_head==0: FFN only, normed by ffn_norm), or a dummy
    identity layer (both 0)."""
    a = cfg.arch
    heads = _as_arr(md.get(f"{a}.attention.head_count"))
    kvh = _as_arr(md.get(f"{a}.attention.head_count_kv"))
    if heads is not None:
        cfg.extra.update(n_head_arr=heads)
    if kvh is not None:
        cfg.extra.update(n_head_kv_arr=kvh)
    return cfg.with_(rope_type=ROPE_TYPE_NORM, tie_embeddings=True)


@register("nanbeige")
def _nanbeige(cfg: ModelConfig, md) -> ModelConfig:
    """Nanbeige looped-layer llama (reference src/models/nanbeige.cpp): the
    physical layer stack runs num_loops times with shared weights (each
    logical pass keeps separate KV), re-applying output_norm at every loop
    boundary unless skip_loop_final_norm."""
    a = cfg.arch
    loops = int(md.get(f"{a}.num_loops", 1))
    cfg.extra.update(
        n_loops=loops,
        skip_loop_final_norm=bool(md.get(f"{a}.skip_loop_final_norm", False)),
    )
    return cfg.with_(rope_type=ROPE_TYPE_NORM,
                     n_layers=cfg.n_layers * max(loops, 1))


@register("rwkv6qwen2")
def _rwkv6qwen2(cfg: ModelConfig, md) -> ModelConfig:
    """RWKV6-Qwen2 hybrid / qrwkv (reference src/models/rwkv6qwen2.cpp):
    rwkv6 time mix WITHOUT the `u` bonus (gated linear attention, sigmoid
    gate, GQA-repeated k/v, k*(1-w)) + qwen2 silu-GLU FFN and rms norms."""
    a = cfg.arch
    hs = int(md.get(f"{a}.wkv.head_size", 64))
    cfg.extra.update(
        memory="recurrent", rwkv=True, rwkv_hybrid=True, wkv_head_size=hs,
        ssm_d_conv=3, ssm_d_inner=cfg.n_embd, ssm_d_state=hs,
    )
    return cfg


@register("arwkv7")
def _arwkv7(cfg: ModelConfig, md) -> ModelConfig:
    """ARWKV-7 (reference src/models/arwkv7.cpp): rwkv7 time mix without the
    group-norm tail (no time_mix_ln) + qwen2 silu-GLU FFN, rms norms, single
    token-shift stream."""
    a = cfg.arch
    hs = int(md.get(f"{a}.wkv.head_size", 64))
    cfg.extra.update(
        memory="recurrent", rwkv=True, rwkv_hybrid=True, wkv_head_size=hs,
        ssm_d_conv=3, ssm_d_inner=cfg.n_embd, ssm_d_state=hs,
    )
    return cfg


@register("mistral4")
def _mistral4(cfg: ModelConfig, md) -> ModelConfig:
    """Mistral-4 (reference models.h:1316: llama_model_mistral4 is a pure
    llama_model_deepseek2 alias — same MLA hparams/tensors/graph)."""
    md2 = {k.replace("mistral4.", "deepseek2."): v for k, v in md.items()}
    return _deepseek2(cfg.with_(arch="deepseek2"), md2).with_(arch=cfg.arch)


@register("nemotron_h_moe")
def _nemotron_h_moe(cfg: ModelConfig, md) -> ModelConfig:
    """Nemotron-H-MoE (reference models.h:1458: pure llama_model_nemotron_h
    alias); F-layers route through the MoE FFN when expert tensors exist."""
    md2 = {k.replace("nemotron_h_moe.", "nemotron_h."): v for k, v in md.items()}
    return _nemotron_h(cfg.with_(arch="nemotron_h"), md2).with_(arch=cfg.arch)


@register("plm")
def _plm(cfg: ModelConfig, md) -> ModelConfig:
    """PLM (reference src/models/plm.cpp): deepseek2-style MLA attention
    without q-lora + non-gated relu^2 sequential FFN, tied output."""
    cfg.extra.update(
        kv_lora_rank=int(md.get("plm.attention.kv_lora_rank", 512)),
        q_lora_rank=0,
    )
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        n_kv_heads=cfg.n_heads,
        act="relu2", glu=False, tie_embeddings=True,
    )
    _mla_absorb_extras(c)
    return c


@register("laguna")
def _laguna(cfg: ModelConfig, md) -> ModelConfig:
    """Laguna (reference src/models/laguna.cpp): qwen3-style qk-norm with a
    SOFTPLUS attention output gate (per-head on XS.2, per-element on M.1 —
    detected from the gate tensor width), sigmoid-routed MoE with score
    bias + one shared expert after leading dense layers, and per-layer-type
    rope on the hybrid full/SWA variant (SWA layers: plain rope over
    dimension_count_swa at freq_base_swa)."""
    a = cfg.arch
    heads = _as_arr(md.get(f"{a}.attention.head_count"))
    if heads is not None and len(set(heads)) > 1:
        cfg.extra.update(n_head_arr=heads)
    cfg.extra.update(attn_gate_fn="softplus", swa_first_global=True)
    dims_swa = md.get(f"{a}.rope.dimension_count_swa")
    if dims_swa:
        cfg.extra["rope_dims_swa"] = int(dims_swa)
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 2) or 2), "sigmoid")
    c = cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True,
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", False)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 1) or 1),
    )
    return _swa_pattern_extra(c, md, a)


@register("jina-bert-v2")
def _jina_bert_v2(cfg: ModelConfig, md) -> ModelConfig:
    """jina-embeddings v2 (reference src/models/jina-bert-v2.cpp): post-norm
    bert encoder with symmetric ALiBi (max bias 8), optional full-width q/k
    LayerNorm, and a GEGLU FFN (separate gate or up-contains-gate)."""
    cfg.extra["encoder"] = True
    return cfg.with_(rope_type=ROPE_TYPE_NONE, use_rms_norm=False,
                     act="gelu", glu=False, alibi_bias=8.0)


def _qwen3vl_common(cfg: ModelConfig, md, a: str) -> ModelConfig:
    sec = md.get(f"{a}.rope.dimension_sections", [24, 20, 20, 0])
    if hasattr(sec, "tolist"):
        sec = sec.tolist()
    sec = tuple(int(x) for x in sec)
    cfg.extra.update(
        mrope_sections=sec, imrope=True,
        n_deepstack=int(md.get(f"{a}.n_deepstack_layers", 0) or 0),
    )
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True,
                     tie_embeddings=True)


@register("qwen3vl")
def _qwen3vl(cfg: ModelConfig, md) -> ModelConfig:
    """Qwen3-VL text model (reference src/models/qwen3vl.cpp): qwen3 graph
    with INTERLEAVED m-rope (GGML_ROPE_TYPE_IMROPE) and deepstack vision
    residuals added to the first n_deepstack_layers outputs."""
    return _qwen3vl_common(cfg, md, cfg.arch)


@register("qwen3vlmoe")
def _qwen3vlmoe(cfg: ModelConfig, md) -> ModelConfig:
    """Qwen3-VL-MoE (reference src/models/qwen3vlmoe.cpp): qwen3vl with the
    qwen3moe expert FFN (softmax routing, normalized top-k weights)."""
    c = _qwen3vl_common(cfg, md, cfg.arch)
    return c.with_(expert_weights_norm=True)


@register("qwen3tts")
def _qwen3tts(cfg: ModelConfig, md) -> ModelConfig:
    """Qwen3-TTS (reference models.h:599: pure llama_model_qwen3vl alias;
    the output head is the 3072-code audio codebook)."""
    return _qwen3vl_common(cfg, md, cfg.arch)


def _qwen35_common(cfg: ModelConfig, md, a: str) -> ModelConfig:
    d_inner = int(md.get(f"{a}.ssm.inner_size", 0))
    ng = int(md.get(f"{a}.ssm.group_count", 1))
    st = int(md.get(f"{a}.ssm.state_size", 128))
    sec = md.get(f"{a}.rope.dimension_sections", [24, 20, 20, 0])
    if hasattr(sec, "tolist"):
        sec = sec.tolist()
    cfg.extra.update(
        memory="hybrid", ssm_version=2,
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_inner=d_inner, ssm_d_state=st,
        ssm_dt_rank=int(md.get(f"{a}.ssm.time_step_rank", 1)),
        ssm_n_group=ng,
        ssm_conv_dim=2 * ng * st + d_inner,
        mrope_sections=tuple(int(x) for x in sec),
        imrope=True,
        q_gate_interleaved=True,
    )
    return cfg.with_(rope_type=ROPE_TYPE_NEOX, qk_norm=True)


@register("qwen35")
def _qwen35(cfg: ModelConfig, md) -> ModelConfig:
    """Qwen3.5 dense (reference src/models/qwen35.cpp): qwen3next-style
    hybrid — gated DeltaNet linear layers (separate ssm_beta/ssm_alpha,
    flat wqkv + z gate) every non-interval layer, gated full attention
    (per-head [q|gate] wq) with INTERLEAVED m-rope, dense silu FFN."""
    return _qwen35_common(cfg, md, cfg.arch)


@register("qwen35moe")
def _qwen35moe(cfg: ModelConfig, md) -> ModelConfig:
    """Qwen3.5-MoE (reference src/models/qwen35moe.cpp): qwen35 hybrid with
    the qwen3next MoE FFN (softmax top-k, normalized weights, gated shared
    expert)."""
    c = _qwen35_common(cfg, md, cfg.arch)
    return c.with_(expert_weights_norm=True, n_expert_shared=1)


@register("glm-dsa")
def _glm_dsa(cfg: ModelConfig, md) -> ModelConfig:
    """GLM-5 DSA (reference src/models/glm-dsa.cpp): deepseek32-style MLA +
    lightning indexer where only the "full" indexer layers (indexer_types
    array; default GLM-5.2 pattern = every 4th after the first two) compute
    a top-k selection — "lite" layers REUSE the previous full layer's
    selection. MLA decompression arrives pre-split (attn_k_b/attn_v_b) and
    is refused at load; MoE has dense-lead layers, score bias and shared
    experts."""
    a = cfg.arch
    head_k = int(md.get(f"{a}.attention.key_length_mla", cfg.head_dim_k))
    head_v = int(md.get(f"{a}.attention.value_length_mla", cfg.head_dim_v))
    cfg.extra.update(
        kv_lora_rank=int(md.get(f"{a}.attention.kv_lora_rank", 512)),
        q_lora_rank=int(md.get(f"{a}.attention.q_lora_rank", 0) or 0),
        dsa=True,
        indexer_n_head=int(md.get(f"{a}.attention.indexer.head_count", 64)),
        indexer_head_size=int(md.get(f"{a}.attention.indexer.key_length", 128)),
        indexer_top_k=int(md.get(f"{a}.attention.indexer.top_k", 2048)),
    )
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        n_kv_heads=cfg.n_heads,  # DSA keeps the naive expanded cache
        head_dim_k=head_k, head_dim_v=head_v,
        expert_gating="sigmoid"
        if int(md.get(f"{a}.expert_gating_func", 2) or 2) == 2 else "softmax",
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", True)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 1) or 0),
    )


@register("hy_v3")
def _hy_v3(cfg: ModelConfig, md) -> ModelConfig:
    """Hunyuan V3 (reference src/models/hy-v3.cpp): qwen3-style per-head
    qk-norm + NEOX rope, sigmoid-routed MoE with selection bias, leading
    dense layers, always-on shared expert; MTP nextn blocks beyond the
    trunk are draft-only."""
    a = cfg.arch
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 2) or 2), "sigmoid")
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX, qk_norm=True, tie_embeddings=True,
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", False)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 1) or 1),
    )


@register("kimi-linear")
def _kimi_linear(cfg: ModelConfig, md) -> ModelConfig:
    """Kimi-Linear (reference src/models/kimi-linear.cpp): hybrid KDA
    (delta rule with per-channel decay, separate q/k/v causal convs,
    sigmoid-gated rmsnorm output) + rope-free MLA layers, with sigmoid MoE
    and shared experts after leading dense layers."""
    a = cfg.arch
    head_k = int(md.get(f"{a}.attention.key_length_mla", cfg.head_dim_k))
    head_v = int(md.get(f"{a}.attention.value_length_mla", cfg.head_dim_v))
    kda_dh = int(md.get(f"{a}.kda.head_dim", 128))
    d_inner = cfg.n_heads * kda_dh
    cfg.extra.update(
        kv_lora_rank=int(md.get(f"{a}.attention.kv_lora_rank", 512)),
        q_lora_rank=int(md.get(f"{a}.attention.q_lora_rank", 0) or 0),
        memory="hybrid",
        kda_head_dim=kda_dh,
        ssm_d_conv=int(md.get(f"{a}.ssm.conv_kernel", 4)),
        ssm_d_state=kda_dh,
        ssm_d_inner=d_inner,
        ssm_conv_dim=3 * d_inner,  # separate q/k/v conv windows
    )
    gating = {1: "softmax", 2: "sigmoid"}.get(
        int(md.get(f"{a}.expert_gating_func", 2) or 2), "sigmoid")
    return cfg.with_(
        rope_type=ROPE_TYPE_NONE,  # rope-free MLA (vLLM rotary_emb=None)
        n_kv_heads=cfg.n_heads,  # naive MHA expansion of the MLA latent
        head_dim_k=head_k, head_dim_v=head_v,
        expert_gating=gating,
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", True)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 1) or 1),
    )


@register("deepseek4")
def _deepseek4(cfg: ModelConfig, md) -> ModelConfig:
    """DeepSeek-V4 (reference src/models/deepseek4.cpp + the DSV4 cache):
    hyper-connection residual streams, single-latent k==v attention with
    grouped low-rank o-projection and output de-rope, per-layer compressed
    KV (CSA ratio 4 with lightning-indexer top-k; HCA ratio 128) over a raw
    SWA window, sqrt-softplus MoE with hash-routed leading layers."""
    a = cfg.arch
    ratios = md.get(f"{a}.attention.compress_ratios")
    if ratios is None:
        ratios = [4] * cfg.n_layers
    if hasattr(ratios, "tolist"):
        ratios = ratios.tolist()
    cfg.extra.update(
        dsv4=True,
        compress_ratios=tuple(int(r) for r in ratios)[: cfg.n_layers],
        hc_mult=int(md.get(f"{a}.hyper_connection.count", 4)),
        hc_sinkhorn_iters=int(
            md.get(f"{a}.hyper_connection.sinkhorn_iterations", 3)),
        hc_eps=float(md.get(f"{a}.hyper_connection.epsilon", 1e-4)),
        o_group_count=int(md.get(f"{a}.attention.output_group_count", 1)),
        o_lora_rank=int(md.get(f"{a}.attention.output_lora_rank", 0) or 0),
        q_lora_rank=int(md.get(f"{a}.attention.q_lora_rank", 0) or 0),
        compress_rope_base=float(
            md.get(f"{a}.attention.compress_rope_freq_base",
                   cfg.rope_freq_base)),
        hash_layer_count=int(md.get(f"{a}.hash_layer_count", 0) or 0),
        indexer_n_head=int(md.get(f"{a}.attention.indexer.head_count", 1)),
        indexer_head_size=int(md.get(f"{a}.attention.indexer.key_length", 64)),
        indexer_top_k=int(md.get(f"{a}.attention.indexer.top_k", 2048)),
    )
    gating = int(md.get(f"{a}.expert_gating_func", 4) or 4)
    return cfg.with_(
        rope_type=ROPE_TYPE_NEOX,
        n_kv_heads=1,  # single shared latent, k == v
        head_dim_v=cfg.head_dim_k,
        expert_gating={1: "softmax", 2: "sigmoid"}.get(gating,
                                                       "sqrtsoftplus"),
        expert_weights_norm=bool(md.get(f"{a}.expert_weights_norm", True)),
        expert_weights_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        n_expert_shared=int(md.get(f"{a}.expert_shared_count", 1) or 1),
        tie_embeddings=True,
    )
