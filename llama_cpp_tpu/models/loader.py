"""Model loader: GGUF file -> (ModelConfig, weight pytree, Tokenizer).

Analog of reference llama_model_loader + llama_model::load_tensors
(src/llama-model-loader.cpp; tensor creation src/models/llama.cpp:35-94).
Weights mmap from the GGUF blob, repack to canonical planes (quant/repack.py)
and land on device via jax.device_put with optional shardings.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile, read_gguf
from ..ops.qtensor import QuantTensor, Weight, load_weight
from ..tokenizer import Tokenizer
from .config import ModelConfig
from .registry import apply_arch

log = logging.getLogger(__name__)

# layer-tensor suffix -> weight-dict key
LAYER_TENSORS = {
    "attn_norm.weight": "attn_norm",
    "attn_norm.bias": "attn_norm_bias",
    "attn_q.weight": "attn_q",
    "attn_k.weight": "attn_k",
    "attn_v.weight": "attn_v",
    "attn_qkv.weight": "attn_qkv",
    "attn_qkv.bias": "attn_qkv_bias",
    "attn_output.weight": "attn_output",
    "attn_q.bias": "attn_q_bias",
    "attn_k.bias": "attn_k_bias",
    "attn_v.bias": "attn_v_bias",
    "attn_output.bias": "attn_output_bias",
    "attn_q_norm.weight": "attn_q_norm",
    "attn_k_norm.weight": "attn_k_norm",
    "attn_post_norm.weight": "attn_post_norm",
    "post_attention_norm.weight": "attn_post_norm",
    "attn_out_norm.weight": "attn_post_norm",  # grok attn output norm
    "attn_sub_norm.weight": "attn_sub_norm",  # bitnet: norm before o_proj
    "ffn_sub_norm.weight": "ffn_sub_norm",  # bitnet: norm before ffn_down
    "ffn_norm_exps.weight": "ffn_norm_exps",  # arctic: MoE-branch norm
    # bitnet per-tensor scalar scales (folded into the weight at load)
    "attn_q.scale": "attn_q.__scale",
    "attn_k.scale": "attn_k.__scale",
    "attn_v.scale": "attn_v.__scale",
    "attn_output.scale": "attn_output.__scale",
    "ffn_gate.scale": "ffn_gate.__scale",
    "ffn_up.scale": "ffn_up.__scale",
    "ffn_down.scale": "ffn_down.__scale",
    "ffn_norm.weight": "ffn_norm",
    "ffn_norm.bias": "ffn_norm_bias",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
    "ffn_gate.bias": "ffn_gate_bias",
    "ffn_up.bias": "ffn_up_bias",
    "ffn_down.bias": "ffn_down_bias",
    "ffn_post_norm.weight": "ffn_post_norm",
    "post_ffw_norm.weight": "ffn_post_norm",
    "attn_sinks.weight": "attn_sinks",
    # Gemma3n altup/laurel/per-layer-embd (llama-arch.cpp:485-497)
    "altup_correct_coef.weight": "altup_correct_coef",
    "altup_correct_scale.weight": "altup_correct_scale",
    "altup_predict_coef.weight": "altup_predict_coef",
    "altup_router.weight": "altup_router",
    "altup_router_norm.weight": "altup_router_norm",
    "laurel_l.weight": "laurel_l",
    "laurel_r.weight": "laurel_r",
    "laurel_post_norm.weight": "laurel_post_norm",
    "inp_gate.weight": "per_layer_inp_gate",
    # Gemma4 (llama-arch.cpp:403-423): dual-branch MoE norms, router input
    # scale vector, fused gate_up experts, per-layer output scalar
    "pre_ffw_norm_2.weight": "ffn_pre_norm_2",
    "post_ffw_norm_1.weight": "ffn_post_norm_1",
    "post_ffw_norm_2.weight": "ffn_post_norm_2",
    "ffn_gate_inp.scale": "ffn_gate_inp_s",
    "ffn_gate_up_exps.weight": "ffn_gate_up_exps",
    # CogVLM vision-expert weight set (llama-arch.cpp:599-603)
    "vis_attn_qkv.weight": "visexp_attn_qkv",
    "vis_attn_output.weight": "visexp_attn_output",
    "vis_gate.weight": "visexp_ffn_gate",
    "vis_down.weight": "visexp_ffn_down",
    "vis_up.weight": "visexp_ffn_up",
    "proj.weight": "per_layer_proj",
    "post_norm.weight": "per_layer_post_norm",
    # DeepSeek-2 MLA (reference src/models/deepseek2.cpp load_arch_tensors)
    "attn_q_a.weight": "attn_q_a",
    "attn_q_a_norm.weight": "attn_q_a_norm",
    "attn_q_b.weight": "attn_q_b",
    "attn_kv_a_mqa.weight": "attn_kv_a_mqa",
    "attn_kv_a_norm.weight": "attn_kv_a_norm",
    "attn_kv_b.weight": "attn_kv_b",
    # glm-dsa pre-split MLA decompression (reassembled at load)
    "attn_k_b.weight": "attn_k_b",
    "attn_v_b.weight": "attn_v_b",
    # DeepSeek-V4 (deepseek4.cpp load_arch_tensors)
    "attn_kv.weight": "attn_kv",
    "attn_output_a.weight": "attn_output_a",
    "attn_output_b.weight": "attn_output_b",
    "hc_attn_fn.weight": "hc_attn_fn",
    "hc_attn_base.weight": "hc_attn_base",
    "hc_attn_scale.weight": "hc_attn_scale",
    "hc_ffn_fn.weight": "hc_ffn_fn",
    "hc_ffn_base.weight": "hc_ffn_base",
    "hc_ffn_scale.weight": "hc_ffn_scale",
    "attn_compressor_kv.weight": "attn_comp_wkv",
    "attn_compressor_gate.weight": "attn_comp_wgate",
    "attn_compressor_ape.weight": "attn_comp_ape",
    "attn_compressor_norm.weight": "attn_comp_norm",
    "indexer_compressor_kv.weight": "indexer_comp_wkv",
    "indexer_compressor_gate.weight": "indexer_comp_wgate",
    "indexer_compressor_ape.weight": "indexer_comp_ape",
    "indexer_compressor_norm.weight": "indexer_comp_norm",
    "ffn_gate_tid2eid.weight": "ffn_gate_tid2eid",
    "exp_probs_b": "exp_probs_b",
    "ffn_gate_inp.weight": "ffn_gate_inp",
    "ffn_gate_inp.bias": "ffn_gate_inp_bias",
    "ffn_gate_exps.weight": "ffn_gate_exps",
    "ffn_up_exps.weight": "ffn_up_exps",
    "ffn_down_exps.weight": "ffn_down_exps",
    "ffn_gate_exps.bias": "ffn_gate_exps_bias",
    "ffn_up_exps.bias": "ffn_up_exps_bias",
    "ffn_down_exps.bias": "ffn_down_exps_bias",
    "ffn_gate_shexp.weight": "ffn_gate_shexp",
    "ffn_gate_inp_shexp.weight": "ffn_gate_inp_shexp",
    "ffn_up_shexp.weight": "ffn_up_shexp",
    "ffn_down_shexp.weight": "ffn_down_shexp",
    "exp_probs_b.bias": "exp_probs_b",
    "layer_output_scale.weight": "layer_out_scale",  # talkie embd-skip scale
    # GroveMoE adjugate chunk experts (reference grovemoe.cpp)
    "ffn_gate_chexps.weight": "ffn_gate_chexps",
    "ffn_up_chexps.weight": "ffn_up_chexps",
    "ffn_down_chexps.weight": "ffn_down_chexps",
    # SSM / Mamba (reference src/llama-arch.cpp LLM_TENSOR_SSM_*)
    "ssm_in.weight": "ssm_in",
    "ssm_conv1d.weight": "ssm_conv1d",
    "ssm_conv1d.bias": "ssm_conv1d_bias",
    "ssm_x.weight": "ssm_x",
    "ssm_dt.weight": "ssm_dt",
    "ssm_dt.bias": "ssm_dt_bias",
    "ssm_a": "ssm_a",
    "ssm_d": "ssm_d",
    "ssm_out.weight": "ssm_out",
    "ssm_dt_norm.weight": "ssm_dt_norm",
    "ssm_b_norm.weight": "ssm_b_norm",
    "ssm_c_norm.weight": "ssm_c_norm",
    "ssm_norm.weight": "ssm_norm",
    # RWKV6 (reference src/llama-arch.cpp:540-563)
    "attn_norm_2.weight": "attn_norm_2",
    "attn_norm_2.bias": "attn_norm_2_bias",
    "time_mix_w1.weight": "time_mix_w1",
    "time_mix_w2.weight": "time_mix_w2",
    "time_mix_lerp_x.weight": "time_mix_lerp_x",
    "time_mix_lerp_w.weight": "time_mix_lerp_w",
    "time_mix_lerp_k.weight": "time_mix_lerp_k",
    "time_mix_lerp_v.weight": "time_mix_lerp_v",
    "time_mix_lerp_r.weight": "time_mix_lerp_r",
    "time_mix_lerp_g.weight": "time_mix_lerp_g",
    "time_mix_lerp_fused.weight": "time_mix_lerp_fused",
    "time_mix_first.weight": "time_mix_first",
    "time_mix_decay.weight": "time_mix_decay",
    "time_mix_decay_w1.weight": "time_mix_decay_w1",
    "time_mix_decay_w2.weight": "time_mix_decay_w2",
    "time_mix_key.weight": "time_mix_key",
    "time_mix_value.weight": "time_mix_value",
    "time_mix_receptance.weight": "time_mix_receptance",
    # rwkv6qwen2 qrwkv biases (rwkv6qwen2.cpp:66-68)
    "time_mix_key.bias": "time_mix_key_bias",
    "time_mix_value.bias": "time_mix_value_bias",
    "time_mix_receptance.bias": "time_mix_receptance_bias",
    "time_mix_gate.weight": "time_mix_gate",
    "time_mix_ln.weight": "time_mix_ln",
    "time_mix_ln.bias": "time_mix_ln_bias",
    "time_mix_output.weight": "time_mix_output",
    "channel_mix_lerp_k.weight": "channel_mix_lerp_k",
    "channel_mix_lerp_r.weight": "channel_mix_lerp_r",
    "channel_mix_key.weight": "channel_mix_key",
    "channel_mix_value.weight": "channel_mix_value",
    "channel_mix_receptance.weight": "channel_mix_receptance",
    # BERT encoder (reference src/llama-arch.cpp:422-431)
    "attn_output_norm.weight": "attn_output_norm",
    "attn_output_norm.bias": "attn_output_norm_bias",
    "layer_output_norm.weight": "layer_output_norm",
    "layer_output_norm.bias": "layer_output_norm_bias",
}

T5_LAYER_TENSORS = {
    "attn_q.weight": "attn_q",
    "attn_k.weight": "attn_k",
    "attn_v.weight": "attn_v",
    "attn_o.weight": "attn_output",
    "attn_rel_b.weight": "attn_rel_b",
    "attn_norm.weight": "attn_norm",
    "cross_attn_q.weight": "cross_attn_q",
    "cross_attn_k.weight": "cross_attn_k",
    "cross_attn_v.weight": "cross_attn_v",
    "cross_attn_o.weight": "cross_attn_output",
    "cross_attn_norm.weight": "cross_attn_norm",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
    "ffn_norm.weight": "ffn_norm",
}

LAYER_TENSORS.update({
    # MSA block-sparse indexer (reference minimax-m3, llama-arch.cpp:608-610)
    "indexer.q_proj.weight": "indexer_q_proj",
    "indexer.k_proj.weight": "indexer_k_proj",
    "indexer.q_norm.weight": "indexer_q_norm",
    "indexer.k_norm.weight": "indexer_k_norm",
    "indexer.k_norm.bias": "indexer_k_norm_bias",
    "indexer.proj.weight": "indexer_proj",
    "indexer.attn_k.weight": "indexer_attn_k",
    "indexer.attn_q_b.weight": "indexer_attn_q_b",
    "attn_q_norm.bias": "attn_q_norm_bias",
    "attn_k_norm.bias": "attn_k_norm_bias",
    "time_mix_w0.weight": "time_mix_w0",
    "time_mix_a0.weight": "time_mix_a0",
    "time_mix_a1.weight": "time_mix_a1",
    "time_mix_a2.weight": "time_mix_a2",
    "time_mix_v0.weight": "time_mix_v0",
    "time_mix_v1.weight": "time_mix_v1",
    "time_mix_v2.weight": "time_mix_v2",
    "time_mix_g1.weight": "time_mix_g1",
    "time_mix_g2.weight": "time_mix_g2",
    "time_mix_k_k.weight": "time_mix_k_k",
    "time_mix_k_a.weight": "time_mix_k_a",
    "time_mix_r_k.weight": "time_mix_r_k",
    "ssm_ba.weight": "ssm_ba",
    # qwen35 deltanet: separate beta/alpha projections (qwen35.cpp:86-87)
    "ssm_beta.weight": "ssm_beta",
    "ssm_alpha.weight": "ssm_alpha",
    # kimi-linear KDA (kimi-linear.cpp load_arch_tensors)
    "ssm_conv1d_q.weight": "ssm_conv1d_q",
    "ssm_conv1d_k.weight": "ssm_conv1d_k",
    "ssm_conv1d_v.weight": "ssm_conv1d_v",
    "ssm_f_a.weight": "ssm_f_a",
    "ssm_f_b.weight": "ssm_f_b",
    "ssm_g_a.weight": "ssm_g_a",
    "ssm_g_b.weight": "ssm_g_b",
    "attn_gate.weight": "attn_gate",
    # llama.cpp GGUF spelling aliases (llama-arch.cpp LLM_TENSOR_NAMES)
    "post_attention_norm.weight": "attn_post_norm",
    "post_ffw_norm.weight": "ffn_post_norm",
    "shortconv.conv.weight": "shortconv_conv",
    "shortconv.in_proj.weight": "shortconv_in",
    "shortconv.out_proj.weight": "shortconv_out",
})

GLOBAL_TENSORS = {
    "token_embd.weight": "token_embd",
    "position_embd.weight": "pos_embd",
    "token_embd_norm.weight": "token_embd_norm",
    "token_embd_norm.bias": "token_embd_norm_bias",
    "output_norm.weight": "output_norm",
    "output_norm.bias": "output_norm_bias",
    "output.weight": "output",
    "output.bias": "output_bias",
    "rope_freqs.weight": "rope_factors",
    # Gemma3n globals (llama-arch.cpp:483-489)
    "per_layer_token_embd.weight": "per_layer_token_embd",
    "per_layer_model_proj.weight": "per_layer_model_proj",
    "per_layer_proj_norm.weight": "per_layer_proj_norm",
    "altup_proj.weight": "altup_proj",
    "altup_unembd_proj.weight": "altup_unembd_proj",
    # gemma4-assistant MTP projections (llama-arch.cpp:503-504)
    "nextn.pre_projection.weight": "nextn_proj_pre",
    "nextn.post_projection.weight": "nextn_proj_post",
    "fc.weight": "fc",  # EAGLE3 feature-fusion encoder (llama-arch.cpp:618)
    # DSpark semi-autoregressive Markov + confidence heads on a DFlash
    # drafter (llama-arch.cpp:620-622, src/models/dflash.cpp:86-96)
    "markov_w1.weight": "markov_w1",
    "markov_w2.weight": "markov_w2",
    "conf_proj.weight": "conf_proj",
    "conf_proj.bias": "conf_proj_bias",
    # DeepSeek-V4 hyper-connection head (llama-arch.cpp:469-471)
    "output_hc_fn.weight": "hc_head_fn",
    "output_hc_base.weight": "hc_head_base",
    "output_hc_scale.weight": "hc_head_scale",
    "enc.output_norm.weight": "enc_output_norm",  # eagle3 norm_before_fc
    "token_types.weight": "token_types",
    "cls.weight": "cls",
    "cls.bias": "cls_bias",
    "cls.output.weight": "cls_out",
    "cls.output.bias": "cls_out_bias",
}

# 1-D tensors stay dense fp32; everything else follows its storage type
_DENSE_KEYS = {"attn_norm", "attn_norm_bias", "attn_q_norm", "attn_k_norm",
               "attn_post_norm", "ffn_norm", "ffn_norm_bias", "ffn_post_norm",
               "output_norm", "output_norm_bias", "rope_factors",
               "attn_q_bias", "attn_k_bias", "attn_v_bias", "attn_output_bias",
               "ffn_gate_bias", "ffn_up_bias", "ffn_down_bias", "exp_probs_b",
               "output_bias", "attn_sinks", "ffn_gate_inp_bias",
               "ffn_gate_exps_bias", "ffn_up_exps_bias", "ffn_down_exps_bias",
               "ssm_conv1d", "ssm_conv1d_bias", "ssm_dt_bias", "ssm_a",
               "ssm_d", "ssm_dt_norm", "ssm_b_norm", "ssm_c_norm", "ssm_norm",
               "attn_qkv_bias", "token_embd_norm", "token_embd_norm_bias",
               "attn_q_a_norm", "attn_kv_a_norm", "attn_norm_2",
               "attn_norm_2_bias", "time_mix_lerp_x", "time_mix_lerp_w",
               "time_mix_lerp_k", "time_mix_lerp_v", "time_mix_lerp_r",
               "time_mix_lerp_g", "time_mix_lerp_fused", "time_mix_first",
               "time_mix_decay", "time_mix_ln", "time_mix_ln_bias",
               "time_mix_w2", "channel_mix_lerp_k", "channel_mix_lerp_r",
               "attn_output_norm", "attn_output_norm_bias",
               "layer_output_norm", "layer_output_norm_bias", "token_types",
               "cls_bias", "cls_out_bias",
               # DSV4 hyper-connections / compressor small tensors
               "hc_attn_scale", "hc_attn_base", "hc_ffn_scale", "hc_ffn_base",
               "hc_head_scale", "hc_head_base", "attn_comp_ape",
               "attn_comp_norm", "indexer_comp_ape", "indexer_comp_norm",
               "ffn_gate_tid2eid",
               "attn_rel_b",
               # gemma3n small altup/laurel tensors (exact f32, no planes)
               "altup_correct_coef", "altup_predict_coef", "altup_router_norm",
               "altup_correct_scale", "laurel_post_norm", "per_layer_post_norm",
               "per_layer_proj_norm", "altup_proj", "altup_unembd_proj",
               "ffn_pre_norm_2", "ffn_post_norm_1", "ffn_post_norm_2",
               "ffn_gate_inp_s", "layer_out_scale"}


class Model:
    def __init__(self, cfg: ModelConfig, params: dict[str, Any], tokenizer: Tokenizer | None, gguf: GGUFFile):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.gguf = gguf

    @property
    def arch(self) -> str:
        return self.cfg.arch

    @property
    def forward_fn(self):
        """Per-family graph builder (build_arch_graph dispatch analog)."""
        if self.cfg.extra.get("encoder"):
            from . import bert

            return bert.forward
        if self.cfg.extra.get("t5"):
            from . import t5

            if self.cfg.extra.get("t5_encoder_only"):
                def enc_only(params, cfg, tokens, inputs, kv, output_rows=None):
                    return t5.t5_encode(params, cfg, tokens), kv
                return enc_only
            return t5.t5_forward
        if self.cfg.extra.get("dsv4"):
            from . import deepseek4

            return deepseek4.forward
        if self.cfg.extra.get("gemma3n"):
            from . import gemma3n

            return gemma3n.forward
        if self.cfg.extra.get("gemma4"):
            from . import gemma3n

            return gemma3n.forward_gemma4
        if self.cfg.extra.get("gemma4_assistant"):
            def _no_standalone(*a, **k):
                raise RuntimeError(
                    "gemma4-assistant is an MTP drafter over a target "
                    "context; use models.gemma3n.Gemma4AssistantSpeculator")
            return _no_standalone
        if self.cfg.extra.get("rwkv"):
            from . import rwkv

            return rwkv.forward
        if self.cfg.extra.get("memory") == "recurrent":
            from . import mamba

            return mamba.forward
        from . import transformer

        return transformer.forward


def load_model(
    path: str,
    prefer_quant: bool = True,
    dense_dtype=jnp.bfloat16,
    progress: Callable[[float], None] | None = None,
    device_put: Callable[[str, Any], Any] | None = None,
    fuse: bool = True,
) -> Model:
    """Load a GGUF model. `device_put(name, host_weight)` lets the parallel
    layer inject shardings per tensor; default is plain device placement.

    The load is transfer-pipelined: every host->device put and extract
    program dispatches asynchronously (no per-tensor sync — the whole load
    runs at host-link bandwidth), and the device repack programs compile on
    a background thread ahead of the stream (scan of the tensor index)."""
    import time as _time

    t0 = _time.perf_counter()
    phase_log = log.info if _load_log_enabled() else (lambda *a: None)
    f = read_gguf(path)
    cfg = ModelConfig.from_gguf(f.metadata)
    cfg = apply_arch(cfg, f.metadata)
    cfg.compute_dtype = dense_dtype
    phase_log("load: gguf index+metadata %.2fs", _time.perf_counter() - t0)

    if device_put is None:
        from ..quant.device_repack import precompile_extractors

        precompile_thread = precompile_extractors(
            f, prefer_quant=prefer_quant, dense_dtype=dense_dtype)
    else:
        precompile_thread = None

    t1 = _time.perf_counter()
    tokenizer = None
    try:
        tokenizer = Tokenizer.from_gguf(f.metadata)
    except (ValueError, KeyError) as e:
        log.warning("no tokenizer loaded: %s", e)
    phase_log("load: tokenizer %.2fs", _time.perf_counter() - t1)
    t1 = _time.perf_counter()

    layers: list[dict[str, Weight]] = [dict() for _ in range(cfg.n_layers)]
    params: dict[str, Any] = {"layers": layers}
    if cfg.extra.get("t5"):
        # enc/dec namespaces (reference llama-arch.cpp LLM_TENSOR_ENC_*/DEC_*)
        params["enc_layers"] = [
            dict() for _ in range(cfg.extra.get("enc_n_layers", cfg.n_layers))]

    n_done = 0
    total = len(f.tensors)
    for name, info in f.tensors.items():
        key = None
        target: dict | None = None
        if name == "d2t":  # EAGLE3 draft->target vocab map (int, kept exact)
            params["d2t"] = jnp.asarray(
                np.asarray(info.data).view(np.int64).astype(np.int32))
            n_done += 1
            continue
        if name in GLOBAL_TENSORS:
            key = GLOBAL_TENSORS[name]
            target = params
        elif name.startswith("blk."):
            parts = name.split(".", 2)
            il = int(parts[1])
            suffix = parts[2]
            key = LAYER_TENSORS.get(suffix)
            if key is not None and il < cfg.n_layers:
                target = layers[il]
        elif name.startswith(("enc.blk.", "dec.blk.")):
            parts = name.split(".", 3)
            il = int(parts[2])
            key = T5_LAYER_TENSORS.get(parts[3])
            if key is not None:
                group = params.get("enc_layers", []) if parts[0] == "enc" else layers
                if il < len(group):
                    target = group[il]
        elif name == "enc.output_norm.weight":
            key, target = "enc_output_norm", params
        elif name == "dec.output_norm.weight":
            key, target = "output_norm", params
        if key is None or target is None:
            log.debug("skipping unmapped tensor %s", name)
            continue
        # arch-specific role remap (e.g. gpt-oss stores the pre-FFN norm as
        # attn_post_norm, reference src/models/openai-moe.cpp graph order)
        key = cfg.extra.get("tensor_remap", {}).get(key, key)
        dense = key in _DENSE_KEYS or len(info.shape) == 1
        # matmul weights store transposed planes (TPU kernel layout);
        # the embedding table stays row-major for gather, and markov_w1 is
        # a GET_ROWS gather table in the reference (dflash.cpp conf head
        # gathers markov_w1[prev]) — keep it row-major too
        transpose = (not dense
                     and key not in ("token_embd", "pos_embd",
                                     "per_layer_token_embd", "markov_w1")
                     and len(info.shape) >= 2)
        w = None
        if device_put is None:
            # TPU-side unpack: ship raw block bytes, bit-twiddle on the VPU
            # (quant/device_repack.py) — the 1-core host only memcpys
            from ..quant.device_repack import device_load_weight
            from ..ops.qtensor import _PACK4

            w = device_load_weight(
                np.asarray(info.data), info.dtype, tuple(info.shape),
                prefer_quant=prefer_quant and not dense,
                dense_dtype=jnp.float32 if dense else dense_dtype,
                transpose=transpose, pack4=_PACK4,
            )
        if w is None:
            w = load_weight(
                np.asarray(info.data),
                info.dtype,
                info.shape,
                prefer_quant=prefer_quant and not dense,
                dense_dtype=jnp.float32 if dense else dense_dtype,
                transpose=transpose,
            )
        if device_put is not None:
            w = device_put(name, w)
        target[key] = w
        n_done += 1
        if progress:
            progress(n_done / total)

    phase_log("load: tensor stream (%d tensors, async) %.2fs",
              n_done, _time.perf_counter() - t1)
    t1 = _time.perf_counter()
    # no join on the precompile thread: any extractor it hasn't finished was
    # already dispatched lazily by the stream (jit's per-entry lock
    # serializes the straggler), and the fuse/pad phase below overlaps it
    del precompile_thread

    # nanbeige looped layers: only the physical stack carries tensors; the
    # trailing logical slots are filled by replication below
    n_loops = int(cfg.extra.get("n_loops", 1))
    if n_loops > 1:
        layers = layers[: cfg.n_layers // n_loops]

    # fuse per-head norm weights shape: gguf stores [head_dim]
    if cfg.extra.get("t5_encoder_only"):
        req = ()
        layers = params["enc_layers"]
    elif cfg.extra.get("pre_norm_encoder"):
        req = ("ffn_norm", "ffn_up")
    elif cfg.extra.get("encoder"):
        req = ("attn_output_norm", "ffn_up")
    elif cfg.extra.get("rwkv_hybrid"):
        req = ("attn_norm", "time_mix_key", "ffn_up")  # qwen2-FFN hybrids
    elif cfg.extra.get("rwkv"):
        req = ("attn_norm", "time_mix_key", "channel_mix_key")
    elif cfg.extra.get("memory") == "recurrent":
        req = ("attn_norm", "ssm_in", "ssm_out")
    elif cfg.extra.get("memory") == "hybrid":
        req = ("attn_norm",)  # per-layer mixer checked below
    elif cfg.extra.get("weightless_norm"):
        req = ("attn_output",)  # olmo: non-parametric norms carry no tensors
    elif cfg.shared_parallel_norm:
        req = ("attn_norm", "attn_output")  # phi2: one norm feeds both branches
    elif cfg.norm_after:
        req = ("attn_output", "attn_post_norm", "ffn_post_norm")
    elif cfg.extra.get("dsv4"):
        req = ("attn_norm", "attn_kv", "hc_attn_fn")
    elif cfg.extra.get("n_head_arr") is not None:
        req = ()  # deci/openelm: per-layer head arrays allow partial blocks
    else:
        req = ("attn_norm", "attn_output", "ffn_norm")
    _SUBS = {"ffn_up": ("ffn_gateup", "ffn_up_exps")}  # acceptable stand-ins
    missing = [
        f"layer {i} missing {k}"
        for i, lw in enumerate(layers)
        for k in req
        if k not in lw and not any(a in lw for a in _SUBS.get(k, ()))
    ]
    if cfg.extra.get("memory") == "hybrid":
        missing += [
            f"layer {i} has neither attention nor ssm/conv mixer"
            for i, lw in enumerate(layers)
            if "ssm_in" not in lw and "attn_output" not in lw
            and "shortconv_in" not in lw and "ffn_up" not in lw
            and "ssm_beta" not in lw  # qwen35 optimized deltanet layout
            and "ffn_gate_exps" not in lw  # nemotron-h-moe MoE F-block
        ]
    if missing:
        raise ValueError(f"model load incomplete: {missing[:4]}")
    for lw in layers:
        _fold_scalar_scales(lw)
    if cfg.extra.get("kv_lora_rank"):
        for lw in layers:
            _fuse_presplit_mla_kv(lw, cfg)
    if (fuse and not cfg.extra.get("q_gate_interleaved")
            and not cfg.extra.get("no_qkv_fuse")):
        # (qwen35's wq embeds a per-head gate at double width — the fused
        # split would mis-partition it, so those archs stay unfused;
        # shared-KV layers must keep a standalone wq for the q-only path)
        _reuse = cfg.extra.get("kv_reuse")
        for _il, lw in enumerate(layers):
            _fuse_projections(
                lw, fuse_qkv=_reuse is None or int(_reuse[_il]) < 0)
    if cfg.extra.get("mla_absorb"):
        for lw in layers:
            _split_mla_kv_b(lw, cfg)
    for lw in layers:
        if "ffn_gate_up_exps" in lw:
            g, u = _split_gateup_exps(lw.pop("ffn_gate_up_exps"))
            lw["ffn_gate_exps"], lw["ffn_up_exps"] = g, u
    if "rope_factors" in params:
        # gemma4 proportional-rope divisors (consumed by _rope_params)
        cfg.extra["rope_factors_arr"] = np.asarray(params["rope_factors"],
                                                   dtype=np.float32)
    if n_loops > 1:
        # nanbeige (reference nanbeige.cpp:66-70 "share physical weights
        # across loops"): logical layer il aliases physical il % n_phys —
        # same dict objects, no weight copies; each logical layer still owns
        # its KV lines since caches allocate cfg.n_layers (logical) entries
        params["layers"] = list(layers) * n_loops
    # vocab-head O padding: 128256-style widths have no wide mult-of-128
    # divisors, which starves the GEMV tiles (scripts/bench_qmm.py); pad to
    # a 4096 multiple once at load, matmul slices via out_dim
    from ..ops.qtensor import pad_out_features

    for hk in ("output", "cls_out"):
        hw = params.get(hk)
        if (isinstance(hw, QuantTensor) and hw.transposed
                and hw.q.ndim == 2 and hw.q.shape[1] % 1024
                and hw.q.shape[1] >= 16384):
            params[hk] = pad_out_features(hw)
    phase_log("load: fuse/fold/pad %.2fs (total %.2fs; device work may "
              "still be in flight)", _time.perf_counter() - t1,
              _time.perf_counter() - t0)
    return Model(cfg, params, tokenizer, f)


def _load_log_enabled() -> bool:
    import os

    return bool(os.environ.get("LLAMA_LOAD_LOG"))


def _split_gateup_exps(w):
    """Fused [gate | up] expert tensor -> separate gate/up weights (first
    n_ff output rows are the gate — reference llama-graph.cpp:2090-2108)."""
    from ..ops.qtensor import QuantTensor

    if isinstance(w, QuantTensor):
        F = w.q.shape[-1] // 2

        def mk(sl):
            return QuantTensor(
                q=w.q[..., sl], scales=w.scales[..., sl],
                mins=None if w.mins is None else w.mins[..., sl],
                group=w.group, ggml_type=w.ggml_type,
                transposed=w.transposed, packed=w.packed,
                d=None if w.d is None else w.d[..., sl],
                dmin=None if w.dmin is None else w.dmin[..., sl],
                sgroup=w.sgroup)

        return mk(slice(None, F)), mk(slice(F, None))
    F = w.shape[-2] // 2
    return w[..., :F, :], w[..., F:, :]


def _fuse_presplit_mla_kv(lw: dict, cfg) -> None:
    """glm-dsa ships the MLA decompression already split as attn_k_b
    {nope, kv_lora, H} and attn_v_b {kv_lora, Dv, H} (glm-dsa.cpp:120-121)
    instead of the fused attn_kv_b. Reassemble the fused layout so every
    downstream MLA path (naive expansion AND absorbed split) is shared:
    fused rows for head h = [k_b[h]^T (nope x C) | v_b[h] (Dv x C)]."""
    if "attn_k_b" not in lw or "attn_kv_b" in lw:
        return
    kb = lw.pop("attn_k_b")
    vb = lw.pop("attn_v_b")
    kbd = kb.dequant(jnp.float32) if hasattr(kb, "dequant") else kb
    vbd = vb.dequant(jnp.float32) if hasattr(vb, "dequant") else vb
    kbd = jnp.asarray(kbd, jnp.float32)  # [H, C, nope]
    vbd = jnp.asarray(vbd, jnp.float32)  # [H, Dv, C]
    H = kbd.shape[0]
    C = kbd.shape[1]
    fused = jnp.concatenate(
        [jnp.swapaxes(kbd, 1, 2), vbd], axis=1)  # [H, nope+Dv, C]
    dt = getattr(cfg, "compute_dtype", None) or jnp.bfloat16
    lw["attn_kv_b"] = fused.reshape(-1, C).astype(dt)


def _split_mla_kv_b(lw: dict, cfg) -> None:
    """Split the fused MLA decompression weight into absorbed operands
    (reference llama-model.cpp wk_b/wv_b split for the MLA path): attn_kv_b
    [H*(nope+Dv), kv_lora] -> mla_k_b [C, H, nope] (absorbs W_UK into the
    q@c_kv contraction) and mla_v_b [C, H, Dv] (applied to the latent
    attention output)."""
    from ..ops.qtensor import QuantTensor

    w = lw.pop("attn_kv_b", None)
    if w is None:
        return
    nope = cfg.head_dim_k - cfg.rope_dims
    dv = cfg.head_dim_v
    h = cfg.n_heads
    if isinstance(w, QuantTensor):
        dq = w.dequant(jnp.bfloat16)  # transposed -> [C, H*(nope+Dv)]
        if not w.transposed:
            dq = dq.T
    else:
        dq = w.T  # dense stored [out, in]; keep its dtype (f32 oracles)
    dq = dq.reshape(dq.shape[0], h, nope + dv)
    lw["mla_k_b"] = dq[:, :, :nope]
    lw["mla_v_b"] = dq[:, :, nope:]


def _fold_scalar_scales(lw: dict) -> None:
    """Fold bitnet-style per-tensor scalar scales (`<w>.scale`, reference
    src/models/bitnet.cpp wq_s/wo_s/...) into the weight: lossless for
    quantized planes (scale planes multiply) and dense weights alike."""
    from dataclasses import replace as _rp

    from ..ops.qtensor import QuantTensor

    for key in [k for k in list(lw) if k.endswith(".__scale")]:
        base = key[: -len(".__scale")]
        s = float(np.asarray(lw.pop(key)).reshape(-1)[0])
        w = lw.get(base)
        if w is None or s == 1.0:
            continue
        if isinstance(w, QuantTensor):
            if w.d is not None:
                lw[base] = _rp(w, d=w.d * s,
                               dmin=None if w.dmin is None else w.dmin * s)
            else:
                lw[base] = _rp(w, scales=w.scales * s,
                               mins=None if w.mins is None else w.mins * s)
        else:
            lw[base] = w * s


def _concat_weights(ws: list) -> Any | None:
    """Concatenate same-type projection weights along the output axis."""
    from ..ops.qtensor import QuantTensor

    if all(isinstance(w, QuantTensor) for w in ws):
        if len({(w.group, w.ggml_type, w.transposed, w.packed, w.hier,
                 w.sgroup) for w in ws}) != 1:
            return None
        if not ws[0].transposed or any(w.q.ndim != 2 for w in ws):
            return None
        if len({w.q.shape[0] for w in ws}) != 1:
            return None
        have_mins = [w.mins is not None for w in ws]
        if any(have_mins) and not all(have_mins):
            return None
        return QuantTensor(
            q=jnp.concatenate([w.q for w in ws], axis=-1),
            scales=jnp.concatenate([w.scales for w in ws], axis=-1),
            mins=jnp.concatenate([w.mins for w in ws], axis=-1)
            if all(have_mins) else None,
            group=ws[0].group, ggml_type=ws[0].ggml_type, transposed=True,
            packed=ws[0].packed,
            d=jnp.concatenate([w.d for w in ws], axis=-1)
            if ws[0].hier else None,
            dmin=jnp.concatenate([w.dmin for w in ws], axis=-1)
            if ws[0].hier and ws[0].dmin is not None else None,
            sgroup=ws[0].sgroup,
        )
    if all(isinstance(w, jnp.ndarray) for w in ws):
        if len({w.dtype for w in ws}) != 1 or any(w.ndim != 2 for w in ws):
            return None
        if len({w.shape[1] for w in ws}) != 1:
            return None
        return jnp.concatenate(ws, axis=0)  # dense [out, in]
    return None


def _fuse_projections(lw: dict, fuse_qkv: bool = True) -> None:
    """Fuse Q/K/V and gate/up projections into single matmuls.

    The decode step is HBM-latency bound on kernel count: each back-to-back
    quantized GEMM stalls on its first weight-tile DMA (the analog of the
    reference fusing wqkv when present). Fusing drops 7 matmuls/layer to 4."""
    if (fuse_qkv and all(k in lw for k in ("attn_q", "attn_k", "attn_v"))
            and "attn_qkv" not in lw):
        fused = _concat_weights([lw["attn_q"], lw["attn_k"], lw["attn_v"]])
        bias_parts = [f"{k}_bias" in lw for k in ("attn_q", "attn_k", "attn_v")]
        if fused is not None and (all(bias_parts) or not any(bias_parts)):
            lw["attn_qkv"] = fused
            if all(bias_parts):
                lw["attn_qkv_bias"] = jnp.concatenate(
                    [lw.pop("attn_q_bias"), lw.pop("attn_k_bias"),
                     lw.pop("attn_v_bias")])
            for k in ("attn_q", "attn_k", "attn_v"):
                del lw[k]
        elif fused is None:
            # mixed-type v (Q4_K_M stores attn_v as Q6_K, reference
            # llama_tensor_get_type src/llama-quant.cpp:424): fuse q+k
            # (same type) and keep v standalone — still drops one GEMV
            # dispatch per layer from the decode chain
            qk_bias = [f"{k}_bias" in lw for k in ("attn_q", "attn_k")]
            fused = _concat_weights([lw["attn_q"], lw["attn_k"]])
            if fused is not None and (all(qk_bias) or not any(qk_bias)):
                lw["attn_qk"] = fused
                if all(qk_bias):
                    lw["attn_qk_bias"] = jnp.concatenate(
                        [lw.pop("attn_q_bias"), lw.pop("attn_k_bias")])
                del lw["attn_q"], lw["attn_k"]
    if all(k in lw for k in ("ffn_gate", "ffn_up")) and "ffn_gateup" not in lw:
        if "ffn_gate_bias" not in lw and "ffn_up_bias" not in lw:
            fused = _concat_weights([lw["ffn_gate"], lw["ffn_up"]])
            if fused is not None:
                lw["ffn_gateup"] = fused
                del lw["ffn_gate"], lw["ffn_up"]
