"""Generic pre-norm decoder transformer forward pass (pure function of a
weight pytree), covering the llama/mistral/qwen/gemma/mixtral families via
ModelConfig flags.

Analog of reference llm_graph_context building blocks (src/llama-graph.h:
build_attn 1143, build_ffn/build_moe_ffn 1048-1086) and the llama graph
(src/models/llama.cpp:99-247) — re-expressed as a traced JAX program; XLA
does the fusion/scheduling that ggml's sched performs at runtime.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import ACTIVATIONS, layer_norm, rms_norm, softcap
from ..ops.pallas.flash_attn import flash_supported, mha_flash
from ..ops.qtensor import QuantTensor, Weight, embed_lookup, matmul
from ..ops.rope import ROPE_TYPE_NONE, RopeParams, apply_rope
from ..runtime.kv_cache import KVCache
from .config import ModelConfig

# Weight pytree layout (names follow the GGUF canonical tensor names,
# reference src/llama-arch.cpp LLM_TENSOR_* table):
# {
#   "token_embd": W, "output_norm": w, "output": W (optional; tied if absent),
#   "rope_factors": optional per-model rope factor vector,
#   "layers": [ {
#       "attn_norm": w, "attn_q": W, "attn_k": W, "attn_v": W, "attn_output": W,
#       "attn_q_bias"/"attn_k_bias"/"attn_v_bias": optional,
#       "attn_q_norm"/"attn_k_norm": optional per-head norms,
#       "attn_post_norm": optional, "ffn_norm": w,
#       "ffn_gate": W, "ffn_up": W, "ffn_down": W,   (dense FFN)
#       "ffn_gate_inp": W, "ffn_gate_exps": W3, "ffn_up_exps": W3,
#       "ffn_down_exps": W3,                          (MoE)
#       "ffn_post_norm": optional,
#   } ... ]
# }


# optional activation tap for imatrix collection (tools/imatrix.py). Only
# consulted on eager (un-jitted) forwards; None in production paths.
_ACT_TAP = None

# trace-time carry: glm-dsa lite indexer layers reuse the previous full
# layer's top-k selection (glm-dsa.cpp prev_top_k); reset per forward
_DSA_CARRY: dict = {"sel": None}


def set_activation_tap(fn):
    global _ACT_TAP
    _ACT_TAP = fn


def _tap(layer: int, key: str, x):
    if _ACT_TAP is not None:
        _ACT_TAP(layer, key, x)


def norm(cfg: ModelConfig, x: jnp.ndarray, w: dict[str, Weight], key: str) -> jnp.ndarray:
    """RMSNorm or LayerNorm per cfg.use_rms_norm (build_norm analog)."""
    if cfg.use_rms_norm:
        return rms_norm(x, w.get(key), cfg.rms_eps)
    return layer_norm(x, w.get(key), w.get(key + "_bias"), cfg.norm_eps)


def alibi_slopes(n_heads: int, max_bias: float) -> jnp.ndarray:
    """ggml soft_max_ext ALiBi slope schedule (ggml-cpu/ops.cpp softmax)."""
    n2 = 1 << (n_heads.bit_length() - 1)  # largest pow2 <= n_heads
    m0 = 2.0 ** (-max_bias / n2)
    m1 = 2.0 ** (-(max_bias / 2.0) / n2)
    return jnp.asarray(
        [m0 ** (h + 1) if h < n2 else m1 ** (2 * (h - n2) + 1)
         for h in range(n_heads)],
        jnp.float32,
    )


class AttnInputs(NamedTuple):
    """Per-step attention metadata (static shapes; mask derived from pos).

    Batched layout [B, T]: each batch row maps to one KV-cache sequence row
    (the split_equal ubatch shape of the reference, src/llama-batch.h:108).
    Padding tokens carry position -1 and route to the cache's trash slot.
    """

    seq_idx: jnp.ndarray  # [B] int32 cache row per batch row
    slots: jnp.ndarray  # [B, T] int32 cache slot per token
    positions: jnp.ndarray  # [B, T] int32 rope/causal position (-1 = pad)
    mrope_positions: jnp.ndarray | None = None  # [3, B, T] t/h/w streams


def _rope_params(cfg: ModelConfig, il: int) -> RopeParams:
    # gemma3-style: SWA layers use a different (local) freq base
    base = cfg.rope_freq_base
    scale = cfg.rope_freq_scale
    dims = cfg.rope_dims
    ext = cfg.rope_ext_factor
    # gemma4 proportional rope: the global rope_freqs tensor divides the
    # frequencies on FULL-attention layers only (gemma4.cpp:192-196)
    factors = cfg.extra.get("rope_factors_arr")
    if cfg.is_swa_layer(il):
        if cfg.extra.get("rope_factors_full_only"):
            factors = None
        if cfg.extra.get("rope_freq_base_swa"):
            base = cfg.extra["rope_freq_base_swa"]
            scale = cfg.extra.get("rope_freq_scale_swa", 1.0)
        if cfg.extra.get("rope_dims_swa"):
            # laguna per-layer-type rope (laguna.cpp:165-170): SWA layers run
            # PLAIN rope over their own dim count — YaRN zeroed
            dims = cfg.extra["rope_dims_swa"]
            ext = 0.0
    return RopeParams(
        freq_factors=factors,
        rope_type=cfg.rope_type,
        n_dims=dims,
        freq_base=base,
        freq_scale=scale,
        ext_factor=ext,
        attn_factor=cfg.rope_attn_factor,
        beta_fast=cfg.rope_beta_fast,
        beta_slow=cfg.rope_beta_slow,
        orig_ctx=cfg.rope_orig_ctx,
    )


def attention_block(
    cfg: ModelConfig,
    lw: dict[str, Weight],
    x: jnp.ndarray,  # [B, T, n_embd]
    inputs: AttnInputs,
    kv: KVCache,
    il: int,
    update_pos: bool | None = None,
) -> tuple[jnp.ndarray, KVCache]:
    B, T = x.shape[:2]
    H, Hkv = cfg.n_heads, cfg.n_kv_heads
    Dk, Dv = cfg.head_dim_k, cfg.head_dim_v
    # per-layer head-count arrays (deci/openelm/nanbeige — reference
    # hparams.n_head(il)/n_head_kv(il)); the KV cache is allocated with the
    # MAX kv-head count, this layer pads writes / slices reads to its own
    ha = cfg.extra.get("n_head_arr")
    hka = cfg.extra.get("n_head_kv_arr")
    if ha is not None:
        H = int(ha[il])
    if hka is not None:
        Hkv = int(hka[il])
    if cfg.extra.get("head_dim_k_swa") and cfg.is_swa_layer(il):
        # gemma4: SWA layers run narrower heads (ATTENTION_KEY_LENGTH_SWA);
        # the iSWA sub-caches are allocated per-class (kv_cache.py)
        Dk = int(cfg.extra["head_dim_k_swa"])
        Dv = int(cfg.extra.get("head_dim_v_swa", Dk))
    cache_heads = cfg.n_kv_heads  # allocation width of every KV memory class

    # MSA block-sparse attention (reference minimax-m3 / llama_kv_cache_msa):
    # the memory wraps a main KV cache and an indexer-key cache
    mem = None
    msa = cfg.extra.get("msa") and "indexer_q_proj" in lw and hasattr(kv, "idx")
    if hasattr(kv, "idx"):
        mem = kv
        kv = mem.kv

    # cross-layer KV sharing (gemma3n/gemma4 — reference llama-model.cpp
    # reuse callback: layers >= n_layer_kv_from_start attend over the cache
    # written by the last owned layer of the same SWA class and compute no
    # K/V of their own)
    _reuse = cfg.extra.get("kv_reuse")
    src_il = il
    if _reuse is not None and int(_reuse[il]) >= 0:
        src_il = int(_reuse[il])
    shared_kv = src_il != il

    k = v = None
    if shared_kv:
        _tap(il, "attn_q", x)
        q = matmul(x, lw["attn_q"])
        if "attn_q_bias" in lw:
            q = q + lw["attn_q_bias"]
    elif "attn_qkv" in lw:  # fused projection (gpt2/gptneox/phi families)
        _tap(il, "attn_qkv", x)
        qkv = matmul(x, lw["attn_qkv"])
        if "attn_qkv_bias" in lw:
            qkv = qkv + lw["attn_qkv_bias"]
        q = qkv[..., : H * Dk]
        k = qkv[..., H * Dk : H * Dk + Hkv * Dk]
        v = qkv[..., H * Dk + Hkv * Dk :]
    elif "attn_qk" in lw:  # q+k fused, v standalone (mixed-type v, e.g.
        # Q4_K_M's Q6_K attn_v — loader._fuse_projections partial fuse)
        _tap(il, "attn_q", x)
        _tap(il, "attn_k", x)
        _tap(il, "attn_v", x)
        qk = matmul(x, lw["attn_qk"])
        if "attn_qk_bias" in lw:
            qk = qk + lw["attn_qk_bias"]
        q = qk[..., : H * Dk]
        k = qk[..., H * Dk:]
        v = matmul(x, lw["attn_v"])
        if "attn_v_bias" in lw:
            v = v + lw["attn_v_bias"]
    else:
        _tap(il, "attn_q", x)
        _tap(il, "attn_k", x)
        _tap(il, "attn_v", x)
        q = matmul(x, lw["attn_q"])
        k = matmul(x, lw["attn_k"])
        # gemma4 "alternative attention": no v_proj -> V reuses the raw K
        # projection (gemma4.cpp:220-222); each still gets its own norm
        v = matmul(x, lw["attn_v"]) if "attn_v" in lw else k
        if "attn_q_bias" in lw:
            q = q + lw["attn_q_bias"]
        if "attn_k_bias" in lw:
            k = k + lw["attn_k_bias"]
        if "attn_v_bias" in lw:
            v = v + lw["attn_v_bias"]

    gate_q = None
    if (cfg.extra.get("q_gate_interleaved")
            and q.shape[-1] == 2 * H * Dk):
        # qwen35 gated attention (qwen35.cpp:270-298): wq emits per-head
        # [q | gate] pairs; the sigmoid gate scales the attention output
        qg = q.reshape(B, T, H, 2 * Dk)
        q = qg[..., :Dk].reshape(B, T, H * Dk)
        gate_q = qg[..., Dk:].reshape(B, T, H * Dk)

    clamp = cfg.extra.get("clamp_kqv", 0.0)
    if clamp:  # olmo/dbrx f_clamp_kqv on the projected q/k/v
        q = jnp.clip(q, -clamp, clamp)
        if k is not None:
            k = jnp.clip(k, -clamp, clamp)
            v = jnp.clip(v, -clamp, clamp)

    if cfg.qk_norm and cfg.extra.get("qk_norm_full"):
        # olmo2-style: rmsnorm over the full projected width
        q = rms_norm(q, lw.get("attn_q_norm"), cfg.rms_eps)
        if k is not None:
            k = rms_norm(k, lw.get("attn_k_norm"), cfg.rms_eps)

    q = q.reshape(B, T, H, Dk)
    if k is not None:
        k = k.reshape(B, T, Hkv, Dk)
        v = v.reshape(B, T, Hkv, Dv)
        if cfg.extra.get("v_rms_norm"):
            # gemma3n/gemma4: weightless per-head rms-norm on V
            # (modeling_gemma3n.py v_norm with_scale=False)
            v = rms_norm(v, None, cfg.rms_eps)

    after_rope = cfg.extra.get("qk_norm_after_rope", False)
    if cfg.qk_norm and cfg.extra.get("qk_layernorm"):
        # chameleon: per-head LayerNorm with bias (reference chameleon.cpp
        # LLM_NORM on q/k)
        q = layer_norm(q, lw.get("attn_q_norm"), lw.get("attn_q_norm_bias"),
                       cfg.norm_eps)
        if k is not None:
            k = layer_norm(k, lw.get("attn_k_norm"),
                           lw.get("attn_k_norm_bias"), cfg.norm_eps)
    elif cfg.qk_norm and not cfg.extra.get("qk_norm_full") and not after_rope:
        q = rms_norm(q, lw.get("attn_q_norm"), cfg.rms_eps)
        if k is not None:
            k = rms_norm(k, lw.get("attn_k_norm"), cfg.rms_eps)

    roped = (cfg.rope_type != ROPE_TYPE_NONE
             and il not in cfg.extra.get("no_rope_layers", ()))
    if roped:
        rp = _rope_params(cfg, il)
        sections = cfg.extra.get("mrope_sections")
        if sections:
            # qwen2-vl M-RoPE: t/h/w position streams per frequency section
            # (reference ggml_rope_multi); text-only rows broadcast the
            # scalar position to all streams
            from ..ops.rope import apply_mrope

            pos3 = inputs.mrope_positions
            if pos3 is None:
                pos3 = jnp.broadcast_to(inputs.positions[None],
                                        (3,) + inputs.positions.shape)
            inter = bool(cfg.extra.get("imrope"))  # qwen3vl interleaved
            q = apply_mrope(q, pos3, sections, rp, interleaved=inter)
            k = apply_mrope(k, pos3, sections, rp, interleaved=inter)
        else:
            q = apply_rope(q, inputs.positions, rp)
            if k is not None:
                k = apply_rope(k, inputs.positions, rp)
    if cfg.qk_norm and after_rope and roped:
        # llama4 l2-norm (weightless rms) applied post-rope on rope layers
        q = rms_norm(q, lw.get("attn_q_norm"), cfg.rms_eps)
        if k is not None:
            k = rms_norm(k, lw.get("attn_k_norm"), cfg.rms_eps)

    # position-addressed write (SET_ROWS analog): flatten [B,T] token grid;
    # the cache derives slots (iSWA ring layers wrap positions)
    seq_flat = jnp.repeat(inputs.seq_idx, T)
    if not shared_kv:
        k_wr = k.reshape(B * T, Hkv, Dk)
        v_wr = v.reshape(B * T, Hkv, Dv)
        if Hkv != cache_heads:  # pad this layer's rows to the cache width
            k_wr = jnp.pad(k_wr, ((0, 0), (0, cache_heads - Hkv), (0, 0)))
            v_wr = jnp.pad(v_wr, ((0, 0), (0, cache_heads - Hkv), (0, 0)))
        kv = kv.write_layer(
            il,
            seq_flat,
            inputs.positions.reshape(-1),
            k_wr,
            v_wr,
            update_pos=update_pos,
            contiguous=B == 1 and T > 1,
        )
    kvc, li = kv.layer_view(src_il)

    group_sel = None  # [B, Hkv, T, S] MSA per-group sparse mask
    if msa:
        from dataclasses import replace as _msa_rep

        # index branch (minimax-m3.cpp:100-120): per-GQA-group indexer head,
        # gemma-style (+1 baked) rmsnorm, partial rope, block-max pooling,
        # forced local blocks, per-(token, group) top-k block selection
        Di = cfg.extra["indexer_head_size"]
        blk = cfg.extra["indexer_block_size"]
        topk = cfg.extra["indexer_top_k"]
        local = cfg.extra.get("indexer_local_blocks", 1)
        rp_i = _rope_params(cfg, il)
        iq = matmul(x, lw["indexer_q_proj"]).reshape(B, T, Hkv, Di)
        ik = matmul(x, lw["indexer_k_proj"]).reshape(B, T, 1, Di)
        iq = rms_norm(iq, lw.get("indexer_q_norm"), cfg.rms_eps)
        ik = rms_norm(ik, lw.get("indexer_k_norm"), cfg.rms_eps)
        iq = apply_rope(iq, inputs.positions, rp_i)
        ik = apply_rope(ik, inputs.positions, rp_i)
        idxc = mem.idx.write_layer(
            il, seq_flat, inputs.positions.reshape(-1),
            ik.reshape(B * T, 1, Di),
            jnp.zeros((B * T, 1, mem.idx.v.shape[-1]), ik.dtype),
            update_pos=update_pos, contiguous=B == 1 and T > 1)
        mem = _msa_rep(mem, idx=idxc)
        ik_all = idxc.k[il][inputs.seq_idx][:, 0]  # [B, S, Di]
        ipos = idxc.pos[inputs.seq_idx]  # [B, S] (slot == position layout)
        sc = jnp.einsum("bthd,bsd->bhts", iq.astype(jnp.float32),
                        ik_all.astype(jnp.float32))
        ivalid = (ipos >= 0)[:, None, None, :]
        icausal = (ipos[:, None, None, :]
                   <= inputs.positions[:, None, :, None])
        sc = jnp.where(ivalid & icausal, sc, -jnp.inf)
        S_ = sc.shape[-1]
        nblk = S_ // blk
        bs = sc.reshape(B, Hkv, T, nblk, blk).max(axis=-1)  # [B,Hkv,T,nblk]
        # local-force bias: the `local` blocks ending at the query's block
        qblk = inputs.positions // blk  # [B, T]
        bi = jnp.arange(nblk, dtype=jnp.int32)
        is_local = ((bi[None, None] <= qblk[:, :, None])
                    & (bi[None, None] > qblk[:, :, None] - local))
        bs = bs + jnp.where(is_local[:, None], 1e30, 0.0)
        k_eff = min(topk, nblk)
        _, top_idx = jax.lax.top_k(bs, k_eff)  # [B, Hkv, T, k]
        sel_blocks = jnp.any(
            jax.nn.one_hot(top_idx, nblk, dtype=bool), axis=-2)
        group_sel = jnp.repeat(sel_blocks, blk, axis=-1)  # [B, Hkv, T, S]

    scale = cfg.attn_scale or (1.0 / float(Dk) ** 0.5)
    window = cfg.sliding_window if (cfg.sliding_window > 0 and cfg.is_swa_layer(il)) else 0
    sinks = lw.get("attn_sinks")  # [H] gpt-oss attention sinks

    paged = hasattr(kvc, "table")

    # single-sequence contexts: batch row 0 IS cache row 0 — skip the seq
    # gather (it copies the whole layer cache per step)
    one_seq = not paged and kvc.k.shape[1] == 1 and B == 1

    def seq_view(arr):  # arr [n_seqs, ...] -> [B, ...]
        return arr if one_seq else arr[inputs.seq_idx]

    # sub-128 head dims underutilize the MXU lanes in the kernel; there the
    # XLA einsum path wins for tiny decode row counts (T*G < 16)
    rows = T * (H // Hkv)
    non_causal = cfg.extra.get("non_causal", False)
    use_flash = (flash_supported(Dk, Dv, kvc.n_slots)
                 and cfg.alibi_bias == 0.0 and not non_causal
                 and group_sel is None
                 # kernels infer GQA grouping from cache width: layers whose
                 # kv-head count differs from the allocation take einsum
                 and Hkv == cache_heads)
    if use_flash and min(Dk, Dv) < 128 and rows < 16:
        use_flash = False
    if use_flash and paged:
        # paged pool: the kernel walks the page table in place — no
        # per-sequence KV gather even at B > 1 (runtime/paged_kv.py)
        from ..ops.pallas.flash_attn import mha_flash_paged

        out = mha_flash_paged(
            q, kvc, li, inputs.seq_idx, inputs.positions,
            sm_scale=scale, window=window, softcap=cfg.attn_logit_softcap,
            sinks=None if sinks is None else sinks.astype(jnp.float32),
            interpret=jax.default_backend() != "tpu",
        ).astype(x.dtype)
    elif use_flash:
        slot_pos = seq_view(kvc.pos)  # [B, slots]
        # fused Pallas flash attention straight off the (possibly int8) cache
        k_raw = seq_view(kvc.k[li])  # [B, Hkv, S, Dk]
        v_raw = seq_view(kvc.v[li])
        ks = seq_view(kvc.k_scale[li]) if kvc.quantized else None
        vs = seq_view(kvc.v_scale[li]) if kvc.quantized else None
        out = mha_flash(
            q, k_raw, v_raw, inputs.positions, slot_pos,
            sm_scale=scale, window=window, softcap=cfg.attn_logit_softcap,
            sinks=None if sinks is None else sinks.astype(jnp.float32),
            k_scale=ks, v_scale=vs,
            interpret=jax.default_backend() != "tpu",
            ring=kvc.ring,
        ).astype(x.dtype)
    else:
        if paged:
            k_seq, v_seq, slot_pos = kvc.gather_seq(li, inputs.seq_idx)
        else:
            slot_pos = seq_view(kvc.pos)  # [B, slots]
            k_all, v_all = kvc.read(li)  # [n_seqs, Hkv, slots, D]
            k_seq = seq_view(k_all)  # [B, Hkv, S, Dk]
            v_seq = seq_view(v_all)
        if Hkv != cache_heads:  # drop this layer's pad heads
            k_seq = k_seq[:, :Hkv]
            v_seq = v_seq[:, :Hkv]

        valid = slot_pos >= 0
        causal = slot_pos[:, None, :] <= inputs.positions[:, :, None]  # [B, T, S]
        if non_causal:  # diffusion LMs (dream/llada): full bidirectional
            causal = jnp.ones_like(causal)
        mask = valid[:, None, :] & causal
        if window > 0:
            if non_causal:
                # symmetric local window (reference SWA_TYPE_SYMMETRIC:
                # |p1 - p0| > n_swa/2 masked; gemma-embedding)
                diff = jnp.abs(slot_pos[:, None, :]
                               - inputs.positions[:, :, None])
                mask = mask & (diff <= window // 2)
            else:
                mask = mask & (
                    slot_pos[:, None, :] > inputs.positions[:, :, None] - window
                )

        groups = H // Hkv
        # matmul inputs follow the activation dtype (bf16 serving path keeps
        # the MXU at full rate with f32 accumulation; f32 oracle runs exact)
        mdt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
        qg = q.reshape(B, T, Hkv, groups, Dk).astype(mdt)
        scores = (
            jnp.einsum(
                "btkgd,bksd->bkgts", qg, k_seq.astype(mdt),
                preferred_element_type=jnp.float32,
            ) * scale
        )  # [B, Hkv, groups, T, S] f32 accum
        if cfg.alibi_bias > 0.0:
            slopes = alibi_slopes(H, cfg.alibi_bias).reshape(1, Hkv, groups, 1, 1)
            delta = (
                slot_pos[:, None, :] - inputs.positions[:, :, None]
            ).astype(jnp.float32)  # [B, T, S] (<= 0 for past tokens)
            scores = scores + slopes * delta[:, None, None, :, :]
        if cfg.attn_logit_softcap:
            scores = softcap(scores, cfg.attn_logit_softcap)
        scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
        if group_sel is not None:  # MSA: per-GQA-group block selection
            scores = jnp.where(group_sel[:, :, None], scores, -jnp.inf)
        if sinks is not None:
            # sink = extra always-on logit per q head in the softmax denominator
            sink_col = jnp.broadcast_to(
                sinks.astype(jnp.float32).reshape(1, Hkv, groups, 1, 1),
                scores.shape[:-1] + (1,),
            )
            probs = jax.nn.softmax(
                jnp.concatenate([scores, sink_col], axis=-1), axis=-1
            )[..., :-1]
        else:
            probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)  # fully-masked rows
        out = jnp.einsum(
            "bkgts,bksd->btkgd", probs.astype(mdt), v_seq.astype(mdt),
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(B, T, H * Dv).astype(x.dtype)
    if "attn_sub_norm" in lw:
        # bitnet: rms-normalize the attention output before o_proj
        # (reference src/models/bitnet.cpp attn_sub_norm)
        out = rms_norm(out, lw["attn_sub_norm"], cfg.rms_eps)
    if gate_q is not None:
        out = out * jax.nn.sigmoid(gate_q.astype(jnp.float32)).astype(out.dtype)
    if "attn_gate" in lw:
        # attention output gate before o_proj: qwen3next/afmoe use
        # sigmoid(g_proj(x)) per element; laguna uses softplus with either a
        # per-element or per-HEAD gate (width n_head, broadcast over head_dim
        # — laguna.cpp:243-249 shape detection)
        g = matmul(x, lw["attn_gate"], dtype=jnp.float32)
        if cfg.extra.get("attn_gate_fn") == "softplus":
            g = jax.nn.softplus(g)
        else:
            g = jax.nn.sigmoid(g)
        if g.shape[-1] == H and H * Dv != H:  # per-head scalar gate
            out = (out.reshape(B, T, H, Dv)
                   * g[..., None].astype(out.dtype)).reshape(B, T, H * Dv)
        else:
            out = out * g.astype(out.dtype)
    _tap(il, "attn_output", out)
    out = matmul(out, lw["attn_output"])
    if "attn_output_bias" in lw:
        out = out + lw["attn_output_bias"]
    if mem is not None:
        from dataclasses import replace as _mem_rep

        return out, _mem_rep(mem, kv=kv)
    return out, kv


def mla_attention_block(
    cfg: ModelConfig,
    lw: dict[str, Weight],
    x: jnp.ndarray,  # [B, T, E]
    inputs: AttnInputs,
    kv: KVCache,
    il: int,
    update_pos: bool | None = None,
) -> tuple[jnp.ndarray, KVCache]:
    """DeepSeek-2 Multi-head Latent Attention, naive MHA expansion
    (reference src/models/deepseek2.cpp non-is_mla path): Q from optional
    q-LoRA, K/V decompressed from the shared kv latent; RoPE on the tail
    qk_rope dims of each head plus the shared k_pe channel."""
    B, T = x.shape[:2]
    H = cfg.n_heads
    Dk, Dv = cfg.head_dim_k, cfg.head_dim_v  # Dk = qk_nope + qk_rope
    n_rot = cfg.rope_dims  # qk_rope head dim
    nope = Dk - n_rot
    kv_lora = cfg.extra["kv_lora_rank"]
    dsa = hasattr(kv, "idx")  # DeepSeek sparse attention (DSAMemory)
    mem = kv
    if dsa:
        kv = mem.kv

    # --- queries ----------------------------------------------------------
    qr = None
    if "attn_q_a" in lw:
        qr = matmul(x, lw["attn_q_a"])
        qr = rms_norm(qr, lw.get("attn_q_a_norm"), cfg.rms_eps)
        q = matmul(qr, lw["attn_q_b"])
    else:  # lite variant
        q = matmul(x, lw["attn_q"])
    q = q.reshape(B, T, H, Dk)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    # --- shared kv latent + rope channel -----------------------------------
    kv_pe = matmul(x, lw["attn_kv_a_mqa"])  # [B, T, kv_lora + n_rot]
    kv_cmpr = rms_norm(kv_pe[..., :kv_lora], lw.get("attn_kv_a_norm"), cfg.rms_eps)
    k_pe = kv_pe[..., kv_lora:].reshape(B, T, 1, n_rot)

    from dataclasses import replace as _rp_replace

    rp = _rp_replace(_rope_params(cfg, il), n_dims=n_rot)
    if cfg.rope_type != ROPE_TYPE_NONE:
        # kimi-linear MLA has NO rope at all (kimi-linear.cpp: "Kimi MLA
        # does NOT use RoPE, rotary_emb=None in vLLM")
        q_pe = apply_rope(q_pe, inputs.positions, rp)
        k_pe = apply_rope(k_pe, inputs.positions, rp)

    # YaRN-corrected kq scale (deepseek2.cpp:26-28); 1/sqrt(Dk) without yarn
    mscale = 1.0
    if cfg.rope_ext_factor > 0.0 and cfg.rope_freq_scale != 1.0:
        import math as _math

        log_mul = cfg.extra.get("yarn_log_mul", 0.0)
        attn_factor_org = cfg.rope_attn_factor * (
            1.0 + 0.1 * _math.log(1.0 / cfg.rope_freq_scale))
        mscale = attn_factor_org * (
            1.0 + 0.1 * log_mul * _math.log(1.0 / cfg.rope_freq_scale))
    kq_scale = mscale * mscale / float(Dk) ** 0.5

    if "mla_k_b" in lw and not dsa:
        # absorbed-latent path (reference build_attn_mha MLA absorption,
        # src/llama-graph.cpp:2499-2618): cache [c_kv | pad | k_pe] once per
        # token (one kv head), absorb W_UK into the q contraction and apply
        # W_UV to the latent attention output — identical math to the naive
        # expansion, ~70x fewer KV bytes/token for DeepSeek-V3 shapes.
        return _mla_absorbed_attention(
            cfg, lw, x, inputs, kv, il, q_nope, q_pe, kv_cmpr, k_pe,
            kq_scale, update_pos)

    # --- decompress K/V (wkv_b) --------------------------------------------
    kv_dec = matmul(kv_cmpr, lw["attn_kv_b"]).reshape(B, T, H, nope + Dv)
    k_nope = kv_dec[..., :nope]
    v = kv_dec[..., nope:]

    qf = jnp.concatenate([q_nope, q_pe], axis=-1)  # [B, T, H, Dk]
    kf = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (B, T, H, n_rot))], axis=-1)

    seq_flat = jnp.repeat(inputs.seq_idx, T)
    kv = kv.write_layer(
        il, seq_flat, inputs.positions.reshape(-1),
        kf.reshape(B * T, H, Dk), v.reshape(B * T, H, Dv),
        update_pos=update_pos, contiguous=B == 1 and T > 1,
    )
    paged = hasattr(kv, "table")
    slot_pos = (kv.seq_slot_pos(inputs.seq_idx) if paged
                else kv.pos[inputs.seq_idx])

    sparse_sel = None
    if dsa and "indexer_attn_q_b" not in lw:
        # glm-dsa "lite" indexer layers (glm-dsa.cpp:238 "shared indexer
        # layers reuse the top_k from the previous full indexer layers")
        sparse_sel = _DSA_CARRY.get("sel")
    elif dsa:
        # lightning indexer (reference src/models/deepseek32.cpp:231-365):
        # score[t, s] = sum_h w[t,h] * relu(iq[t,h] . ik[s]) / sqrt(Di*Hi);
        # top-k columns per query row gate the main attention mask. The
        # reference's Hadamard rotation preserves dot products — skipped.
        from dataclasses import replace as _dsa_rep

        Hi = cfg.extra["indexer_n_head"]
        Di = cfg.extra["indexer_head_size"]
        topk = cfg.extra["indexer_top_k"]
        iq = matmul(qr, lw["indexer_attn_q_b"]).reshape(B, T, Hi, Di)
        iq_pe = apply_rope(iq[..., :n_rot], inputs.positions, rp)
        iq = jnp.concatenate([iq_pe, iq[..., n_rot:]], axis=-1)
        ik = matmul(x, lw["indexer_attn_k"])  # [B, T, Di]
        ik = layer_norm(ik, lw.get("indexer_k_norm"),
                        lw.get("indexer_k_norm_bias"), cfg.norm_eps)
        ik = ik.reshape(B, T, 1, Di)
        ik_pe = apply_rope(ik[..., :n_rot], inputs.positions, rp)
        ik = jnp.concatenate([ik_pe, ik[..., n_rot:]], axis=-1)
        idxc = mem.idx.write_layer(
            il, seq_flat, inputs.positions.reshape(-1),
            ik.reshape(B * T, 1, Di),
            jnp.zeros((B * T, 1, mem.idx.v.shape[-1]), ik.dtype),
            update_pos=update_pos, contiguous=B == 1 and T > 1,
        )
        mem = _dsa_rep(mem, idx=idxc)
        ik_all = idxc.k[il][inputs.seq_idx][:, 0]  # [B, S, Di]
        w_idx = matmul(x, lw["indexer_proj"], dtype=jnp.float32)  # [B, T, Hi]
        sc = jax.nn.relu(jnp.einsum(
            "bthd,bsd->bhts", iq.astype(jnp.float32),
            ik_all.astype(jnp.float32)))
        sc = jnp.einsum("bhts,bth->bts", sc, w_idx) / float(Hi * Di) ** 0.5
        ivalid = (slot_pos >= 0)[:, None, :]
        icausal = slot_pos[:, None, :] <= inputs.positions[:, :, None]
        sc = jnp.where(ivalid & icausal, sc, -jnp.inf)
        S_ = sc.shape[-1]
        k_eff = min(topk, S_)
        _, top_idx = jax.lax.top_k(sc, k_eff)  # [B, T, k]
        sparse_sel = jnp.any(
            jax.nn.one_hot(top_idx, S_, dtype=bool), axis=-2)  # [B, T, S]
        _DSA_CARRY["sel"] = sparse_sel  # trace-time carry for lite layers

    if flash_supported(Dk, Dv, kv.n_slots) and not dsa and paged:
        from ..ops.pallas.flash_attn import mha_flash_paged

        out = mha_flash_paged(
            qf, kv, il, inputs.seq_idx, inputs.positions,
            sm_scale=kq_scale,
            interpret=jax.default_backend() != "tpu",
        ).astype(x.dtype)
    elif flash_supported(Dk, Dv, kv.n_slots) and not dsa:
        k_raw = kv.k[il][inputs.seq_idx]
        v_raw = kv.v[il][inputs.seq_idx]
        ks = kv.k_scale[il][inputs.seq_idx] if kv.quantized else None
        vs = kv.v_scale[il][inputs.seq_idx] if kv.quantized else None
        out = mha_flash(
            qf, k_raw, v_raw, inputs.positions, slot_pos,
            sm_scale=kq_scale, k_scale=ks, v_scale=vs,
            interpret=jax.default_backend() != "tpu",
            ring=kv.ring,
        ).astype(x.dtype)
    else:
        if paged:
            k_seq, v_seq, _ = kv.gather_seq(il, inputs.seq_idx)
        else:
            k_all, v_all = kv.read(il)
            k_seq = k_all[inputs.seq_idx]  # [B, H, S, Dk]
            v_seq = v_all[inputs.seq_idx]
        valid = slot_pos >= 0
        causal = slot_pos[:, None, :] <= inputs.positions[:, :, None]
        mask = valid[:, None, :] & causal
        if sparse_sel is not None:  # DSA: only the indexer's top-k columns
            mask = mask & sparse_sel
        mdt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
        scores = jnp.einsum(
            "bthd,bhsd->bhts", qf.astype(mdt), k_seq.astype(mdt),
            preferred_element_type=jnp.float32,
        ) * kq_scale
        scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        out = jnp.einsum(
            "bhts,bhsd->bthd", probs.astype(mdt), v_seq.astype(mdt),
            preferred_element_type=jnp.float32,
        ).reshape(B, T, H * Dv).astype(x.dtype)

    out = matmul(out, lw["attn_output"])
    if dsa:
        from dataclasses import replace as _dsa_rep2

        return out, _dsa_rep2(mem, kv=kv)
    return out, kv


def _mla_absorbed_attention(cfg, lw, x, inputs, kv, il, q_nope, q_pe,
                            kv_cmpr, k_pe, kq_scale, update_pos):
    """Absorbed MLA attention: MQA over the cached compressed latent.

    q_eff = [q_nope @ W_UK | 0-pad | q_pe]  (per head, width C+pad+rot)
    k_eff = [c_kv | 0-pad | k_pe]           (ONE shared kv head)
    v_eff = c_kv                            (width C)
    out   = softmax(q_eff k_eff^T * scale) v_eff @ W_UV   per head.
    """
    from ..ops.pallas.flash_attn import mha_flash, mha_flash_paged

    B, T, H, _ = q_nope.shape
    C = kv_cmpr.shape[-1]
    pad = cfg.extra.get("mla_pad", 0)
    Dv = cfg.head_dim_v
    mdt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    wk = lw["mla_k_b"]  # [C, H, nope]
    wv = lw["mla_v_b"]  # [C, H, Dv]

    q_abs = jnp.einsum(
        "bthn,chn->bthc", q_nope.astype(mdt), wk.astype(mdt),
        preferred_element_type=jnp.float32).astype(x.dtype)
    parts_q = [q_abs]
    parts_k = [kv_cmpr[:, :, None, :].astype(x.dtype)]
    if pad:
        parts_q.append(jnp.zeros((B, T, H, pad), q_abs.dtype))
        parts_k.append(jnp.zeros((B, T, 1, pad), q_abs.dtype))
    parts_q.append(q_pe.astype(q_abs.dtype))
    parts_k.append(k_pe.astype(q_abs.dtype))
    qf = jnp.concatenate(parts_q, axis=-1)  # [B, T, H, Dc]
    kf = jnp.concatenate(parts_k, axis=-1)  # [B, T, 1, Dc]
    vf = kv_cmpr[:, :, None, :].astype(x.dtype)  # [B, T, 1, C]
    Dc = qf.shape[-1]

    seq_flat = jnp.repeat(inputs.seq_idx, T)
    kv = kv.write_layer(
        il, seq_flat, inputs.positions.reshape(-1),
        kf.reshape(B * T, 1, Dc), vf.reshape(B * T, 1, C),
        update_pos=update_pos, contiguous=B == 1 and T > 1,
    )
    paged = hasattr(kv, "table")
    interp = jax.default_backend() != "tpu"
    if flash_supported(Dc, C, kv.n_slots) and paged:
        out_lat = mha_flash_paged(
            qf, kv, il, inputs.seq_idx, inputs.positions,
            sm_scale=kq_scale, interpret=interp)  # [B, T, H*C]
    elif flash_supported(Dc, C, kv.n_slots):
        slot_pos = kv.pos[inputs.seq_idx]
        k_raw = kv.k[il][inputs.seq_idx]
        v_raw = kv.v[il][inputs.seq_idx]
        ks = kv.k_scale[il][inputs.seq_idx] if kv.quantized else None
        vs = kv.v_scale[il][inputs.seq_idx] if kv.quantized else None
        out_lat = mha_flash(
            qf, k_raw, v_raw, inputs.positions, slot_pos,
            sm_scale=kq_scale, k_scale=ks, v_scale=vs,
            interpret=interp, ring=kv.ring)
    else:
        if paged:
            k_seq, v_seq, slot_pos = kv.gather_seq(il, inputs.seq_idx)
        else:
            slot_pos = kv.pos[inputs.seq_idx]
            k_all, v_all = kv.read(il)
            k_seq = k_all[inputs.seq_idx]  # [B, 1, S, Dc]
            v_seq = v_all[inputs.seq_idx]
        valid = slot_pos >= 0
        causal = slot_pos[:, None, :] <= inputs.positions[:, :, None]
        mask = valid[:, None, :] & causal  # [B, T, S]
        scores = jnp.einsum(
            "bthd,bsd->bhts", qf.astype(mdt), k_seq[:, 0].astype(mdt),
            preferred_element_type=jnp.float32) * kq_scale
        scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        out_lat = jnp.einsum(
            "bhts,bsd->bthd", probs.astype(mdt), v_seq[:, 0].astype(mdt),
            preferred_element_type=jnp.float32).reshape(B, T, H * C)

    out_lat = out_lat.reshape(B, T, H, C)
    out = jnp.einsum(
        "bthc,chd->bthd", out_lat.astype(mdt), wv.astype(mdt),
        preferred_element_type=jnp.float32)
    out = out.reshape(B, T, H * Dv).astype(x.dtype)
    out = matmul(out, lw["attn_output"])
    return out, kv


def xielu(x, alpha_n, alpha_p, beta, eps):
    """Apertus xIELU (reference ggml op_xielu, ggml-cpu/unary-ops.cpp:55)."""
    pos = alpha_p * x * x + beta * x
    neg = (jnp.expm1(jnp.minimum(x, eps)) - x) * alpha_n + beta * x
    return jnp.where(x > 0, pos, neg)


def ffn_block(
    cfg: ModelConfig, lw: dict[str, Weight], x: jnp.ndarray, il: int = -1
) -> jnp.ndarray:
    if cfg.act == "xielu":  # per-layer learned scalars (apertus)
        an, ap, beta, eps = (cfg.extra["xielu"][k][il]
                             for k in ("alpha_n", "alpha_p", "beta", "eps"))
        def act(v, _an=an, _ap=ap, _b=beta, _e=eps):
            return xielu(v.astype(jnp.float32), _an, _ap, _b, _e).astype(v.dtype)
    else:
        act = ACTIVATIONS[cfg.act]
    _tap(il, "ffn_up", x)
    if "ffn_gateup" in lw:  # load-time fused gate|up projection
        gu = matmul(x, lw["ffn_gateup"])
        half = gu.shape[-1] // 2
        h = act(gu[..., :half]) * gu[..., half:]
    elif cfg.glu:
        _tap(il, "ffn_gate", x)
        gate = matmul(x, lw["ffn_gate"])
        if "ffn_gate_bias" in lw:  # jais gated-with-bias FFN
            gate = gate + lw["ffn_gate_bias"]
        up = matmul(x, lw["ffn_up"])
        if "ffn_up_bias" in lw:
            up = up + lw["ffn_up_bias"]
        h = act(gate) * up
    else:
        up = matmul(x, lw["ffn_up"])
        if "ffn_up_bias" in lw:
            up = up + lw["ffn_up_bias"]
        h = act(up)
    if "ffn_sub_norm" in lw:
        # bitnet: rms-normalize the hidden before ffn_down (ffn_sub_norm)
        h = rms_norm(h, lw["ffn_sub_norm"], cfg.rms_eps)
    _tap(il, "ffn_down", h)
    y = matmul(h, lw["ffn_down"])
    if "ffn_down_bias" in lw:
        y = y + lw["ffn_down_bias"]
    return y


def swiglu_oai(g: jnp.ndarray, u: jnp.ndarray, alpha=1.702, limit=7.0):
    """gpt-oss clamped glu (reference ggml swiglu_oai op,
    ggml/src/ggml-cpu/ops.cpp:3323): (min(g,L)·sigmoid(a·min(g,L)))·(clamp(u)+1)."""
    g = jnp.minimum(g, limit)
    u = jnp.clip(u, -limit, limit)
    return g * jax.nn.sigmoid(alpha * g) * (u + 1.0)


def moe_block(
    cfg: ModelConfig, lw: dict[str, Weight], x: jnp.ndarray,
    router_x: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mixture-of-experts FFN (build_moe_ffn analog, src/llama-graph.cpp:1955-
    2075): router (+bias) -> gating fn -> optional selection bias -> top-k ->
    weight post-processing (softmax_weight / norm / scale) -> expert mix.

    v1 dispatch: dense loop over all experts (correct for any top-k);
    ragged sort-by-expert dispatch lands with the Pallas MoE kernel.
    """
    n_exp, k = cfg.n_expert, cfg.n_expert_used
    # smallthinker routes on the raw residual stream, not the normed input
    logits = matmul(x if router_x is None else router_x,
                    lw["ffn_gate_inp"], dtype=jnp.float32)  # [N, n_exp]
    if "ffn_gate_inp_bias" in lw:
        logits = logits + lw["ffn_gate_inp_bias"].astype(jnp.float32)

    gating = cfg.expert_gating
    if gating == "softmax":
        probs = jax.nn.softmax(logits, axis=-1)
    elif gating == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    elif gating == "softmax_weight":
        probs = logits  # softmax applied over the selected k below
    elif gating == "sqrt_softplus":
        probs = jnp.sqrt(jax.nn.softplus(logits))
    elif gating == "sparsemixer":
        # phimoe inference-path sparsemixer (HF modeling_phimoe.sparsemixer):
        # two sequential masked-argmax picks; each pick's weight is the
        # softmax over jitter-plausible experts at the picked index
        probs = None
    else:  # pragma: no cover - config error
        raise ValueError(f"unknown expert gating {gating!r}")

    if gating == "sparsemixer":
        topi, topw = _sparsemixer_route(
            logits, cfg.extra.get("router_jitter", 0.01))
    else:
        # expert-selection bias (DeepSeek V3) biases the top-k choice only
        sel = probs
        if "exp_probs_b" in lw:
            sel = probs + lw["exp_probs_b"].astype(jnp.float32)
        _, topi = jax.lax.top_k(sel, k)  # [N, k]
        topw = jnp.take_along_axis(probs, topi, axis=-1)  # stay unbiased
        if gating == "softmax_weight":
            topw = jax.nn.softmax(topw, axis=-1)
        if cfg.expert_weights_norm:
            topw = topw / jnp.clip(
                jnp.sum(topw, axis=-1, keepdims=True), 6.103515625e-5, None
            )
        topw = topw * cfg.expert_weights_scale

    gate_w = lw["ffn_gate_exps"]
    up_w = lw["ffn_up_exps"]
    down_w = lw["ffn_down_exps"]
    act = ACTIVATIONS[cfg.act]

    # decode-shape dispatch: when tokens*top_k < n_expert, gather only the
    # selected experts' weights (HBM traffic ∝ k experts instead of all —
    # the TPU answer to mmid/ragged dispatch for small batches)
    n_tok = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    if n_tok * k < n_exp:
        out = _moe_gather(cfg, lw, x, topi, topw, act)
        if cfg.n_expert_shared > 0 and "ffn_gate_shexp" in lw:
            h = act(matmul(x, lw["ffn_gate_shexp"])) * matmul(x, lw["ffn_up_shexp"])
            sh = matmul(h, lw["ffn_down_shexp"]).astype(jnp.float32)
            if "ffn_gate_inp_shexp" in lw:
                sh = sh * jax.nn.sigmoid(
                    matmul(x, lw["ffn_gate_inp_shexp"], dtype=jnp.float32))
            out = out + sh
        return out.astype(x.dtype)

    # expert parallelism: when the session plan names an ep axis and the
    # shapes divide, dispatch tokens to expert owners over ICI all-to-all
    # (parallel/expert.py) instead of computing every expert's share locally
    from ..parallel.state import get_plan

    plan = get_plan()
    if (plan.ep and n_exp % plan.mesh.shape[plan.ep_axis] == 0
            and n_tok % plan.mesh.shape[plan.ep_axis] == 0
            and not cfg.extra.get("moe_weight_before")
            and "ffn_gate_exps_bias" not in lw
            and "ffn_up_exps_bias" not in lw
            and "ffn_down_exps_bias" not in lw):
        from ..parallel.expert import ep_moe

        lead = x.shape[:-1]
        out = ep_moe(
            plan.mesh, plan.ep_axis, x.reshape(n_tok, x.shape[-1]),
            topi.reshape(n_tok, k), topw.reshape(n_tok, k),
            gate_w, up_w, down_w, n_expert=n_exp, act=act,
            moe_act=cfg.moe_act, capacity_factor=plan.capacity_factor,
        ).reshape(*lead, x.shape[-1])
    else:
        # prefill shapes: sort-by-expert ragged segment GEMM (the TPU answer
        # to GGML_OP_MUL_MAT_ID, ggml.h:514) — FLOPs scale with tokens*top_k,
        # not tokens*n_expert, and XLA's ragged_dot tiles the segments on MXU
        out = _moe_ragged(cfg, lw, x, topi, topw, act)

    if cfg.n_expert_shared > 0 and "ffn_gate_shexp" in lw:
        h = act(matmul(x, lw["ffn_gate_shexp"])) * matmul(x, lw["ffn_up_shexp"])
        sh = matmul(h, lw["ffn_down_shexp"]).astype(jnp.float32)
        if "ffn_gate_inp_shexp" in lw:  # qwen2moe sigmoid-gated shared expert
            sh = sh * jax.nn.sigmoid(
                matmul(x, lw["ffn_gate_inp_shexp"], dtype=jnp.float32))
        out = out + sh
    return out.astype(x.dtype)


def _dequant_all_experts(w: Weight, dtype=jnp.bfloat16) -> jnp.ndarray:
    """-> [E, in, out] bf16 rhs for ragged_dot (dequantized if needed)."""
    if isinstance(w, QuantTensor):
        q = w.q.astype(dtype)
        sc = w.scales.astype(dtype)
        g = w.group
        if w.transposed:  # q [E, K, O], scales [E, K//g, O]
            E_, K, O = q.shape
            wd = (q.reshape(E_, K // g, g, O) * sc[:, :, None, :]).reshape(E_, K, O)
            if w.mins is not None:
                wd = wd + jnp.repeat(w.mins.astype(dtype), g, axis=1)
            return wd
        E_, O, K = q.shape
        wd = (q.reshape(E_, O, K // g, g) * sc[..., None]).reshape(E_, O, K)
        if w.mins is not None:
            wd = wd + jnp.repeat(w.mins.astype(dtype), g, axis=2)
        return wd.transpose(0, 2, 1)
    return w.astype(dtype).transpose(0, 2, 1)  # dense [E, O, K] -> [E, K, O]


def _moe_ragged(cfg, lw, x, topi, topw, act,
                keys=("ffn_gate_exps", "ffn_up_exps", "ffn_down_exps"),
                n_expert: int | None = None) -> jnp.ndarray:
    """Sort-by-expert ragged dispatch for prefill-sized token counts:
    flatten (token, slot) pairs, sort by expert id, run the three FFN GEMMs
    as grouped matmuls (jax.lax.ragged_dot), unsort, and mix by gate weight.
    Matches the reference's single MUL_MAT_ID over all experts while doing
    only top_k worth of FLOPs per token."""
    lead = x.shape[:-1]
    E = x.shape[-1]
    N = int(np.prod(lead)) if lead else 1
    k = topi.shape[-1]
    n_exp = n_expert or cfg.n_expert
    M = N * k
    xf = x.reshape(N, E)
    e_flat = topi.reshape(M).astype(jnp.int32)
    tw = topw.reshape(N, k)

    order = jnp.argsort(e_flat)  # stable: preserves token order per expert
    es = e_flat[order]
    counts = jnp.bincount(e_flat, length=n_exp).astype(jnp.int32)
    inv = jnp.argsort(order)

    mdt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    xs = xf[order // k].astype(mdt)  # [M, E] sorted by expert
    weight_before = cfg.extra.get("moe_weight_before", False)
    if weight_before:  # llama4: gate scales the expert INPUT
        tw_sorted = tw.reshape(M)[order]
        xs = (xs.astype(jnp.float32) * tw_sorted[:, None]).astype(mdt)

    def emm(w, h):
        wd = _dequant_all_experts(w, mdt)
        return jax.lax.ragged_dot(h.astype(mdt), wd, counts,
                                  preferred_element_type=jnp.float32)

    def bias(name):
        return jnp.take(lw[name], es, axis=0).astype(jnp.float32)

    gate_key, up_key, down_key = keys
    g = emm(lw[gate_key], xs)
    u = emm(lw[up_key], xs)
    if gate_key + "_bias" in lw:
        g = g + bias(gate_key + "_bias")
    if up_key + "_bias" in lw:
        u = u + bias(up_key + "_bias")
    h = swiglu_oai(g, u) if cfg.moe_act == "swiglu_oai" else act(g) * u
    y = emm(lw[down_key], h.astype(mdt))
    if down_key + "_bias" in lw:
        y = y + bias(down_key + "_bias")

    y = y[inv].reshape(N, k, E)  # unsort back to (token, slot) order
    if weight_before:
        out = jnp.sum(y, axis=1)
    else:
        out = jnp.sum(y * tw[:, :, None], axis=1)
    return out.reshape(*lead, E)


def _gather_expert(w: Weight, idx: jnp.ndarray, dtype=jnp.bfloat16):
    """Gather + dequantize expert slices: idx [M] -> [M, in, out] (transposed
    planes) or [M, out, in] dense."""
    if isinstance(w, QuantTensor):
        q = jnp.take(w.q, idx, axis=0).astype(dtype)  # [M, a, b]
        sc = jnp.take(w.scales, idx, axis=0).astype(dtype)
        g = w.group
        if w.transposed:  # [M, in, out]: scales [M, in//g, out]
            M, K, O = q.shape
            wde = q.reshape(M, K // g, g, O) * sc[:, :, None, :]
            wde = wde.reshape(M, K, O)
            if w.mins is not None:
                mn = jnp.take(w.mins, idx, axis=0).astype(dtype)
                wde = wde + jnp.repeat(mn, g, axis=1)
            return wde
        M, O, K = q.shape
        wde = q.reshape(M, O, K // g, g) * sc[:, :, :, None]
        wde = wde.reshape(M, O, K)
        if w.mins is not None:
            mn = jnp.take(w.mins, idx, axis=0).astype(dtype)
            wde = wde + jnp.repeat(mn, g, axis=2)
        return wde
    return jnp.take(w, idx, axis=0).astype(dtype)


def _moe_expert_mm(w: Weight, h: jnp.ndarray, idx: jnp.ndarray):
    """h [R, a] @ W[idx[r]] per row via the indexed-expert Pallas kernel
    (mmid analog) when available; None when unsupported."""
    if not (isinstance(w, QuantTensor) and w.transposed and w.q.ndim == 3):
        return None
    try:
        if jax.default_backend() != "tpu":
            return None
        from ..ops.pallas.qmm import qmm_planes_expert

        R, K = h.shape
        h8 = jnp.broadcast_to(h[:, None], (R, 8, K)).astype(jnp.bfloat16)
        return qmm_planes_expert(
            h8, idx, w.q, w.scales.astype(jnp.float32),
            None if w.mins is None else w.mins.astype(jnp.float32),
            group=w.group,
        )
    except Exception:  # pragma: no cover - kernel unsupported shape
        return None


def _sparsemixer_route(logits, eps):
    """-> (topi [N,2], topw [N,2]) per HF sparsemixer inference semantics."""

    def pick(scores):
        mx = jnp.max(scores, axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(logits), mx)
        masked = jnp.where((mx - scores) / factor > 2 * eps, -jnp.inf, scores)
        idx = jnp.argmax(scores, axis=-1)
        p = jax.nn.softmax(masked, axis=-1)
        wgt = jnp.take_along_axis(p, idx[..., None], axis=-1)[..., 0]
        return idx, wgt

    i1, w1 = pick(logits)
    scores2 = jnp.where(
        jax.nn.one_hot(i1, logits.shape[-1], dtype=bool), -jnp.inf, logits)
    i2, w2 = pick(scores2)
    topi = jnp.stack([i1, i2], axis=-1)  # [N, 2]
    topw = jnp.stack([w1, w2], axis=-1).astype(jnp.float32)
    return topi, topw


def _moe_gather(cfg, lw, x, topi, topw, act):
    """Per-token gathered expert FFN: y = Σ_j w_j · FFN_{e_j}(x)."""
    lead = x.shape[:-1]
    E = x.shape[-1]
    N = int(np.prod(lead)) if lead else 1
    k = topi.shape[-1]
    xf = x.reshape(N, E)
    idx = topi.reshape(N * k)
    tw = topw.reshape(N, k)

    mdt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    gw = lw["ffn_gate_exps"]
    trans = isinstance(gw, QuantTensor) and gw.transposed

    def emm(w, h):  # h [N,k,a] @ expert w [N*k, ...] -> [N,k,b]
        M = N * k
        ha = h.reshape(M, -1)
        y = _moe_expert_mm(w, ha, idx)  # fused dequant kernel path
        if y is not None:
            return y.reshape(N, k, -1)
        wd = _gather_expert(w, idx, mdt)
        if trans:
            y = jnp.einsum("ma,mab->mb", ha.astype(mdt), wd,
                           preferred_element_type=jnp.float32)
        else:
            y = jnp.einsum("ma,mba->mb", ha.astype(mdt), wd,
                           preferred_element_type=jnp.float32)
        return y.reshape(N, k, -1)

    if cfg.extra.get("moe_weight_before", False):
        xk = xf[:, None].astype(jnp.float32) * tw[:, :, None]
        xk = xk.astype(xf.dtype)
    else:
        xk = jnp.broadcast_to(xf[:, None], (N, k, E))
    g = emm(lw["ffn_gate_exps"], xk)
    u = emm(lw["ffn_up_exps"], xk)
    if "ffn_gate_exps_bias" in lw:
        g = g + jnp.take(lw["ffn_gate_exps_bias"], idx, axis=0).reshape(N, k, -1)
    if "ffn_up_exps_bias" in lw:
        u = u + jnp.take(lw["ffn_up_exps_bias"], idx, axis=0).reshape(N, k, -1)
    h = swiglu_oai(g, u) if cfg.moe_act == "swiglu_oai" else act(g) * u
    y = emm(lw["ffn_down_exps"], h)
    if "ffn_down_exps_bias" in lw:
        y = y + jnp.take(lw["ffn_down_exps_bias"], idx, axis=0).reshape(N, k, -1)
    if cfg.extra.get("moe_weight_before", False):
        out = jnp.sum(y, axis=1)  # gate already applied to the input
    else:
        out = jnp.sum(y * tw[:, :, None], axis=1)  # [N, E]
    return out.reshape(*lead, E).astype(jnp.float32)


def _grovemoe_ffn(cfg, lw, h) -> jnp.ndarray:
    """GroveMoE adjugate experts (reference src/models/grovemoe.cpp): the
    router's top-k drives BOTH the main expert mix and a second pass of
    per-group chunk experts applied to the main mix's OUTPUT, scaled by
    expert_group_scale: ff = moe(h) + group_scale * chunk_moe(moe(h))."""
    n_group = max(1, int(cfg.extra.get("n_group_experts", 1)))
    group_scale = float(cfg.extra.get("expert_group_scale", 0.05))
    n_chunk = int(cfg.extra.get("n_chunk_expert",
                                max(1, cfg.n_expert // n_group)))
    k = cfg.n_expert_used
    act = ACTIVATIONS[cfg.act]
    logits = matmul(h, lw["ffn_gate_inp"], dtype=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, k)
    topw = topw / jnp.clip(topw.sum(-1, keepdims=True), 1e-9, None)
    topw = topw * cfg.expert_weights_scale
    main = _moe_ragged(cfg, lw, h, topi, topw, act).astype(h.dtype)

    chunk_i = topi // n_group
    kc = min(k, n_chunk)
    chunk_i = chunk_i[..., :kc]
    cw = jnp.take_along_axis(probs, chunk_i, axis=-1)
    cw = cw / jnp.clip(cw.sum(-1, keepdims=True), 1e-9, None)
    cw = cw * cfg.expert_weights_scale
    chunk = _moe_ragged(
        cfg, lw, main, chunk_i, cw, act,
        keys=("ffn_gate_chexps", "ffn_up_chexps", "ffn_down_chexps"),
        n_expert=n_chunk)
    return main.astype(jnp.float32) + group_scale * chunk


def forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T] int32
    inputs: AttnInputs,
    kv: KVCache,
    output_rows: jnp.ndarray | None = None,  # [M] flat row ids into B*T
    return_hidden: bool = False,  # pooling/embeddings path (llama_encode analog)
    inputs_embeds: jnp.ndarray | None = None,  # [B, T, E] multimodal splice
) -> tuple[jnp.ndarray, KVCache]:
    """-> (logits [B*T or M, vocab] or hidden [., n_embd], updated KV)."""
    cdtype = cfg.compute_dtype or jnp.bfloat16
    _DSA_CARRY["sel"] = None  # fresh per forward trace
    deepstack = None  # qwen3vl vision: [n_ds, B, T, E] per-layer residuals
    if inputs_embeds is not None:
        # pre-computed embeddings (mtmd image chunks spliced by the caller)
        x = inputs_embeds.astype(cdtype)
        n_ds = int(cfg.extra.get("n_deepstack", 0))
        if n_ds and x.shape[-1] == (1 + n_ds) * cfg.n_embd:
            # qwen3vl deepstack (qwen3vl.cpp:152-156): the vision tower emits
            # (1+n_ds) stacked embeddings; slice il+1 is added to layer il's
            # output (text-only rows carry zeros there)
            E_ = cfg.n_embd
            deepstack = [x[..., (j + 1) * E_: (j + 2) * E_] for j in range(n_ds)]
            x = x[..., :E_]
    else:
        x = embed_lookup(params["token_embd"], tokens, dtype=cdtype)  # [B, T, E]
        if cfg.embd_scale != 1.0:
            x = (x.astype(jnp.float32) * cfg.embd_scale).astype(x.dtype)
    if "pos_embd" in params:  # learned absolute positions (gpt2 wpe)
        pe = embed_lookup(params["pos_embd"], jnp.maximum(inputs.positions, 0),
                          dtype=cdtype)
        x = x + pe
    if "token_embd_norm" in params:  # bloom embedding layernorm
        x = layer_norm(x, params["token_embd_norm"],
                       params.get("token_embd_norm_bias"), cfg.norm_eps)

    embd_skip = None
    if cfg.extra.get("embd_skip"):
        # talkie: weightless-rms-normalized embedding added to every layer
        # output, scaled by a per-layer scalar (layer_output_scale)
        x = rms_norm(x, None, cfg.rms_eps).astype(x.dtype)
        embd_skip = x
    # nanbeige looped layers (reference src/models/nanbeige.cpp:20-31): the
    # loader already replicated the physical stack n_loops times (shared
    # weight dicts), so each LOGICAL layer has its own KV lines; phys marks
    # the loop boundary for the inter-loop norm
    layer_seq = params["layers"]
    if cfg.extra.get("visexp") and inputs_embeds is not None:
        # CogVLM vision-expert ubatch (cogvlm.cpp:75-99): image-embedding
        # chunks run the PARALLEL visexp qkv/o/ffn weight set; text chunks
        # keep the regular weights
        layer_seq = [
            {**{k: v for k, v in lw.items()
                if k not in ("ffn_gateup", "attn_q", "attn_k", "attn_v")},
             "attn_qkv": lw["visexp_attn_qkv"],
             "attn_output": lw["visexp_attn_output"],
             "ffn_gate": lw["visexp_ffn_gate"],
             "ffn_up": lw["visexp_ffn_up"],
             "ffn_down": lw["visexp_ffn_down"]}
            for lw in layer_seq
        ]
    if "layer_stages" in params:
        # pipeline-parallel serving (parallel/pipeline.py): the dense layer
        # stack runs as a GPipe shard_map over the plan's pp axis; layers
        # and their KV lines are stage-resident, activations ride ICI
        from ..parallel.pipeline import pipeline_layer_stack
        from ..parallel.state import get_plan

        plan = get_plan()
        x, kv = pipeline_layer_stack(cfg, params["layer_stages"], x, inputs,
                                     kv, plan.mesh, axis=plan.pp_axis)
        layer_seq = []

    n_loops = cfg.extra.get("n_loops", 1)
    phys = max(len(layer_seq) // max(n_loops, 1), 1)
    def _is_mixer(lw):  # recurrent/conv mixer layers (not attention)
        return ("ssm_in" in lw or "shortconv_in" in lw or "ssm_ba" in lw
                or "ssm_beta" in lw or "ssm_f_a" in lw)

    first_attn = next(
        (i for i, lw in enumerate(layer_seq) if not _is_mixer(lw)), 0)
    ha = cfg.extra.get("n_head_arr")
    hka = cfg.extra.get("n_head_kv_arr")
    for il, lw in enumerate(layer_seq):
        x_in = x  # layer input (arctic MoE branch / smallthinker router)
        _tap(il, "l_in", x)  # EAGLE3 target-feature capture (layer input)
        if ha is not None and int(ha[il]) == 0 and "ffn_up" not in lw \
                and "ffn_gateup" not in lw and "ffn_gate_exps" not in lw:
            # deci dummy layer (attention-free AND FFN-free: the reference
            # graph leaves inpL untouched — deci.cpp n_head==0 + n_ff==0)
            _tap(il, "l_out", x)
            continue
        # olmo2-style norm-after: the mixer sees the raw residual stream and
        # its output is normalized before the residual add
        h = x if cfg.norm_after else norm(cfg, x, lw, "attn_norm")
        if "attn_output" not in lw and not _is_mixer(lw):
            # mixer-less block (nemotron-h "F" layers): the whole block is
            # one FFN on the shared norm (reference nemotron-h.cpp
            # build_ffn_layer; x = x + ffn(norm(x)))
            if "attn_norm" not in lw and "ffn_norm" in lw:
                # deci attention-free layer: the block norm is ffn_norm
                # (deci.cpp n_head==0 path: ffn(build_norm(x, ffn_norm)))
                h = norm(cfg, x, lw, "ffn_norm")
            if cfg.n_expert > 0 and "ffn_gate_exps" in lw:
                ff = moe_block(cfg, lw, h)
                if "ffn_up_shexp" in lw and "ffn_gate_shexp" not in lw:
                    # non-gated shared expert (relu2): up -> act -> down
                    hsh = ACTIVATIONS[cfg.act](matmul(h, lw["ffn_up_shexp"]))
                    ff = ff + matmul(hsh, lw["ffn_down_shexp"]).astype(ff.dtype)
                ff = ff.astype(x.dtype)
            else:
                ff = ffn_block(cfg, lw, h, il)
            x = x + (ff * cfg.residual_scale if cfg.residual_scale != 1.0 else ff)
            if "cvec" in params:
                x = x + params["cvec"][il].astype(x.dtype)
            _tap(il, "l_out", x)
            continue
        if "ssm_f_a" in lw:
            # kimi-linear KDA mixer (hybrid memory, per-channel decay)
            from dataclasses import replace as _replace

            from . import mamba as _mamba

            attn, new_conv, s_last = _mamba.kda_layer(
                cfg, lw, h, kv.rs, inputs.seq_idx, il)
            attn = attn.astype(x.dtype)
            kv = _replace(kv, rs=kv.rs.put(il, inputs.seq_idx, new_conv, s_last))
        elif "ssm_ba" in lw or "ssm_beta" in lw:
            # qwen3next/qwen35 gated DeltaNet mixer (hybrid memory)
            from dataclasses import replace as _replace

            from . import mamba as _mamba

            attn, new_conv, s_last = _mamba.gated_delta_layer(
                cfg, lw, h, kv.rs, inputs.seq_idx, il)
            attn = attn.astype(x.dtype)
            kv = _replace(kv, rs=kv.rs.put(il, inputs.seq_idx, new_conv, s_last))
        elif "shortconv_in" in lw:
            # LFM2 short-conv mixer (hybrid memory, conv window state only)
            from dataclasses import replace as _replace

            from . import mamba as _mamba

            attn, new_conv, s_last = _mamba.lfm2_shortconv_layer(
                cfg, lw, h, kv.rs, inputs.seq_idx, il)
            attn = attn.astype(x.dtype)
            kv = _replace(kv, rs=kv.rs.put(il, inputs.seq_idx, new_conv, s_last))
        elif "ssm_in" in lw:
            # hybrid model: SSM mixer replaces attention on this layer
            # (reference src/models/jamba.cpp:121-140)
            from dataclasses import replace as _replace

            from . import mamba as _mamba

            if cfg.extra.get("plamo2"):
                mixer = _mamba.plamo2_layer
            elif cfg.extra.get("ssm_version", 1) == 2:
                mixer = _mamba.mamba2_layer
            else:
                mixer = _mamba.mamba1_layer
            attn, new_conv, s_last = mixer(cfg, lw, h, kv.rs, inputs.seq_idx, il)
            attn = attn.astype(x.dtype)
            kv = _replace(kv, rs=kv.rs.put(il, inputs.seq_idx, new_conv, s_last))
            if "attn_output" in lw:
                # falcon-h1 dual mixer: attention runs in PARALLEL with the
                # SSM on the same normed input; outputs sum (reference
                # src/models/falcon-h1.cpp graph: cur = attn_out + ssm_out)
                akv = kv.kv
                up = None if hasattr(akv, "is_swa") else (il == first_attn)
                attn2, akv = attention_block(cfg, lw, h, inputs, akv, il,
                                             update_pos=up)
                kv = _replace(kv, kv=akv)
                attn = attn + attn2.astype(attn.dtype)
        elif (hka is not None and int(hka[il]) == 0
              and (ha is None or int(ha[il]) > 0)
              and "attn_q" not in lw and "attn_qkv" not in lw):
            # deci "linear attention" (deci.cpp n_head>0, n_head_kv==0):
            # the whole mixer is wo @ norm(x) — no heads, no KV
            attn = matmul(h, lw["attn_output"])
            if "attn_output_bias" in lw:
                attn = attn + lw["attn_output_bias"]
            attn = attn.astype(x.dtype)
        else:
            akv = kv.kv if hasattr(kv, "rs") else kv
            blk = mla_attention_block if "attn_kv_a_mqa" in lw else attention_block
            # iSWA caches track pos per sub-cache; let them decide
            up = None if hasattr(akv, "is_swa") else (il == first_attn)
            attn, akv = blk(cfg, lw, h, inputs, akv, il, update_pos=up)
            if hasattr(kv, "rs"):
                from dataclasses import replace as _replace

                kv = _replace(kv, kv=akv)
            else:
                kv = akv
        if (cfg.post_norms or cfg.norm_after) and "attn_post_norm" in lw:
            attn = rms_norm(attn, lw["attn_post_norm"], cfg.rms_eps)
        rscale = cfg.residual_scale

        if cfg.parallel_residual:
            # x = x + attn(norm1(x)) + ffn(norm2(x)); phi2 shares one norm
            h2 = h if cfg.shared_parallel_norm else norm(cfg, x, lw, "ffn_norm")
            if cfg.n_expert > 0 and "ffn_gate_exps" in lw:
                ff = moe_block(cfg, lw, h2).astype(x.dtype)  # cohere2moe
            else:
                ff = ffn_block(cfg, lw, h2, il)
            x = x + attn + ff
        else:
            x = x + (attn * rscale if rscale != 1.0 else attn)

            if ("ffn_up" not in lw and "ffn_gateup" not in lw
                    and "ffn_gate_exps" not in lw):
                # mixer-only block (nemotron-h M/A layers): no FFN half
                if "cvec" in params:
                    x = x + params["cvec"][il].astype(x.dtype)
                _tap(il, "l_out", x)
                continue
            h = x if cfg.norm_after else norm(cfg, x, lw, "ffn_norm")
            if cfg.n_expert > 0 and "ffn_gate_exps" in lw:
                if "ffn_norm_exps" in lw:
                    # arctic: dense FFN on ffn_norm(x) plus MoE on a separate
                    # norm of the LAYER INPUT (reference arctic.cpp graph)
                    moe_in = rms_norm(x_in, lw["ffn_norm_exps"], cfg.rms_eps)
                    ff = (ffn_block(cfg, lw, h, il).astype(jnp.float32)
                          + moe_block(cfg, lw, moe_in))
                elif "ffn_up_chexps" in lw:
                    ff = _grovemoe_ffn(cfg, lw, h)
                else:
                    rx = x_in if cfg.extra.get("router_raw_input") else None
                    ff = moe_block(cfg, lw, h, router_x=rx)
                    # dense+moe hybrid (deepseek/grok); the load-time fusion
                    # may have packed gate+up into one ffn_gateup plane
                    if "ffn_gate" in lw or "ffn_gateup" in lw:
                        ff = ff + ffn_block(cfg, lw, h, il)
                        ds = cfg.extra.get("dense_moe_scale", 1.0)
                        if ds != 1.0:  # grok: (dense+moe) * sqrt(2)/2
                            ff = ff * ds
            else:
                ff = ffn_block(cfg, lw, h, il)
            if (cfg.post_norms or cfg.norm_after) and "ffn_post_norm" in lw:
                ff = rms_norm(ff, lw["ffn_post_norm"], cfg.rms_eps)
            x = x + (ff * rscale if rscale != 1.0 else ff)

        if embd_skip is not None and "layer_out_scale" in lw:
            x = x + embd_skip * lw["layer_out_scale"].reshape(-1)[0].astype(x.dtype)
        if "cvec" in params:  # control vector (build_cvec analog)
            x = x + params["cvec"][il].astype(x.dtype)
        if deepstack is not None and il < len(deepstack):
            x = x + deepstack[il].astype(x.dtype)
        _tap(il, "l_out", x)  # residual stream (cvector-generator collection)

        if (n_loops > 1 and (il + 1) % phys == 0 and il + 1 < len(layer_seq)
                and not cfg.extra.get("skip_loop_final_norm")):
            # nanbeige inter-loop norm: output_norm re-applied at each loop
            # boundary (nanbeige.cpp:163-170 "loop_norm")
            x = norm(cfg, x, params, "output_norm")

    # pre-output-norm residual stream: "layer input" of layer n_layers (the
    # reference's embeddings_nextn row, read when an EAGLE3 target_layer id
    # equals n_layer — common/speculative.cpp:694-699)
    _tap(len(layer_seq), "l_in", x)
    B, T, E = x.shape
    x = x.reshape(B * T, E)
    if output_rows is not None:
        x = x[output_rows]
    x = norm(cfg, x, params, "output_norm")
    if return_hidden:
        return x, kv
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = matmul(x, out_w, dtype=jnp.float32)
    if "output_bias" in params:
        logits = logits + params["output_bias"].astype(jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap:
        logits = softcap(logits, cfg.final_logit_softcap)
    return logits, kv
