"""BERT-family encoder (embeddings / reranking models).

Analog of reference src/models/bert.cpp: post-norm encoder blocks with
bidirectional attention, learned absolute positions, token-type embeddings,
and optional CLS/rank heads. Runs full-sequence (llama_encode semantics) —
no KV cache; the `kv` argument passes through untouched.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.basic import layer_norm, rms_norm
from ..ops.qtensor import embed_lookup, matmul
from .config import ModelConfig
from .transformer import AttnInputs, _rope_params
from ..ops.rope import ROPE_TYPE_NONE, apply_rope


def forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    inputs: AttnInputs,
    kv,  # unused (encoder); returned unchanged
    output_rows: jnp.ndarray | None = None,
    return_hidden: bool = False,
    inputs_embeds: jnp.ndarray | None = None,
):
    B, T = tokens.shape
    H, Hkv = cfg.n_heads, cfg.n_kv_heads
    Dk, Dv = cfg.head_dim_k, cfg.head_dim_v
    eps = cfg.norm_eps

    if inputs_embeds is not None:
        x = inputs_embeds.astype(jnp.float32)
    else:
        x = embed_lookup(params["token_embd"], tokens, dtype=jnp.float32)
    if "token_types" in params:  # type 0 embedding (reference bert.cpp)
        x = x + params["token_types"][0].astype(jnp.float32)
    if "pos_embd" in params:
        x = x + embed_lookup(params["pos_embd"],
                             jnp.maximum(inputs.positions, 0), jnp.float32)
    if "token_embd_norm" in params:
        # bert-family embedding LN; pre-norm RMS encoders (neo-bert /
        # eurobert) feed raw embeddings into the first block (their
        # graphs have no embd norm: neo-bert.cpp/eurobert.cpp)
        x = layer_norm(x, params["token_embd_norm"],
                       params.get("token_embd_norm_bias"), eps)

    valid = (inputs.positions >= 0)  # [B, T] padding mask
    mask = valid[:, None, :] & valid[:, :, None]  # [B, T, T] bidirectional
    pre_norm = cfg.extra.get("pre_norm_encoder", False)

    def nrm(v, w, b):  # rms-norm encoders (neo-bert/eurobert) vs layernorm
        if cfg.use_rms_norm:
            return rms_norm(v, w, cfg.rms_eps).astype(jnp.float32)
        return layer_norm(v, w, b, eps)

    def act_fn(v):
        if cfg.act == "silu":
            return jax.nn.silu(v)
        return jax.nn.gelu(v, approximate=True)

    for il, lw in enumerate(params["layers"]):
        # modernbert pre-norm: h = norm(x) feeds attention (layer 0 has no
        # attn norm at all — embeddings are already normalized)
        h_in = x
        if pre_norm:
            h_in = (nrm(x, lw["attn_norm"], lw.get("attn_norm_bias"))
                    if "attn_norm" in lw else x)
        if "attn_qkv" in lw:
            qkv = matmul(h_in, lw["attn_qkv"], dtype=jnp.float32)
            if "attn_qkv_bias" in lw:
                qkv = qkv + lw["attn_qkv_bias"]
            q = qkv[..., : H * Dk]
            k = qkv[..., H * Dk : H * Dk + Hkv * Dk]
            v = qkv[..., H * Dk + Hkv * Dk :]
        else:
            q = matmul(h_in, lw["attn_q"], dtype=jnp.float32)
            k = matmul(h_in, lw["attn_k"], dtype=jnp.float32)
            v = matmul(h_in, lw["attn_v"], dtype=jnp.float32)
            if "attn_q_bias" in lw:
                q = q + lw["attn_q_bias"]
                k = k + lw["attn_k_bias"]
                v = v + lw["attn_v_bias"]
        if "attn_q_norm" in lw:
            # jina-bert-v2 optional full-width q/k LayerNorm
            # (jina-bert-v2.cpp attn_q_norm/attn_k_norm, shape n_embd)
            q = layer_norm(q, lw["attn_q_norm"], lw.get("attn_q_norm_bias"),
                           eps)
            k = layer_norm(k, lw["attn_k_norm"], lw.get("attn_k_norm_bias"),
                           eps)
        q = q.reshape(B, T, H, Dk)
        k = k.reshape(B, T, Hkv, Dk)
        v = v.reshape(B, T, Hkv, Dv)
        if cfg.rope_type != ROPE_TYPE_NONE:  # nomic-bert / jina-v3
            rp = _rope_params(cfg, il)
            q = apply_rope(q, inputs.positions, rp)
            k = apply_rope(k, inputs.positions, rp)
        g = H // Hkv
        if g > 1:
            k = jnp.repeat(k, g, axis=2)
            v = jnp.repeat(v, g, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) / Dk ** 0.5
        if cfg.alibi_bias > 0.0:
            # bidirectional ALiBi (jina-bert-v2): mask carries -|p0-p1| and
            # softmax adds slope_h * mask (llama-graph.cpp:440, soft_max_ext)
            from .transformer import alibi_slopes

            slopes = alibi_slopes(H, cfg.alibi_bias).reshape(1, H, 1, 1)
            delta = -jnp.abs(
                inputs.positions[:, None, :] - inputs.positions[:, :, None]
            ).astype(jnp.float32)
            scores = scores + slopes * delta[:, None]
        lmask = mask
        if cfg.sliding_window > 0 and cfg.is_swa_layer(il):
            # symmetric local window (reference LLAMA_SWA_TYPE_SYMMETRIC:
            # mask when |p1-p0| > n_swa/2)
            half = cfg.sliding_window // 2
            diff = inputs.positions[:, None, :] - inputs.positions[:, :, None]
            lmask = lmask & (jnp.abs(diff) <= half)
        scores = jnp.where(lmask[:, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, T, H * Dv)
        attn = matmul(attn, lw["attn_output"], dtype=jnp.float32)
        if "attn_output_bias" in lw:
            attn = attn + lw["attn_output_bias"]

        if pre_norm:
            x = x + attn
            h2 = nrm(x, lw["ffn_norm"], lw.get("ffn_norm_bias"))
            if "ffn_gate" in lw:  # eurobert: llama-style gated FFN
                h3 = act_fn(matmul(h2, lw["ffn_gate"], dtype=jnp.float32)) \
                    * matmul(h2, lw["ffn_up"], dtype=jnp.float32)
            else:  # fused gate|up halves (modernbert GEGLU / neo-bert
                # SWIGLU; load-time gate+up fusion also lands here)
                up = matmul(h2, lw.get("ffn_gateup", lw.get("ffn_up")),
                            dtype=jnp.float32)
                half = up.shape[-1] // 2
                h3 = act_fn(up[..., :half]) * up[..., half:]
            x = x + matmul(h3, lw["ffn_down"], dtype=jnp.float32)
            continue

        # post-norm: LN(x + attn)
        x_in = x  # layer input (jina-v2 attn_norm_2 re-adds it)
        x = layer_norm(x + attn, lw.get("attn_output_norm"),
                       lw.get("attn_output_norm_bias"), eps)
        if "attn_norm_2" in lw:
            # jina-v2 optional second LN: re-add the layer input first
            # (bert.cpp:168-171)
            x = layer_norm(x + x_in, lw["attn_norm_2"],
                           lw.get("attn_norm_2_bias"), eps)

        ffn_inp = x
        if "ffn_gateup" in lw:  # load-time fused gate|up (jina-v3 GLU)
            gu = matmul(x, lw["ffn_gateup"], dtype=jnp.float32)
            half_ = gu.shape[-1] // 2
            h = act_fn(gu[..., :half_]) * gu[..., half_:]
            y = matmul(h, lw["ffn_down"], dtype=jnp.float32)
            if "ffn_down_bias" in lw:
                y = y + lw["ffn_down_bias"]
            x = layer_norm(ffn_inp + y, lw.get("layer_output_norm"),
                           lw.get("layer_output_norm_bias"), eps)
            continue
        if "ffn_up_exps" in lw:
            # nomic-bert-moe: gelu experts without gate, softmax top-k;
            # bert.cpp:179-189 passes norm_w=false, so the selected softmax
            # weights are used RAW (no top-k renormalization)
            logits = matmul(x, lw["ffn_gate_inp"], dtype=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            topw, topi = jax.lax.top_k(probs, cfg.n_expert_used)
            if cfg.expert_weights_norm:
                topw = topw / jnp.clip(topw.sum(-1, keepdims=True),
                                       1e-9, None)
            y = jnp.zeros_like(x)
            for e in range(cfg.n_expert):
                w_e = jnp.sum(jnp.where(topi == e, topw, 0.0), -1)  # [B,T]
                he = jax.nn.gelu(
                    jnp.einsum("bte,fe->btf", x, lw["ffn_up_exps"][e]),
                    approximate=True)
                ye = jnp.einsum("btf,ef->bte", he, lw["ffn_down_exps"][e])
                y = y + ye * w_e[..., None]
            x = layer_norm(ffn_inp + y, lw.get("layer_output_norm"),
                           lw.get("layer_output_norm_bias"), eps)
            continue
        up = matmul(x, lw["ffn_up"], dtype=jnp.float32)
        if "ffn_up_bias" in lw:
            up = up + lw["ffn_up_bias"]
        if "ffn_gate" in lw:
            # gated-PAR variants: jina-v2 GEGLU (cfg.act gelu) and plain
            # nomic-bert SiLU-PAR (bert.cpp:209-213 final else branch)
            gate = matmul(x, lw["ffn_gate"], dtype=jnp.float32)
            h = act_fn(gate) * up
        elif cfg.n_ff and up.shape[-1] == 2 * cfg.n_ff:
            # jina-bert-v2 up-contains-gate GEGLU (bert.cpp:200
            # up_contains_gate: gelu(first half) * second half)
            h = jax.nn.gelu(up[..., : cfg.n_ff], approximate=True) \
                * up[..., cfg.n_ff:]
        else:
            h = jax.nn.gelu(up, approximate=True)
        y = matmul(h, lw["ffn_down"], dtype=jnp.float32)
        if "ffn_down_bias" in lw:
            y = y + lw["ffn_down_bias"]
        x = layer_norm(ffn_inp + y, lw.get("layer_output_norm"),
                       lw.get("layer_output_norm_bias"), eps)

    if pre_norm and "output_norm" in params:  # modernbert final norm
        x = nrm(x, params["output_norm"], params.get("output_norm_bias"))
    elif "enc_output_norm" in params:  # neo-bert enc.output_norm
        x = nrm(x, params["enc_output_norm"], None)
    x = x.reshape(B * T, -1)
    if output_rows is not None:
        x = x[output_rows]
    return (x, kv) if return_hidden else (x, kv)
