"""T5 encoder-decoder family (flan-t5 / mt5 / t5encoder).

TPU re-design of the reference's T5 graphs (src/models/t5.cpp: decoder with
self-attn + cross-attn over `build_inp_cross_embd`, encoder with bidirectional
relative-position buckets; bucket math `llama_relative_position_bucket`,
src/llama-graph.cpp:3729). Attention score scale is 1.0 (T5 folds it into the
weights) and positions enter through a learned relative bucket bias instead of
rope, so the decoder reuses the slot-table KVCache with an additive [H, T, S]
bias derived from (slot pos, row pos) — fully static shapes under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.basic import rms_norm
from ..ops.qtensor import embed_lookup, matmul
from .config import ModelConfig
from .transformer import ACTIVATIONS, AttnInputs, _tap


def relative_bucket(rel: jnp.ndarray, n_buckets: int, bidirectional: bool):
    """HF T5 bucket function (rel = k_pos - q_pos), vectorized.

    Mirrors llama_relative_position_bucket (reference llama-graph.cpp:3729)
    with the HF sign convention the oracle uses; max_distance fixed at 128.
    """
    max_distance = 128
    nb = n_buckets // 2 if bidirectional else n_buckets
    if bidirectional:
        big = (rel > 0).astype(jnp.int32) * nb
        rel = jnp.abs(rel)
    else:
        big = jnp.zeros_like(rel)
        rel = jnp.maximum(-rel, 0)
    max_exact = nb // 2
    relf = jnp.maximum(rel, 1).astype(jnp.float32)
    large = max_exact + (
        jnp.log(relf / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return big + jnp.where(rel < max_exact, rel, large)


def _pos_bias(rel_b, q_pos, k_pos, n_buckets: int, bidirectional: bool):
    """rel_b [n_buckets, H] -> additive bias [B, H, Tq, Sk]."""
    rel = k_pos[:, None, :] - q_pos[:, :, None]  # [B, Tq, Sk]
    bucket = relative_bucket(rel, n_buckets, bidirectional)
    table = rel_b.astype(jnp.float32)  # loader keeps rel_b dense (norm-like)
    bias = jnp.take(table, bucket, axis=0)  # [B, Tq, Sk, H]
    return bias.transpose(0, 3, 1, 2)


def _attn(q, k, v, mask, bias, H, Dk, Dv):
    """einsum attention, scale 1.0, additive bias; q [B,T,H*Dk]."""
    B, T = q.shape[:2]
    S = k.shape[2] if k.ndim == 4 else k.shape[1]
    qh = q.reshape(B, T, H, Dk).astype(jnp.float32)
    scores = jnp.einsum("bthd,bhsd->bhts", qh, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    scores = jnp.where(mask[:, None] if mask.ndim == 3 else mask,
                       scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bthd", p, v.astype(jnp.float32))
    return out.reshape(B, T, H * Dv)


def _ffn(cfg: ModelConfig, lw, x):
    # gated (flan: gelu(wi_0) * wi_1) vs sequential relu (t5: relu(wi))
    if "ffn_gateup" in lw:  # load-time fused projection
        gu = matmul(x, lw["ffn_gateup"])
        g, u = jnp.split(gu, 2, axis=-1)
        h = ACTIVATIONS["gelu"](g) * u
    elif "ffn_gate" in lw:
        h = ACTIVATIONS["gelu"](matmul(x, lw["ffn_gate"])) * matmul(x, lw["ffn_up"])
    else:
        h = ACTIVATIONS["relu"](matmul(x, lw["ffn_up"]))
    return matmul(h, lw["ffn_down"])


def _qkv(lw, h, H, Dk, Dv):
    if "attn_qkv" in lw:  # load-time fused projection (same input -> valid)
        qkv = matmul(h, lw["attn_qkv"])
        return jnp.split(qkv, [H * Dk, H * Dk + H * Dk], axis=-1)
    return matmul(h, lw["attn_q"]), matmul(h, lw["attn_k"]), matmul(h, lw["attn_v"])


def t5_encode(params, cfg: ModelConfig, tokens: jnp.ndarray,
              valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Encoder stack -> final normed hidden states [B, T, d]
    (reference t5encoder graph / t5 enc half). `valid` [B, T] masks padding
    keys (pad queries produce garbage rows the caller drops)."""
    ex = cfg.extra
    n_bkts = ex.get("rel_buckets", 32)
    H, Dk, Dv = cfg.n_heads, cfg.head_dim_k, cfg.head_dim_v
    x = embed_lookup(params["token_embd"], tokens, dtype=cfg.compute_dtype
                     or jnp.float32)
    B, T = tokens.shape
    pos = jnp.arange(T, dtype=jnp.int32)[None].repeat(B, 0)
    mask = (jnp.ones((B, T, T), bool) if valid is None
            else jnp.broadcast_to(valid[:, None, :], (B, T, T)))
    layers = params["enc_layers"]
    rel0 = layers[0].get("attn_rel_b")
    for il, lw in enumerate(layers):
        h = rms_norm(x, lw["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv(lw, h, H, Dk, Dv)
        k = k.reshape(B, T, H, Dk).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, Dv).transpose(0, 2, 1, 3)
        bias = _pos_bias(lw.get("attn_rel_b", rel0), pos, pos, n_bkts, True)
        attn = _attn(q, k, v, mask, bias, H, Dk, Dv)
        x = x + matmul(attn.astype(x.dtype), lw["attn_output"])
        h = rms_norm(x, lw["ffn_norm"], cfg.rms_eps)
        x = x + _ffn(cfg, lw, h).astype(x.dtype)
    return rms_norm(x, params["enc_output_norm"], cfg.rms_eps)


def t5_forward(
    params,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    inputs: AttnInputs,
    kv,  # KVCache over decoder self-attn layers
    output_rows=None,
    cross: jnp.ndarray | None = None,  # [B, Ne, d] encoder output
    cross_pos: jnp.ndarray | None = None,  # [B, Ne] (-1 = pad)
    return_hidden: bool = False,
):
    """Decoder step (reference src/models/t5.cpp decoder graph)."""
    ex = cfg.extra
    n_bkts = ex.get("rel_buckets", 32)
    H, Dk, Dv = cfg.n_heads, cfg.head_dim_k, cfg.head_dim_v
    B, T = tokens.shape
    x = embed_lookup(params["token_embd"], tokens, dtype=cfg.compute_dtype
                     or jnp.float32)
    layers = params["layers"]
    rel0 = layers[0].get("attn_rel_b")
    Ne = cross.shape[1]
    cmask = (cross_pos >= 0)[:, None, :] if cross_pos is not None else jnp.ones(
        (B, 1, Ne), bool)

    for il, lw in enumerate(layers):
        # self-attention over the KV cache
        h = rms_norm(x, lw["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv(lw, h, H, Dk, Dv)
        k = k.reshape(B * T, H, Dk)
        v = v.reshape(B * T, H, Dv)
        seq_flat = jnp.repeat(inputs.seq_idx, T)
        kv = kv.write_layer(il, seq_flat, inputs.positions.reshape(-1),
                            k, v, contiguous=B == 1 and T > 1)
        k_all, v_all = kv.read(il, dtype=jnp.float32)
        k_seq = k_all[inputs.seq_idx]  # [B, H, S, Dk]
        v_seq = v_all[inputs.seq_idx]
        slot_pos = kv.pos[inputs.seq_idx]  # [B, S]
        valid = slot_pos >= 0
        causal = slot_pos[:, None, :] <= inputs.positions[:, :, None]
        mask = valid[:, None, :] & causal  # [B, T, S]
        bias = _pos_bias(lw.get("attn_rel_b", rel0),
                         inputs.positions, slot_pos, n_bkts, False)
        attn = _attn(q, k_seq, v_seq, mask, bias, H, Dk, Dv)
        x = x + matmul(attn.astype(x.dtype), lw["attn_output"])

        # cross-attention over the encoder output (no position bias in HF)
        h = rms_norm(x, lw["cross_attn_norm"], cfg.rms_eps)
        q = matmul(h, lw["cross_attn_q"])
        ck = matmul(cross, lw["cross_attn_k"]).reshape(B, Ne, H, Dk).transpose(0, 2, 1, 3)
        cv = matmul(cross, lw["cross_attn_v"]).reshape(B, Ne, H, Dv).transpose(0, 2, 1, 3)
        attn = _attn(q, ck, cv, cmask, None, H, Dk, Dv)
        x = x + matmul(attn.astype(x.dtype), lw["cross_attn_output"])

        h = rms_norm(x, lw["ffn_norm"], cfg.rms_eps)
        x = x + _ffn(cfg, lw, h).astype(x.dtype)
        _tap(il, "l_out", x)

    x = x.reshape(B * T, -1)
    if output_rows is not None:
        x = x[output_rows]
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    if return_hidden:
        return x, kv
    out_w = params.get("output", params["token_embd"])
    logits = matmul(x, out_w, dtype=jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    return logits, kv
