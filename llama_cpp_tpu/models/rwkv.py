"""RWKV6 forward pass (time-mix + channel-mix with token-shift state).

Analog of reference src/models/rwkv6-base.cpp (build_rwkv6_time_mix /
build_rwkv6_channel_mix) and the GGML_OP_RWKV_WKV6 kernel
(ggml/src/ggml-cpu/ops.cpp:10253):
    y_t[j]   = sum_i r_t[i] * (u[i] * k_t[i] * v_t[j] + S_{t-1}[i,j])
    S_t[i,j] = w_t[i] * S_{t-1}[i,j] + k_t[i] * v_t[j]
evaluated with an associative scan over T (per-head diagonal decay), so
prefill parallelizes; token-shift states live in the RecurrentState conv
window (slot 0 = time-mix shift, slot 1 = channel-mix shift) and the wkv
matrices in its ssm plane [head_size, n_embd].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.basic import layer_norm, rms_norm
from ..ops.qtensor import embed_lookup, matmul
from ..runtime.memory import RecurrentState
from .config import ModelConfig
from .transformer import AttnInputs


def wkv6_scan(s0, r, k, v, w, u):
    """s0 [B,H,i,j]; r,k,v,w [B,T,H,hs]; u [H,hs] -> (y [B,T,H,hs], s_T)."""
    kv = k[..., :, None] * v[..., None, :]  # [B,T,H,i,j]
    a = w[..., :, None]  # decay along i, broadcast over j
    b = kv

    def combine(l, rr):
        a1, b1 = l
        a2, b2 = rr
        return a1 * a2, a2 * b1 + b2

    a_b = jnp.broadcast_to(a, b.shape)
    _, s_inc = jax.lax.associative_scan(combine, (a_b, b), axis=1)
    # state BEFORE each token: prepend s0, drop last; add initial decay term
    # s_inc has no s0 contribution -> full S_{t-1} = s_inc[t-1] + (prod_{<=t-1} a) * s0
    a_cum = jnp.cumprod(a_b, axis=1)
    s_all = s_inc + a_cum * s0[:, None]
    s_prev = jnp.concatenate([s0[:, None], s_all[:, :-1]], axis=1)
    y = jnp.einsum("bthi,bthij->bthj", r, u[None, None, :, :, None] * kv + s_prev)
    return y, s_all[:, -1]


def gla_scan(s0, r, k, v, w, scale):
    """Gated linear attention (reference ggml_compute_forward_gla_f32,
    ggml/src/ggml-cpu/ops.cpp:10595-10645): S_t = w_t[i]*S_{t-1} + k_t[i]v_t[j],
    y_t[j] = scale * sum_i r_t[i] S_t[i,j] — wkv6 without the u bonus, read
    POST-update. Used by the qrwkv hybrids (rwkv6qwen2)."""
    kv = k[..., :, None] * v[..., None, :]  # [B,T,H,i,j]
    a = w[..., :, None]

    def combine(l, rr):
        a1, b1 = l
        a2, b2 = rr
        return a1 * a2, a2 * b1 + b2

    a_b = jnp.broadcast_to(a, kv.shape)
    _, s_inc = jax.lax.associative_scan(combine, (a_b, kv), axis=1)
    a_cum = jnp.cumprod(a_b, axis=1)
    s_all = s_inc + a_cum * s0[:, None]  # S_t (post-update)
    y = jnp.einsum("bthi,bthij->bthj", r, s_all) * scale
    return y, s_all[:, -1]


def wkv7_scan(s0, r, w, k, v, a, b):
    """RWKV-7 wkv recurrence (reference ggml_compute_forward_rwkv_wkv7_f32,
    ggml/src/ggml-cpu/ops.cpp:11234): per head with state S[i, j]
      sa_i = sum_j a_j S[i,j];  S[i,j] = S[i,j] w_j + v_i k_j + sa_i b_j
      out_i = sum_j S[i,j] r_j
    inputs [B,T,H,hs]; s0 [B,H,i,j] -> (out [B,T,H,hs], s_T)."""

    def step(S, inp):
        r_t, w_t, k_t, v_t, a_t, b_t = inp
        sa = jnp.einsum("bhj,bhij->bhi", a_t, S)
        S = (S * w_t[:, :, None, :] + v_t[..., None] * k_t[:, :, None, :]
             + sa[..., None] * b_t[:, :, None, :])
        out = jnp.einsum("bhj,bhij->bhi", r_t, S)
        return S, out

    xs = tuple(t.transpose(1, 0, 2, 3) for t in (r, w, k, v, a, b))
    sT, outs = jax.lax.scan(step, s0.astype(jnp.float32), xs)
    return outs.transpose(1, 0, 2, 3), sT


def _l2norm_head(x, eps):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def time_mix7(cfg, lw, x, shift, s0, v_first):
    """RWKV-7 time mix (reference src/models/rwkv7-base.cpp
    build_rwkv7_time_mix) -> (out, new_shift, s_T, v_first)."""
    B, T, E = x.shape
    hs = cfg.extra["wkv_head_size"]
    H = E // hs

    x_prev = jnp.concatenate([shift[:, None], x[:, :-1]], axis=1)
    sx = x_prev - x
    has_g = "time_mix_g1" in lw
    lf = lw["time_mix_lerp_fused"].reshape(-1, E)  # [6 or 5, E]: r,w,k,v,a,g
    xr, xw, xk, xv, xa = (x + sx * lf[i] for i in range(5))
    xg = x + sx * lf[5] if has_g else None

    r = matmul(xr, lw["time_mix_receptance"], dtype=jnp.float32)
    w = matmul(jnp.tanh(matmul(xw, lw["time_mix_w1"], dtype=jnp.float32)),
               lw["time_mix_w2"], dtype=jnp.float32)
    w = w + lw["time_mix_w0"].reshape(1, 1, E)
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(w))  # e^(-e^-0.5 * sig) in [~0.55, 1]

    k = matmul(xk, lw["time_mix_key"], dtype=jnp.float32)
    v = matmul(xv, lw["time_mix_value"], dtype=jnp.float32)
    if v_first is None:
        v_first = v
    else:
        vmix = jax.nn.sigmoid(
            matmul(matmul(xv, lw["time_mix_v1"], dtype=jnp.float32),
                   lw["time_mix_v2"], dtype=jnp.float32)
            + lw["time_mix_v0"].reshape(1, 1, E))
        v = v + (v_first - v) * vmix
    a = jax.nn.sigmoid(
        matmul(matmul(xa, lw["time_mix_a1"], dtype=jnp.float32),
               lw["time_mix_a2"], dtype=jnp.float32)
        + lw["time_mix_a0"].reshape(1, 1, E))
    g = None
    if has_g:
        g = matmul(jax.nn.sigmoid(matmul(xg, lw["time_mix_g1"], dtype=jnp.float32)),
                   lw["time_mix_g2"], dtype=jnp.float32)

    kk = (k * lw["time_mix_k_k"]).reshape(B, T, H, hs)
    kk = _l2norm_head(kk, 1e-12)
    ka = k * lw["time_mix_k_a"]
    k = k + a * ka - ka

    rh = r.reshape(B, T, H, hs)
    wh = w.reshape(B, T, H, hs)
    kh = k.reshape(B, T, H, hs)
    vh = v.reshape(B, T, H, hs)
    ah = a.reshape(B, T, H, hs)

    s0h = s0.reshape(B, hs, H, hs).transpose(0, 2, 1, 3)  # [B,H,i,j]
    y, sT = wkv7_scan(s0h, rh, wh, kh, vh, -kk, kk * ah)

    if "time_mix_ln" in lw:
        yf = y.astype(jnp.float32)
        mu = yf.mean(-1, keepdims=True)
        var = jnp.var(yf, axis=-1, keepdims=True)
        yn = (yf - mu) * jax.lax.rsqrt(var + 64e-5)
        yn = yn.reshape(B, T, E)
        yn = yn * lw["time_mix_ln"] + lw["time_mix_ln_bias"]
    else:  # arwkv7: no group-norm tail (rwkv7-base.cpp:116-126 else branch)
        yn = y.astype(jnp.float32).reshape(B, T, E)

    # bonus: per-head (r . k . r_k) scalar re-injects v
    rk = jnp.sum(kh * rh * lw["time_mix_r_k"].reshape(H, hs), axis=-1,
                 keepdims=True)  # [B,T,H,1]
    yn = yn + (vh * rk).reshape(B, T, E)
    if g is not None:
        yn = yn * g
    out = matmul(yn, lw["time_mix_output"], dtype=jnp.float32)
    sT_flat = sT.transpose(0, 2, 1, 3).reshape(B, hs, E)
    return out, x[:, -1], sT_flat, v_first


def _lerp_mix(cur, sx, delta, lerp):
    return cur + sx * (delta + lerp)


def time_mix(cfg, lw, x, shift, s0):
    """x [B,T,E] (post attn_norm); shift [B,E]; s0 [B,hs,E] wkv state.
    -> (out [B,T,E], new_shift [B,E], s_T)."""
    B, T, E = x.shape
    hs = cfg.extra["wkv_head_size"]
    H = E // hs

    x_prev = jnp.concatenate([shift[:, None], x[:, :-1]], axis=1)
    sx = x_prev - x

    xxx = x + sx * lw["time_mix_lerp_x"].reshape(1, 1, E)
    r5 = jnp.tanh(matmul(xxx, lw["time_mix_w1"], dtype=jnp.float32))  # [B,T,5r]
    rdim = r5.shape[-1] // 5
    r5 = r5.reshape(B, T, 5, rdim)
    w2 = lw["time_mix_w2"].astype(jnp.float32)  # [5, E, r]
    deltas = jnp.einsum("btfr,fer->btfe", r5, w2)  # [B,T,5,E]

    if "time_mix_lerp_fused" in lw:
        lf = lw["time_mix_lerp_fused"].reshape(5, E)  # [5,1,1,E] -> [5,E]
        mixed = [x + sx * (deltas[:, :, i] + lf[i]) for i in range(5)]
    else:
        names = ("time_mix_lerp_w", "time_mix_lerp_k", "time_mix_lerp_v",
                 "time_mix_lerp_r", "time_mix_lerp_g")
        mixed = [x + sx * (deltas[:, :, i] + lw[n].reshape(1, 1, E))
                 for i, n in enumerate(names)]
    xw, xk, xv, xr, xg = mixed

    # qrwkv variant (rwkv6qwen2.cpp via rwkv6-base.cpp is_qrwkv branches):
    # no bonus `u`, sigmoid gate, GQA-repeated k/v, k*(1-w), gated linear
    # attention with head_size^-0.5 scale, and no group-norm tail
    qrwkv = "time_mix_first" not in lw

    r = matmul(xr, lw["time_mix_receptance"], dtype=jnp.float32)
    k = matmul(xk, lw["time_mix_key"], dtype=jnp.float32)
    v = matmul(xv, lw["time_mix_value"], dtype=jnp.float32)
    if "time_mix_receptance_bias" in lw:
        r = r + lw["time_mix_receptance_bias"].astype(jnp.float32)
    if "time_mix_key_bias" in lw:
        k = k + lw["time_mix_key_bias"].astype(jnp.float32)
    if "time_mix_value_bias" in lw:
        v = v + lw["time_mix_value_bias"].astype(jnp.float32)
    gate = matmul(xg, lw["time_mix_gate"], dtype=jnp.float32)
    g = jax.nn.sigmoid(gate) if qrwkv else jax.nn.silu(gate)

    w = matmul(jnp.tanh(matmul(xw, lw["time_mix_decay_w1"], dtype=jnp.float32)),
               lw["time_mix_decay_w2"], dtype=jnp.float32)
    w = w + lw["time_mix_decay"].reshape(1, 1, E)
    w = jnp.exp(-jnp.exp(w.astype(jnp.float32)))

    if k.shape[-1] != E:  # GQA kv heads: repeat each group (rwkv6-base:112)
        n_kv = k.shape[-1] // hs
        rep = H // n_kv
        k = jnp.repeat(k.reshape(B, T, n_kv, 1, hs), rep, axis=3).reshape(B, T, E)
        v = jnp.repeat(v.reshape(B, T, n_kv, 1, hs), rep, axis=3).reshape(B, T, E)
    if qrwkv:
        k = k - k * w  # k * (1 - w)

    rh = r.reshape(B, T, H, hs)
    kh = k.reshape(B, T, H, hs)
    vh = v.reshape(B, T, H, hs)
    wh = w.reshape(B, T, H, hs)

    # state [B, hs(i), E] -> [B, H, i, j]
    s0h = s0.reshape(B, hs, H, hs).transpose(0, 2, 1, 3)
    if qrwkv:
        y, sT = gla_scan(s0h, rh, kh, vh, wh, float(hs) ** -0.5)
        yn = y.astype(jnp.float32).reshape(B, T, E)
    else:
        u = lw["time_mix_first"].astype(jnp.float32)  # [H, hs]
        y, sT = wkv6_scan(s0h, rh, kh, vh, wh, u)  # y [B,T,H,hs(j)]
        # per-head LayerNorm (ggml_norm eps 64e-5, no weight) then affine ln
        yf = y.astype(jnp.float32)
        mu = yf.mean(-1, keepdims=True)
        var = jnp.var(yf, axis=-1, keepdims=True)
        yn = (yf - mu) * jax.lax.rsqrt(var + 64e-5)
        yn = yn.reshape(B, T, E)
        yn = yn * lw["time_mix_ln"] + lw["time_mix_ln_bias"]

    out = matmul(yn * g, lw["time_mix_output"], dtype=jnp.float32)
    sT_flat = sT.transpose(0, 2, 1, 3).reshape(B, hs, E)
    return out, x[:, -1], sT_flat


def channel_mix(cfg, lw, x, shift):
    """-> (out, new_shift). reference build_rwkv6_channel_mix."""
    x_prev = jnp.concatenate([shift[:, None], x[:, :-1]], axis=1)
    sx = x_prev - x
    E = x.shape[-1]
    xk = x + sx * lw["channel_mix_lerp_k"].reshape(1, 1, E)
    k = jnp.square(jax.nn.relu(matmul(xk, lw["channel_mix_key"], dtype=jnp.float32)))
    out = matmul(k, lw["channel_mix_value"], dtype=jnp.float32)
    if "channel_mix_receptance" in lw:  # rwkv6 gate; rwkv7 drops it
        xr = x + sx * lw["channel_mix_lerp_r"].reshape(1, 1, E)
        out = out * jax.nn.sigmoid(
            matmul(xr, lw["channel_mix_receptance"], dtype=jnp.float32))
    return out, x[:, -1]


def forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    inputs: AttnInputs,
    mem: RecurrentState,
    output_rows: jnp.ndarray | None = None,
    return_hidden: bool = False,
    inputs_embeds: jnp.ndarray | None = None,
):
    """RWKV6/RWKV7 (reference src/models/rwkv6.cpp, rwkv7.cpp) and the
    qwen2-FFN hybrids (rwkv6qwen2.cpp, arwkv7.cpp: rms norms, silu-GLU FFN
    instead of channel mix, single token-shift stream)."""
    seq_idx = inputs.seq_idx
    hybrid = bool(cfg.extra.get("rwkv_hybrid"))
    if inputs_embeds is not None:
        x = inputs_embeds.astype(jnp.float32)
    else:
        x = embed_lookup(params["token_embd"], tokens, dtype=jnp.float32)
    if "token_embd_norm" in params:
        x = layer_norm(x, params.get("token_embd_norm"),
                       params.get("token_embd_norm_bias"), cfg.norm_eps)
    rescale = int(cfg.extra.get("rescale_every", 0))

    def _norm(v, w, b):
        if cfg.use_rms_norm:
            return rms_norm(v, w, cfg.rms_eps)
        return layer_norm(v, w, b, cfg.norm_eps)

    v_first = None
    for il, lw in enumerate(params["layers"]):
        shifts = mem.conv[il][seq_idx].astype(jnp.float32)  # [B, 2, E]
        att_norm = _norm(x, lw.get("attn_norm"), lw.get("attn_norm_bias"))
        s0 = mem.ssm[il][seq_idx]  # [B, hs, E]
        if "time_mix_w0" in lw:  # rwkv7 time mix
            att, att_shift, sT, v_first = time_mix7(
                cfg, lw, att_norm, shifts[:, 0], s0, v_first)
        else:
            att, att_shift, sT = time_mix(cfg, lw, att_norm, shifts[:, 0], s0)
        x = x + att

        if hybrid:  # qwen2-style gated FFN on ffn_norm (rwkv6qwen2.cpp:133)
            from .transformer import ffn_block

            h = _norm(x, lw.get("ffn_norm"), lw.get("ffn_norm_bias"))
            x = x + ffn_block(cfg, lw, h, il).astype(x.dtype)
            ffn_shift = att_shift  # single token-shift stream
        else:
            ffn_norm = layer_norm(x, lw.get("attn_norm_2"),
                                  lw.get("attn_norm_2_bias"), cfg.norm_eps)
            ffn, ffn_shift = channel_mix(cfg, lw, ffn_norm, shifts[:, 1])
            x = x + ffn
        if rescale and (il + 1) % rescale == 0:
            x = x * 0.5

        new_shift = jnp.stack([att_shift, ffn_shift], axis=1)  # [B, 2, E]
        mem = mem.put(il, seq_idx, new_shift, sT)

    B, T, E = x.shape
    x = x.reshape(B * T, E)
    if output_rows is not None:
        x = x[output_rows]
    x = _norm(x, params.get("output_norm"), params.get("output_norm_bias"))
    if return_hidden:
        return x, mem
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = matmul(x, out_w, dtype=jnp.float32)
    return logits, mem
