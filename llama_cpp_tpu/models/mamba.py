"""Mamba (selective SSM) forward pass.

Analog of reference src/models/mamba.cpp + llm_build_mamba_base::
build_mamba_layer (src/models/mamba-base.cpp) and the GGML_OP_SSM_SCAN /
GGML_OP_SSM_CONV kernels (ggml/src/ggml-cpu/ops.cpp ssm_scan: softplus(dt),
h' = exp(dt·A)·h + dt·B·x, y = C·h). TPU-first: the time recurrence is a
linear first-order scan, evaluated with jax.lax.associative_scan so prefill
parallelizes over the sequence (Mamba paper Annex D); decode (T=1) reduces to
a single fused state update.

Weight keys per layer (GGUF canonical names, reference src/llama-arch.cpp):
  attn_norm, ssm_in [2*d_inner, E], ssm_conv1d [d_inner, d_conv] (+_bias),
  ssm_x [dt_rank+2*d_state, d_inner], ssm_dt [d_inner, dt_rank] (+_bias),
  ssm_a [d_inner, d_state] (= -exp(A_log)), ssm_d [d_inner],
  ssm_out [E, d_inner]; optional ssm_dt_norm/ssm_b_norm/ssm_c_norm
  (FalconMamba dt_b_c_rms).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.basic import rms_norm
from ..ops.qtensor import embed_lookup, matmul
from ..runtime.memory import RecurrentState
from .config import ModelConfig
from .transformer import AttnInputs


def selective_scan(s0, x, dt, A, B, C):
    """First-order linear recurrence via associative scan.

    s0 [Bt, S, I] initial state; x, dt [Bt, T, I]; A [I, S];
    B, C [Bt, T, S]. -> (y [Bt, T, I], s_T [Bt, S, I]), all f32.
    """
    a = jnp.exp(dt[:, :, None, :] * A.T[None, None])  # [Bt, T, S, I]
    b = B[..., None] * (dt * x)[:, :, None, :]  # [Bt, T, S, I]
    # fold the initial state into the first step
    b = b.at[:, 0].add(a[:, 0] * s0)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    a_all, s_all = jax.lax.associative_scan(combine, (a, b), axis=1)
    y = jnp.einsum("bts,btsi->bti", C, s_all)
    return y, s_all[:, -1]


def _causal_conv(mem: RecurrentState, il: int, seq_idx, xs: jnp.ndarray,
                 lw, d_conv: int):
    """Depthwise causal conv over time with rolling window state
    (GGML_OP_SSM_CONV). xs [B, T, C] -> (silu(conv), new_state)."""
    B_, T = xs.shape[:2]
    conv0 = mem.conv[il][seq_idx].astype(jnp.float32)  # [B, dc-1, C]
    cx = jnp.concatenate([conv0, xs], axis=1)  # [B, dc-1+T, C]
    w = lw["ssm_conv1d"].astype(jnp.float32)  # [C, dc]
    xc = sum(w[:, j] * cx[:, j : j + T, :] for j in range(d_conv))
    if "ssm_conv1d_bias" in lw:
        xc = xc + lw["ssm_conv1d_bias"]
    return jax.nn.silu(xc), cx[:, T:, :]


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def gated_delta_layer(cfg, lw, h, mem, seq_idx, il: int):
    """Qwen3-Next gated DeltaNet mixer (reference src/models/qwen3next.cpp
    build_layer_attn_linear + delta-net-base.cpp; HF oracle
    torch_recurrent_gated_delta_rule). Matrix-valued recurrence
    S_t = S_{t-1}*exp(g_t) + beta_t k_t (v_t - k_t^T S_{t-1}*exp(g_t))
    run as a lax.scan over tokens -> (out, new_conv, S_T)."""
    ex = cfg.extra
    Dk = ex["ssm_d_state"]          # linear_key_head_dim
    Hk = ex["ssm_n_group"]          # linear_num_key_heads
    Hv = ex["ssm_dt_rank"]          # linear_num_value_heads
    d_inner = ex["ssm_d_inner"]     # Hv * Dv
    Dv = d_inner // Hv
    R = Hv // Hk
    key_dim = Hk * Dk
    d_conv = ex["ssm_d_conv"]
    B_, T = h.shape[:2]

    if "ssm_in" in lw:
        # legacy qkvz projection, HF per-k-head interleaved ordering
        # (modeling_qwen3_next.fix_query_key_value_ordering)
        qkvz = matmul(h, lw["ssm_in"]).astype(jnp.float32)
        qkvz = qkvz.reshape(B_, T, Hk, 2 * Dk + 2 * R * Dv)
        q, k, v, z = jnp.split(qkvz, [Dk, 2 * Dk, 2 * Dk + R * Dv], axis=-1)
        v = v.reshape(B_, T, Hv, Dv)
        z = z.reshape(B_, T, Hv, Dv)
    else:
        # optimized layout (qwen3next.cpp build_qkvz wqkv path / qwen35):
        # one flat [q|k|v] projection + a separate z gate projection
        qkv = matmul(h, lw["attn_qkv"]).astype(jnp.float32)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        q = q.reshape(B_, T, Hk, Dk)
        k = k.reshape(B_, T, Hk, Dk)
        v = v.reshape(B_, T, Hv, Dv)
        z = matmul(h, lw["attn_gate"]).astype(jnp.float32).reshape(
            B_, T, Hv, Dv)
    if "ssm_ba" in lw:
        ba = matmul(h, lw["ssm_ba"]).astype(jnp.float32)
        ba = ba.reshape(B_, T, Hk, 2 * R)
        b, a = jnp.split(ba, 2, axis=-1)
        b = b.reshape(B_, T, Hv)
        a = a.reshape(B_, T, Hv)
    else:  # qwen35: separate beta/alpha projections (qwen35.cpp ssm_beta)
        b = matmul(h, lw["ssm_beta"]).astype(jnp.float32)
        a = matmul(h, lw["ssm_alpha"]).astype(jnp.float32)

    # causal conv over [q;k;v] channels (silu activation)
    mixed = jnp.concatenate(
        [q.reshape(B_, T, key_dim), k.reshape(B_, T, key_dim),
         v.reshape(B_, T, d_inner)], axis=-1)
    xc, new_conv = _causal_conv(mem, il, seq_idx, mixed, lw, d_conv)
    q, k, v = jnp.split(xc, [key_dim, 2 * key_dim], axis=-1)
    q = q.reshape(B_, T, Hk, Dk)
    k = k.reshape(B_, T, Hk, Dk)
    v = v.reshape(B_, T, Hv, Dv)

    q = _l2norm(q) * (Dk ** -0.5)
    k = _l2norm(k)
    if R > 1:  # GQA: repeat k-heads across the value heads
        q = jnp.repeat(q, R, axis=2)
        k = jnp.repeat(k, R, axis=2)

    beta = jax.nn.sigmoid(b)                              # [B, T, Hv]
    g = lw["ssm_a"].astype(jnp.float32) * jax.nn.softplus(
        a + lw["ssm_dt_bias"].astype(jnp.float32))        # [B, T, Hv]

    s0 = mem.ssm[il][seq_idx].astype(jnp.float32)         # [B, Dk, Hv*Dv]
    s0 = s0.reshape(B_, Dk, Hv, Dv).transpose(0, 2, 1, 3)  # [B, Hv, Dk, Dv]

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t = inp  # [B,Hv,Dk] [B,Hv,Dk] [B,Hv,Dv] [B,Hv]
        S = S * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum("bhk,bhkv->bhv", k_t, S)
        delta = (v_t - kv_mem) * b_t[..., None]
        S = S + k_t[..., None] * delta[..., None, :]
        out_t = jnp.einsum("bhk,bhkv->bhv", q_t, S)
        return S, out_t

    xs = (q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
          v.transpose(1, 0, 2, 3), g.transpose(1, 0, 2),
          beta.transpose(1, 0, 2))
    s_T, outs = jax.lax.scan(step, s0, xs)
    out = outs.transpose(1, 0, 2, 3)                      # [B, T, Hv, Dv]

    # gated per-head rmsnorm (norm-then-gate, weight NOT zero-centered)
    from ..ops.basic import rms_norm
    out = rms_norm(out, lw["ssm_norm"], cfg.rms_eps) * jax.nn.silu(z)
    y = matmul(out.reshape(B_, T, d_inner).astype(h.dtype), lw["ssm_out"])
    s_T = s_T.transpose(0, 2, 1, 3).reshape(B_, Dk, Hv * Dv)
    return y, new_conv, s_T


def kda_layer(cfg, lw, h, mem, seq_idx, il: int):
    """Kimi Delta Attention mixer (reference src/models/kimi-linear.cpp KDA
    layer + delta-net-base.cpp build_delta_net_autoregressive; vLLM kda.py).
    Like the qwen3next gated delta rule but with PER-CHANNEL decay:
    S[i,j] *= exp(g[i]) with g = A_h * softplus(f_b(f_a(x)) + dt_bias), and
    separate q/k/v causal convs. Output: rmsnorm(o) * sigmoid(g_b(g_a(x)))
    through o_proj. -> (out, new_conv, s_T)."""
    ex = cfg.extra
    Dh = ex["kda_head_dim"]
    d_conv = ex["ssm_d_conv"]
    Hh = cfg.n_heads
    d_inner = Hh * Dh
    B_, T = h.shape[:2]

    conv0 = mem.conv[il][seq_idx].astype(jnp.float32)  # [B, dc-1, 3*d_inner]
    if "attn_qkv" in lw:  # load-time fused q|k|v projection
        fused = jnp.split(matmul(h, lw["attn_qkv"]).astype(jnp.float32),
                          3, axis=-1)
    else:
        fused = None
    branches = []
    new_conv = []
    for j, (wn, cn) in enumerate((("attn_q", "ssm_conv1d_q"),
                                  ("attn_k", "ssm_conv1d_k"),
                                  ("attn_v", "ssm_conv1d_v"))):
        xp = (fused[j] if fused is not None
              else matmul(h, lw[wn]).astype(jnp.float32))  # [B, T, d_inner]
        c0 = conv0[:, :, j * d_inner:(j + 1) * d_inner]
        cx = jnp.concatenate([c0, xp], axis=1)
        w = lw[cn].astype(jnp.float32).reshape(d_inner, d_conv)
        xc = sum(w[:, t] * cx[:, t: t + T, :] for t in range(d_conv))
        branches.append(jax.nn.silu(xc))
        new_conv.append(cx[:, T:, :])
    q, k, v = branches
    new_conv = jnp.concatenate(new_conv, axis=-1)

    eps = cfg.rms_eps
    q = _l2norm(q.reshape(B_, T, Hh, Dh), eps)
    k = _l2norm(k.reshape(B_, T, Hh, Dh), eps)
    v = v.reshape(B_, T, Hh, Dh)

    # per-channel decay g1 = A_h * softplus(f_b(f_a(x)) + dt_bias)
    g1 = matmul(matmul(h, lw["ssm_f_a"]).astype(jnp.float32), lw["ssm_f_b"])
    g1 = jax.nn.softplus(g1.astype(jnp.float32)
                         + lw["ssm_dt_bias"].astype(jnp.float32))
    A = lw["ssm_a"].astype(jnp.float32).reshape(-1)[:Hh]  # -exp(A_log) folded
    g1 = g1.reshape(B_, T, Hh, Dh) * A[None, None, :, None]
    beta = jax.nn.sigmoid(matmul(h, lw["ssm_beta"]).astype(jnp.float32))

    s0 = mem.ssm[il][seq_idx].astype(jnp.float32)  # [B, Dh, d_inner]
    s0 = s0.reshape(B_, Dh, Hh, Dh).transpose(0, 2, 1, 3)  # [B, H, i(k), j(v)]
    qs = q * (float(Dh) ** -0.5)

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t = inp  # [B,H,Dh] x4, [B,H]
        S = S * jnp.exp(g_t)[..., :, None]  # decay per k-channel i
        kv_mem = jnp.einsum("bhk,bhkv->bhv", k_t, S)
        delta = (v_t - kv_mem) * b_t[..., None]
        S = S + k_t[..., None] * delta[..., None, :]
        out_t = jnp.einsum("bhk,bhkv->bhv", q_t, S)
        return S, out_t

    xs = (qs.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
          v.transpose(1, 0, 2, 3), g1.transpose(1, 0, 2, 3),
          beta.transpose(1, 0, 2))
    s_T, outs = jax.lax.scan(step, s0, xs)
    out = outs.transpose(1, 0, 2, 3)  # [B, T, H, Dh]

    from ..ops.basic import rms_norm
    g2 = matmul(matmul(h, lw["ssm_g_a"]).astype(jnp.float32), lw["ssm_g_b"])
    g2 = g2.astype(jnp.float32).reshape(B_, T, Hh, Dh)
    out = rms_norm(out, lw["ssm_norm"], eps) * jax.nn.sigmoid(g2)
    y = matmul(out.reshape(B_, T, d_inner).astype(h.dtype), lw["attn_output"])
    s_T = s_T.transpose(0, 2, 1, 3).reshape(B_, Dh, d_inner)
    return y, new_conv, s_T


def lfm2_shortconv_layer(cfg, lw, h, mem, seq_idx, il: int):
    """LFM2 short convolution mixer (reference src/models/lfm2.cpp
    build_shortconv_block): in_proj -> (B, C, x); y = C * conv(B*x);
    rolling window state like the mamba conv (no activation, no gate).
    -> (out, new_conv, ssm_state_unchanged)."""
    E = cfg.n_embd
    L = cfg.extra["shortconv_l"]
    bcx = matmul(h, lw["shortconv_in"])  # [B, T, 3E]
    b, c, x = jnp.split(bcx.astype(jnp.float32), 3, axis=-1)
    bx = b * x
    B_, T = bx.shape[:2]
    conv0 = mem.conv[il][seq_idx].astype(jnp.float32)  # [B, L-1, E]
    cx = jnp.concatenate([conv0, bx], axis=1)
    w = lw["shortconv_conv"].astype(jnp.float32)  # [E, L]
    xc = sum(w[:, j] * cx[:, j : j + T, :] for j in range(L))
    y = c * xc
    out = matmul(y.astype(h.dtype), lw["shortconv_out"])
    return out, cx[:, T:, :], mem.ssm[il][seq_idx]


def mamba1_layer(cfg, lw, h, mem: RecurrentState, seq_idx, il: int):
    """Mamba-1 mixer (reference build_mamba_layer) -> (out, new_conv, s_T)."""
    ex = cfg.extra
    d_conv, d_state = ex["ssm_d_conv"], ex["ssm_d_state"]
    dt_rank, d_inner = ex["ssm_dt_rank"], ex["ssm_d_inner"]
    dt_b_c_rms = bool(ex.get("ssm_dt_b_c_rms", False))
    B_, T = h.shape[:2]

    xz = matmul(h, lw["ssm_in"], dtype=jnp.float32)  # [B, T, 2I]
    xs, z = xz[..., :d_inner], xz[..., d_inner:]
    xc, new_conv = _causal_conv(mem, il, seq_idx, xs, lw, d_conv)

    x_db = matmul(xc, lw["ssm_x"], dtype=jnp.float32)  # [B,T,R+2S]
    dt = x_db[..., :dt_rank]
    Bm = x_db[..., dt_rank : dt_rank + d_state]
    Cm = x_db[..., dt_rank + d_state :]
    if dt_b_c_rms or "ssm_dt_norm" in lw:
        dt = rms_norm(dt, lw.get("ssm_dt_norm"), cfg.rms_eps)
        Bm = rms_norm(Bm, lw.get("ssm_b_norm"), cfg.rms_eps)
        Cm = rms_norm(Cm, lw.get("ssm_c_norm"), cfg.rms_eps)
    dt = matmul(dt, lw["ssm_dt"], dtype=jnp.float32)
    if "ssm_dt_bias" in lw:
        dt = dt + lw["ssm_dt_bias"]
    dt = jax.nn.softplus(dt)  # [B, T, I]

    s0 = mem.ssm[il][seq_idx]  # [B, S, I] f32
    A = lw["ssm_a"].astype(jnp.float32)  # [I, S]
    y, s_last = selective_scan(s0, xc, dt, A, Bm, Cm)
    y = y + xc * lw["ssm_d"].astype(jnp.float32)
    y = y * jax.nn.silu(z)
    out = matmul(y, lw["ssm_out"], dtype=jnp.float32)  # [B, T, E]
    return out, new_conv, s_last


def mamba2_layer(cfg, lw, h, mem: RecurrentState, seq_idx, il: int):
    """Mamba-2 mixer (reference build_mamba2_layer, src/models/mamba-base.cpp
    :149): fused zxBCdt in-projection, conv over x|B|C channels, scalar
    per-head decay, grouped gated RMS norm."""
    ex = cfg.extra
    d_conv, d_state = ex["ssm_d_conv"], ex["ssm_d_state"]
    d_inner = ex["ssm_d_inner"]
    H, G = ex["ssm_dt_rank"], ex["ssm_n_group"]
    P = d_inner // H
    conv_dim = d_inner + 2 * G * d_state
    B_, T = h.shape[:2]

    zxbcdt = matmul(h, lw["ssm_in"], dtype=jnp.float32)  # [B,T, 2I+2GS+H]
    z = zxbcdt[..., :d_inner]
    xBC = zxbcdt[..., d_inner : d_inner + conv_dim]
    dt = zxbcdt[..., d_inner + conv_dim :]  # [B,T,H]

    xBC, new_conv = _causal_conv(mem, il, seq_idx, xBC, lw, d_conv)
    x = xBC[..., :d_inner].reshape(B_, T, H, P)
    Bm = xBC[..., d_inner : d_inner + G * d_state].reshape(B_, T, G, d_state)
    Cm = xBC[..., d_inner + G * d_state :].reshape(B_, T, G, d_state)

    if "ssm_dt_bias" in lw:
        dt = dt + lw["ssm_dt_bias"]
    dt = jax.nn.softplus(dt)  # [B,T,H]
    A = lw["ssm_a"].reshape(-1).astype(jnp.float32)  # [H] scalar decay/head
    a = jnp.exp(dt * A)  # [B,T,H]

    rep = H // G
    Bh = jnp.repeat(Bm, rep, axis=2)  # [B,T,H,S]
    Ch = jnp.repeat(Cm, rep, axis=2)
    b = (dt[..., None] * x)[..., None] * Bh[..., None, :]  # [B,T,H,P,S]

    # initial state: stored [B, S, I]; channel i = h*P + p
    s0 = mem.ssm[il][seq_idx]  # [B, S, I]
    s0 = s0.transpose(0, 2, 1).reshape(B_, H, P, d_state)
    a5 = a[..., None, None]
    b = b.at[:, 0].add(a5[:, 0] * s0)

    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, a2 * b1 + b2

    _, s_all = jax.lax.associative_scan(combine, (jnp.broadcast_to(a5, b.shape), b), axis=1)
    y = jnp.einsum("bths,bthps->bthp", Ch, s_all)
    y = y + x * lw["ssm_d"].reshape(-1)[None, None, :, None]
    y = y.reshape(B_, T, d_inner) * jax.nn.silu(z)

    # grouped gated RMS norm (ssm_norm weight [G, I/G])
    if "ssm_norm" in lw:
        yg = y.reshape(B_, T, G, d_inner // G)
        yg = rms_norm(yg, None, cfg.rms_eps) * lw["ssm_norm"].astype(jnp.float32)
        y = yg.reshape(B_, T, d_inner)

    out = matmul(y, lw["ssm_out"], dtype=jnp.float32)
    s_last = s_all[:, -1].reshape(B_, d_inner, d_state).transpose(0, 2, 1)
    return out, new_conv, s_last


def forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T] int32
    inputs: AttnInputs,
    mem: RecurrentState,
    output_rows: jnp.ndarray | None = None,
    return_hidden: bool = False,
    inputs_embeds: jnp.ndarray | None = None,
):
    """-> (logits [B*T or M, vocab] | hidden, updated RecurrentState).

    Tokens must be consecutive per row (split_equal ubatch contract,
    reference src/llama-batch.h:108); no padding rows."""
    ex = cfg.extra
    if inputs_embeds is not None:
        x = inputs_embeds.astype(jnp.float32)
    else:
        x = embed_lookup(params["token_embd"], tokens, dtype=jnp.float32)
    seq_idx = inputs.seq_idx

    layer_fn = mamba2_layer if ex.get("ssm_version", 1) == 2 else mamba1_layer
    for il, lw in enumerate(params["layers"]):
        h = rms_norm(x, lw["attn_norm"], cfg.rms_eps)
        out, new_conv, s_last = layer_fn(cfg, lw, h, mem, seq_idx, il)
        x = x + out
        mem = mem.put(il, seq_idx, new_conv, s_last)

    B, T, E = x.shape
    x = x.reshape(B * T, E)
    if output_rows is not None:
        x = x[output_rows]
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    if return_hidden:
        return x, mem
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = matmul(x, out_w, dtype=jnp.float32)
    return logits, mem


def plamo2_layer(cfg, lw, h, mem: RecurrentState, seq_idx, il: int):
    """PLaMo-2 mamba mixer (reference src/models/plamo2.cpp
    build_plamo2_mamba_layer): per-head-interleaved [z|x] in-projection,
    conv over x only, mamba1-style x_proj AFTER the conv producing
    rms-normed B/C/dt, per-head dt/A/D (mamba2-style scalar decay), and a
    swiglu_split(z, y) gate. No HF oracle offline — structural parity with
    the reference graph."""
    ex = cfg.extra
    d_conv, d_state = ex["ssm_d_conv"], ex["ssm_d_state"]
    d_inner = ex["ssm_d_inner"]
    H = ex["ssm_dt_rank"]  # plamo2 stores n_heads in time_step_rank
    P = d_inner // H
    B_, T = h.shape[:2]

    zx = matmul(h, lw["ssm_in"], dtype=jnp.float32)  # [B,T, 2*d_inner]
    zx = zx.reshape(B_, T, H, 2 * P)  # per-head [z_h | x_h] interleave
    z = zx[..., :P].reshape(B_, T, d_inner)
    x = zx[..., P:].reshape(B_, T, d_inner)

    x, new_conv = _causal_conv(mem, il, seq_idx, x, lw, d_conv)

    bcdt = matmul(x, lw["ssm_x"], dtype=jnp.float32)  # [B,T, 2S+dt_dim]
    Bm = rms_norm(bcdt[..., :d_state], lw.get("ssm_b_norm"), cfg.rms_eps)
    Cm = rms_norm(bcdt[..., d_state : 2 * d_state], lw.get("ssm_c_norm"),
                  cfg.rms_eps)
    dt = rms_norm(bcdt[..., 2 * d_state :], lw.get("ssm_dt_norm"), cfg.rms_eps)
    dt = matmul(dt, lw["ssm_dt"], dtype=jnp.float32)  # [B,T,H]
    if "ssm_dt_bias" in lw:
        dt = dt + lw["ssm_dt_bias"]
    dt = jax.nn.softplus(dt)
    A = lw["ssm_a"].reshape(-1).astype(jnp.float32)  # [H]
    a = jnp.exp(dt * A)

    xh = x.reshape(B_, T, H, P)
    b = (dt[..., None] * xh)[..., None] * Bm[:, :, None, None, :]  # [B,T,H,P,S]
    s0 = mem.ssm[il][seq_idx]  # [B, S, I]
    s0 = s0.transpose(0, 2, 1).reshape(B_, H, P, d_state)
    a5 = a[..., None, None]
    b = b.at[:, 0].add(a5[:, 0] * s0)

    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, a2 * b1 + b2

    _, s_all = jax.lax.associative_scan(
        combine, (jnp.broadcast_to(a5, b.shape), b), axis=1)
    y = jnp.einsum("bts,bthps->bthp", Cm.astype(jnp.float32), s_all)
    y = y + xh * lw["ssm_d"].reshape(-1)[None, None, :, None]
    y = y.reshape(B_, T, d_inner)
    y = jax.nn.silu(z) * y  # swiglu_split(z, y)
    out = matmul(y, lw["ssm_out"], dtype=jnp.float32)
    s_last = s_all[:, -1].reshape(B_, d_inner, d_state).transpose(0, 2, 1)
    return out, new_conv, s_last
