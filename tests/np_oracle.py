"""Transcribed f64 numpy forward oracle for architectures with no offline
HF implementation (VERDICT r2 item 6: promote structural arch tests to
numeric parity).

Every semantic detail here is transcribed from the REFERENCE C++ graph
builders, not from this repo's JAX model code, so a wrong norm order /
scale / router in the JAX path fails the comparison:

- shared helpers: src/llama-graph.cpp
    build_qkv           :1591   (fused wqkv split order q|k|v, biases)
    build_ffn           :1646   (PAR gate = act(x@gate) * (x@up); SWIGLU
                                 fused = silu(first half) * second half,
                                 ggml glu non-swapped convention)
    build_moe_ffn       :1914   (gating funcs, top-k, norm_w, w_scale,
                                 exp_probs_b selection bias, grovemoe
                                 sigmoid selection + chunk-id mapping)
    attention           :2565   (kq*scale + alibi-slope*mask softmax; grok
                                 tanh cap at :2574-2583)
    ALiBi slopes        : ggml/src/ggml-cpu/ops.cpp:5487-5508
    SWA mask            : src/llama-hparams.h:381 (q - k >= n_swa masked)
    swa pattern         : src/llama-hparams.cpp set_swa_pattern
- per-arch graphs: src/models/<arch>.cpp (cited at each spec below)

The oracle reads the tiny GGUF fixture directly (all-f32 tensors) and runs
plain-loop f64 numpy; it shares no code with llama_cpp_tpu.models.
"""

from __future__ import annotations

import numpy as np

from llama_cpp_tpu.gguf.reader import read_gguf


def load_f64(path):
    g = read_gguf(path)
    ws = {}
    for name, t in g.tensors.items():
        assert t.dtype.name == "F32", (name, t.dtype)
        ws[name] = (
            t.data.view(np.float32).reshape(t.shape).astype(np.float64)
        )
    return g.metadata, ws


# --- building blocks (llama-graph.cpp build_norm / ggml rope) -------------


def rms_norm(x, w=None, eps=1e-5, b=None):
    out = x / np.sqrt((x * x).mean(-1, keepdims=True) + eps)
    if w is not None:
        out = out * w
    if b is not None:
        out = out + b
    return out


def layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    out = (x - mu) / np.sqrt(var + eps)
    out = out * w
    if b is not None:
        out = out + b
    return out


def rope(x, pos, n_rot, mode, base=10000.0):
    """x [T, H, D]; rotate first n_rot dims. mode: "norm" = adjacent pairs
    (ggml_rope NORM), "neox" = split halves within n_rot (NEOX)."""
    if mode == "none":
        return x
    T, H, D = x.shape
    half = n_rot // 2
    inv = base ** (-np.arange(half, dtype=np.float64) * 2.0 / n_rot)
    th = np.asarray(pos, np.float64)[:, None] * inv[None, :]  # [T, half]
    cos, sin = np.cos(th)[:, None, :], np.sin(th)[:, None, :]
    out = x.copy()
    if mode == "norm":
        x0, x1 = x[..., 0:n_rot:2], x[..., 1:n_rot:2]
        out[..., 0:n_rot:2] = x0 * cos - x1 * sin
        out[..., 1:n_rot:2] = x0 * sin + x1 * cos
    else:  # neox
        x0, x1 = x[..., :half], x[..., half:n_rot]
        out[..., :half] = x0 * cos - x1 * sin
        out[..., half:n_rot] = x0 * sin + x1 * cos
    return out


def alibi_slopes(n_head, max_bias):
    # ggml/src/ggml-cpu/ops.cpp:5487-5508
    n_log2 = 1 << int(np.floor(np.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_log2)
    return np.array(
        [m0 ** (h + 1) if h < n_log2 else m1 ** (2 * (h - n_log2) + 1)
         for h in range(n_head)]
    )


def silu(x):
    return x / (1.0 + np.exp(-x))


def gelu(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def attention(q, k, v, *, scale, n_head_kv, causal=True, window=0,
              alibi=0.0, grok_cap=None):
    """q [T,H,D], k/v [T,Hkv,D]; GQA broadcast; returns [T, H*Dv].
    Transcribes llama-graph.cpp:2565-2612 (kq -> optional grok tanh cap ->
    soft_max_ext(kq, mask, scale, max_alibi_bias) -> @ v)."""
    T, H, D = q.shape
    G = H // n_head_kv
    # explicit per-head loop (keep it dumb and obviously correct)
    outs = []
    pos = np.arange(T)
    mask = np.zeros((T, T))
    if causal:
        mask[pos[:, None] < pos[None, :]] = -np.inf
    if window > 0:  # llama-hparams.h:390 masked when q - k >= n_swa
        mask[(pos[:, None] - pos[None, :]) >= window] = -np.inf
    slopes = alibi_slopes(H, alibi) if alibi > 0 else np.ones(H)
    abias = -np.abs(pos[:, None] - pos[None, :]) if alibi > 0 else np.zeros((T, T))
    for h in range(H):
        kh = k[:, h // G, :]
        vh = v[:, h // G, :]
        s = q[:, h, :] @ kh.T  # [T, T]
        if grok_cap is not None:  # grok.cpp via llama-graph.cpp:2574-2583
            out_scale, cap = grok_cap
            s = cap * np.tanh(s * (out_scale / cap))
        s = s * scale + slopes[h] * abias + mask
        p = softmax(np.where(np.isneginf(s), -1e30, s))
        outs.append(p @ vh)  # [T, Dv]
    return np.concatenate(outs, axis=-1)


def ffn(x, ws, b, act="silu", fused=False, bias=False, act_scale=None):
    """build_ffn llama-graph.cpp:1646. fused = single ffn_up holding
    gate|up halves (ggml_swiglu, non-swapped: gate first)."""
    A = {"silu": silu, "gelu": gelu, "relu": lambda v: np.maximum(v, 0.0),
         "relu2": lambda v: np.maximum(v, 0.0) ** 2}[act]
    if fused:
        gu = x @ ws[b + "ffn_up.weight"].T
        n = gu.shape[-1] // 2
        h = A(gu[..., :n]) * gu[..., n:]
    elif b + "ffn_gate.weight" in ws:
        up = x @ ws[b + "ffn_up.weight"].T
        if bias and b + "ffn_up.bias" in ws:
            up = up + ws[b + "ffn_up.bias"]
        g = x @ ws[b + "ffn_gate.weight"].T
        if bias and b + "ffn_gate.bias" in ws:
            g = g + ws[b + "ffn_gate.bias"]
        h = A(g) * up
    else:
        h = x @ ws[b + "ffn_up.weight"].T
        if bias and b + "ffn_up.bias" in ws:
            h = h + ws[b + "ffn_up.bias"]
        h = A(h)
    out = h @ ws[b + "ffn_down.weight"].T
    if bias and b + "ffn_down.bias" in ws:
        out = out + ws[b + "ffn_down.bias"]
    return out


def moe(x, ws, b, n_exp, n_used, *, act="silu", gating="softmax",
        norm_w=True, w_scale=0.0, probs_in=None, suffix="exps",
        grove_sel=False, grove_groups=0, sel_bias=None):
    """build_moe_ffn llama-graph.cpp:1914-2110 transcription. x [T, E]."""
    A = {"silu": silu, "gelu": gelu,
         "relu": lambda v: np.maximum(v, 0.0)}[act]
    logits = (x @ ws[b + "ffn_gate_inp.weight"].T
              if probs_in is None else probs_in)
    if gating == "softmax":
        probs = softmax(logits)
    elif gating == "sigmoid":
        probs = 1.0 / (1.0 + np.exp(-logits))
    else:
        raise ValueError(gating)
    sel_probs = probs
    if sel_bias is not None:  # exp_probs_b selection bias (DeepSeek V3)
        sel_probs = probs + sel_bias
    if grove_sel:  # GROVEMOE override: select on sigmoid(logits) (:1999)
        sel_probs = 1.0 / (1.0 + np.exp(-logits))
    T = x.shape[0]
    up_w = ws[b + f"ffn_up_{suffix}.weight"]      # [n_exp, ff, E]
    gate_w = ws.get(b + f"ffn_gate_{suffix}.weight")
    down_w = ws[b + f"ffn_down_{suffix}.weight"]  # [n_exp, E, ff]
    out = np.zeros_like(x)
    for t in range(T):
        ids = np.argsort(-sel_probs[t], kind="stable")[:n_used]
        if grove_groups:  # chunk-id mapping llama-graph.cpp:2036-2043
            eids = ids // grove_groups
        else:
            eids = ids
        w = probs[t][eids]
        if norm_w:
            w = w / max(w.sum(), 6.103515625e-5)
        if w_scale not in (0.0, 1.0):
            w = w * w_scale
        for j, e in enumerate(eids):
            h = A(gate_w[e] @ x[t]) * (up_w[e] @ x[t]) if gate_w is not None \
                else A(up_w[e] @ x[t])
            out[t] += w[j] * (down_w[e] @ h)
    return out


def qkv(x, ws, b, H, HKV, HD, HDv=None):
    """build_qkv llama-graph.cpp:1591: fused wqkv splits q|k|v."""
    HDv = HDv or HD
    T = x.shape[0]
    if b + "attn_qkv.weight" in ws:
        f = x @ ws[b + "attn_qkv.weight"].T
        if b + "attn_qkv.bias" in ws:
            f = f + ws[b + "attn_qkv.bias"]
        q = f[:, : H * HD]
        k = f[:, H * HD: H * HD + HKV * HD]
        v = f[:, H * HD + HKV * HD:]
    else:
        q = x @ ws[b + "attn_q.weight"].T
        k = x @ ws[b + "attn_k.weight"].T
        v = x @ ws[b + "attn_v.weight"].T
        if b + "attn_q.bias" in ws:
            q = q + ws[b + "attn_q.bias"]
            k = k + ws[b + "attn_k.bias"]
            v = v + ws[b + "attn_v.bias"]
    return (q.reshape(T, H, HD), k.reshape(T, HKV, HD),
            v.reshape(T, HKV, HDv))


# ---------------------------------------------------------------------------
# generic decoder forward driven by a per-arch spec dict (each spec cites the
# reference graph file it transcribes; knobs default to the llama shape)
# ---------------------------------------------------------------------------


def dense_forward(md, ws, tokens, spec):
    """-> logits [T, V] in f64. spec knobs (all optional):
    norm ("rms"|"ln"), rope ("neox"|"norm"|"none"), n_rot, qk_norm
    (None|"head"|"full"|"head_after_rope"), attn_scale, wo_bias, alibi,
    swa (window), is_swa (per-layer), use_rope (per-layer), ffn_act,
    ffn_fused, ffn_bias, moe (dict), post_norms, embd_scale, logit_scale,
    scale_res (minicpm), head_scale, eps."""
    arch = md["general.architecture"]
    P = arch + "."
    L = int(md[P + "block_count"])
    E = int(md[P + "embedding_length"])
    H = int(md[P + "attention.head_count"])
    HKV = int(md.get(P + "attention.head_count_kv", H))
    HD = E // H if not spec.get("head_dim") else spec["head_dim"]
    n_rot = spec.get("n_rot", int(md.get(P + "rope.dimension_count", HD)))
    eps = spec.get("eps", 1e-5)
    base = float(md.get(P + "rope.freq_base", 10000.0))
    T = len(tokens)
    pos = np.arange(T)

    def norm(x, wname, lvl=None):
        if spec.get("norm") == "ln":
            return layer_norm(x, ws[wname + ".weight"],
                              ws.get(wname + ".bias"), eps)
        return rms_norm(x, ws.get(wname + ".weight"), eps,
                        ws.get(wname + ".bias"))

    x = ws["token_embd.weight"][tokens] * spec.get("embd_scale", 1.0)
    if spec.get("pos_embd"):  # learned absolute positions (starcoder.cpp)
        x = x + ws["position_embd.weight"][pos]
    for il in range(L):
        b = f"blk.{il}."
        res = x
        h = norm(x, b + "attn_norm")
        q, k, v = qkv(h, ws, b, H, HKV, HD)
        if spec.get("qk_norm") == "full":
            # minimax-m2.cpp: norm over the full projected vector pre-reshape
            q = rms_norm(q.reshape(T, -1), ws[b + "attn_q_norm.weight"],
                         eps).reshape(T, H, HD)
            k = rms_norm(k.reshape(T, -1), ws[b + "attn_k_norm.weight"],
                         eps).reshape(T, HKV, HD)
        elif spec.get("qk_norm") == "head":
            q = rms_norm(q, ws[b + "attn_q_norm.weight"], eps)
            k = rms_norm(k, ws[b + "attn_k_norm.weight"], eps)
        use_rope = spec.get("use_rope", [True] * L)[il]
        if use_rope:
            q = rope(q, pos, n_rot, spec.get("rope", "neox"), base)
            k = rope(k, pos, n_rot, spec.get("rope", "neox"), base)
        if spec.get("qk_norm") == "head_after_rope":  # hunyuan-moe.cpp
            q = rms_norm(q, ws[b + "attn_q_norm.weight"], eps)
            k = rms_norm(k, ws[b + "attn_k_norm.weight"], eps)
        window = spec.get("swa", 0) if spec.get("is_swa", [True] * L)[il] else 0
        att = attention(q, k, v, scale=spec.get("attn_scale", HD ** -0.5),
                        n_head_kv=HKV, window=window,
                        causal=spec.get("causal", True),
                        alibi=spec.get("alibi", 0.0))
        att = att @ ws[b + "attn_output.weight"].T
        if b + "attn_output.bias" in ws:
            att = att + ws[b + "attn_output.bias"]
        if spec.get("post_norms"):  # plamo3.cpp / gemma-style
            att = norm(att, b + "attn_post_norm")
        if spec.get("scale_res"):
            att = att * spec["scale_res"]
        ffn_inp = res + att
        h = norm(ffn_inp, b + "ffn_norm")
        m = spec.get("moe")
        # dense-lead layers (bailingmoe2.cpp n_layer_dense_lead) carry a
        # plain FFN instead of the router
        if m and b + "ffn_gate_inp.weight" not in ws:
            m = None
        if m:
            probs_in = None
            if m.get("raw_router"):  # smallthinker.cpp: router on pre-norm x
                probs_in = x @ ws[b + "ffn_gate_inp.weight"].T
            sel_bias = ws.get(b + "exp_probs_b.bias")
            out = moe(h, ws, b, m["n_exp"], m["n_used"],
                      act=m.get("act", "silu"), gating=m.get("gating", "softmax"),
                      norm_w=m.get("norm_w", True),
                      w_scale=m.get("w_scale", 0.0), probs_in=probs_in,
                      sel_bias=sel_bias)
            if b + "ffn_up_shexp.weight" in ws:
                sh = silu(h @ ws[b + "ffn_gate_shexp.weight"].T) * (
                    h @ ws[b + "ffn_up_shexp.weight"].T)
                out = out + sh @ ws[b + "ffn_down_shexp.weight"].T
        else:
            out = ffn(h, ws, b, act=spec.get("ffn_act", "silu"),
                      fused=spec.get("ffn_fused", False),
                      bias=spec.get("ffn_bias", False))
        if spec.get("post_norms"):
            out = norm(out, b + "ffn_post_norm")
        if spec.get("scale_res"):
            out = out * spec["scale_res"]
        x = ffn_inp + out
    x = norm(x, spec.get("final_norm", "output_norm"))
    x = x * spec.get("head_scale", 1.0)
    head = ws.get("output.weight", ws["token_embd.weight"])
    logits = x @ head.T
    return logits * spec.get("logit_scale", 1.0)
