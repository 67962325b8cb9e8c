"""Gemma 3n text graph: AltUp multi-stream residuals, LAUREL low-rank
residual augmentation, per-layer token embeddings, activation sparsity, and
cross-layer KV sharing.

Reference: src/models/gemma3n.cpp (graph), llama-model.cpp reuse callback
(layers >= n_layer_kv_from_start attend over the last owned layer of the
same SWA class).  Numeric oracle: transformers Gemma3nForCausalLM.

TPU notes: the n_altup residual streams are kept as a single stacked
[A, B, T, E] tensor so stream-mixing (altup predict/correct) is one einsum
on the MXU; attention/FFN reuse the shared transformer blocks (flash
kernel, quantized planes, paged/iSWA caches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import ACTIVATIONS, rms_norm
from ..ops.qtensor import QuantTensor, embed_lookup, matmul
from .config import ModelConfig
from .transformer import AttnInputs, _tap, attention_block, norm, softcap


def _rms_mag(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(mean(x^2, -1)) — HF target/new magnitude (no epsilon)."""
    return jnp.sqrt(jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                             keepdims=True))


def _mag_scale(h: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Rescale h to the target rms magnitude (modeling_gemma3n.py:1655-1663:
    new_magnitude clamped at 1e-5 before the sqrt)."""
    new = jnp.sqrt(jnp.maximum(
        jnp.mean(jnp.square(h.astype(jnp.float32)), axis=-1, keepdims=True),
        1e-5))
    return (h.astype(jnp.float32) * target / new).astype(h.dtype)


def _dense(w):
    if isinstance(w, QuantTensor):
        return w.dequant(jnp.float32)
    return w


def _altup_modalities(xs_act: jnp.ndarray, lw, cfg) -> jnp.ndarray:
    """compute_router_modalities: tanh(router(norm(x) / n_embd)) [B,T,A]."""
    r = rms_norm(xs_act, lw["altup_router_norm"], cfg.rms_eps)
    r = r.astype(jnp.float32) / cfg.n_embd
    return jnp.tanh(matmul(r, lw["altup_router"], dtype=jnp.float32))


def _altup_predict(xs: jnp.ndarray, lw, cfg, act_idx: int) -> jnp.ndarray:
    """xs [A,B,T,E] -> predictions [A,B,T,E] (Gemma3nTextAltUp.predict)."""
    A = xs.shape[0]
    mods = _altup_modalities(xs[act_idx], lw, cfg)  # [B,T,A]
    # prediction_coefs: Linear(A -> A^2); row o of the weight is coefficient
    # o = i*A + a mixing source stream a into prediction stream i
    coefs = matmul(mods, lw["altup_predict_coef"], dtype=jnp.float32)
    coefs = coefs.reshape(mods.shape[:-1] + (A, A))  # [B,T,i,a]
    preds = jnp.einsum("btia,abte->ibte", coefs,
                       xs.astype(jnp.float32))
    return (preds + xs.astype(jnp.float32)).astype(xs.dtype)


def _altup_correct(preds: jnp.ndarray, activated: jnp.ndarray, lw, cfg,
                   act_idx: int) -> jnp.ndarray:
    """Gemma3nTextAltUp.correct: innovation broadcast scaled per stream."""
    mods = _altup_modalities(activated, lw, cfg)  # [B,T,A]
    innovation = (activated.astype(jnp.float32)
                  - preds[act_idx].astype(jnp.float32))  # [B,T,E]
    coefs = matmul(mods, lw["altup_correct_coef"], dtype=jnp.float32) + 1.0
    corrected = (coefs.transpose(2, 0, 1)[..., None] * innovation[None]
                 + preds.astype(jnp.float32))
    return corrected.astype(preds.dtype)


def _gaussian_topk(x: jnp.ndarray, std_mult: float) -> jnp.ndarray:
    """Activation sparsity: relu(x - (mean + std_mult * std)) with biased
    std (modeling_gemma3n.py _gaussian_topk, unbiased=False)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True))
    return jnp.maximum(xf - (mean + std * std_mult), 0.0).astype(x.dtype)


def _laurel(h: jnp.ndarray, lw, cfg) -> jnp.ndarray:
    t = matmul(h, lw["laurel_l"])
    t = matmul(t, lw["laurel_r"])
    t = rms_norm(t, lw["laurel_post_norm"], cfg.rms_eps)
    return h + t


def _geglu(lw, h, act):
    """gate/up GeGLU handling the load-time fused [gate|up] projection."""
    if "ffn_gateup" in lw:
        gu = matmul(h, lw["ffn_gateup"])
        gate, upv = jnp.split(gu, 2, axis=-1)
    else:
        gate = matmul(h, lw["ffn_gate"])
        upv = matmul(h, lw["ffn_up"])
    return act(gate) * upv


def _per_layer_inputs(params, cfg, x0, tokens, inputs_embeds, Ep):
    """Shared gemma3n/gemma4 per-layer token-embedding preparation
    (gemma3n.cpp:319-371 build_inp_per_layer + project_per_layer_inputs).
    Returns [B, T, n_layers, Ep]."""
    B, T = x0.shape[:2]
    L = cfg.n_layers
    cdtype = x0.dtype
    if inputs_embeds is not None:
        pad = embed_lookup(params["per_layer_token_embd"],
                           jnp.zeros((B, T), jnp.int32), dtype=cdtype)
        per = pad * float(Ep) ** 0.5
    else:
        per = embed_lookup(params["per_layer_token_embd"], tokens,
                           dtype=cdtype)
        per = (per.astype(jnp.float32) * float(Ep) ** 0.5).astype(cdtype)
    per = per.reshape(B, T, L, Ep)
    plp = matmul(x0, params["per_layer_model_proj"], dtype=jnp.float32)
    plp = (plp * float(cfg.n_embd) ** -0.5).reshape(B, T, L, Ep)
    plp = rms_norm(plp, params["per_layer_proj_norm"], cfg.rms_eps)
    return ((plp + per.astype(jnp.float32)) * (2.0 ** -0.5)).astype(cdtype)


def _per_layer_inject(lw, cfg, cur, per_il, act):
    """Per-layer embedding residual block (gemma4.cpp:341-362 / the gemma3n
    first_prediction tail): gate -> gelu -> * per-layer input -> proj ->
    post-norm."""
    fp = act(matmul(cur, lw["per_layer_inp_gate"]))
    fp = fp * per_il
    fp = matmul(fp, lw["per_layer_proj"])
    return rms_norm(fp, lw["per_layer_post_norm"], cfg.rms_eps)


def forward_gemma4(
    params,
    cfg: ModelConfig,
    tokens,  # [B, T] int32
    inputs: AttnInputs,
    kv,
    output_rows=None,
    return_hidden: bool = False,
    inputs_embeds=None,
):
    """Gemma 4 graph (reference src/models/gemma4.cpp): sandwich-norm layers
    with shared-KV tail, alternative attention (V from K projection), MoE
    layers running a dense shared branch PLUS experts (each with its own
    norms and a router fed by a weightless norm of the attention output),
    per-layer embeddings, and per-layer output scalars."""
    from .transformer import moe_block

    ex = cfg.extra
    E = cfg.n_embd
    Ep = int(ex.get("n_embd_altup", 0))
    cdtype = cfg.compute_dtype or jnp.bfloat16
    act = ACTIVATIONS[cfg.act]

    if inputs_embeds is not None:
        x = inputs_embeds.astype(cdtype)  # raw image embeddings: unscaled
        B, T = x.shape[:2]
    else:
        B, T = tokens.shape
        x = embed_lookup(params["token_embd"], tokens, dtype=cdtype)
        x = (x.astype(jnp.float32) * float(E) ** 0.5).astype(cdtype)

    per = None
    if Ep and "per_layer_token_embd" in params:
        per = _per_layer_inputs(params, cfg, x, tokens, inputs_embeds, Ep)

    for il, lw in enumerate(params["layers"]):
        h = norm(cfg, x, lw, "attn_norm")
        up = None if hasattr(kv, "is_swa") else (il == 0)
        attn, kv = attention_block(cfg, lw, h, inputs, kv, il, update_pos=up)
        attn = rms_norm(attn, lw["attn_post_norm"], cfg.rms_eps)
        attn_out = x + attn

        if "ffn_gate_exps" in lw:
            # dense shared branch (gemma4.cpp:266-281)
            mlp = norm(cfg, attn_out, lw, "ffn_norm")
            mlp = matmul(_geglu(lw, mlp, act), lw["ffn_down"])
            mlp = rms_norm(mlp, lw["ffn_post_norm_1"], cfg.rms_eps)
            # expert branch: router reads a weightless norm of attn_out
            # scaled by 1/sqrt(E) and the per-channel router scale
            # (gemma4.cpp:289-293)
            moe_in = rms_norm(attn_out, lw["ffn_pre_norm_2"], cfg.rms_eps)
            rx = rms_norm(attn_out, None, cfg.rms_eps)
            rx = rx * (float(E) ** -0.5)
            rx = rx * lw["ffn_gate_inp_s"].astype(rx.dtype)
            moe = moe_block(cfg, lw, moe_in, router_x=rx)
            moe = rms_norm(moe.astype(cdtype), lw["ffn_post_norm_2"],
                           cfg.rms_eps)
            cur = mlp + moe
        else:
            hf = norm(cfg, attn_out, lw, "ffn_norm")
            cur = matmul(_geglu(lw, hf, act), lw["ffn_down"])
        cur = rms_norm(cur, lw["ffn_post_norm"], cfg.rms_eps)
        x = attn_out + cur

        if per is not None and "per_layer_inp_gate" in lw:
            x = x + _per_layer_inject(lw, cfg, x, per[:, :, il], act)
        if "layer_out_scale" in lw:
            x = x * lw["layer_out_scale"].reshape(-1)[0].astype(x.dtype)

    # pre-output-norm residual tap: feeds the gemma4-assistant MTP drafter
    # (the reference's t_h_nextn is this row AFTER output_norm — the
    # speculator applies the norm itself; gemma4.cpp:383-387)
    _tap(len(params["layers"]), "l_in", x)
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
    if cfg.final_logit_softcap:
        logits = softcap(logits, cfg.final_logit_softcap)
    return logits, kv


def forward(
    params,
    cfg: ModelConfig,
    tokens,  # [B, T] int32
    inputs: AttnInputs,
    kv,
    output_rows=None,
    return_hidden: bool = False,
    inputs_embeds=None,
):
    ex = cfg.extra
    A = int(ex.get("n_altup", 4))
    act_idx = int(ex.get("i_altup_act", 0))
    Ep = int(ex["n_embd_altup"])
    E = cfg.n_embd
    L = cfg.n_layers
    sparsity = ex.get("act_sparsity_std")  # per-layer std multipliers
    cdtype = cfg.compute_dtype or jnp.bfloat16
    gelu = ACTIVATIONS[cfg.act]

    if inputs_embeds is not None:
        # multimodal splice: raw embeddings are NOT scaled (gemma3n.cpp:104)
        x0 = inputs_embeds.astype(cdtype)
        B, T = x0.shape[:2]
    else:
        B, T = tokens.shape
        x0 = embed_lookup(params["token_embd"], tokens, dtype=cdtype)
        x0 = (x0.astype(jnp.float32) * float(E) ** 0.5).astype(cdtype)
    per = _per_layer_inputs(params, cfg, x0, tokens, inputs_embeds, Ep)

    # expand the single residual stream to n_altup magnitude-matched streams
    target = _rms_mag(x0)
    altup_proj = _dense(params["altup_proj"])  # [A-1, E, E] ([out,in] slices)
    streams = [x0]
    for i in range(A - 1):
        h = matmul(x0, altup_proj[i])
        streams.append(_mag_scale(h, target))
    xs = jnp.stack(streams)  # [A, B, T, E]

    for il, lw in enumerate(params["layers"]):
        preds = _altup_predict(xs, lw, cfg, act_idx)
        active = preds[act_idx]
        h = norm(cfg, active, lw, "attn_norm")
        laurel_out = _laurel(h, lw, cfg)

        up = None if hasattr(kv, "is_swa") else (il == 0)
        attn, kv = attention_block(cfg, lw, h, inputs, kv, il, update_pos=up)
        attn = rms_norm(attn, lw["attn_post_norm"], cfg.rms_eps)

        attn_gated = active + attn
        attn_laurel = ((attn_gated + laurel_out).astype(jnp.float32)
                       * (2.0 ** -0.5)).astype(cdtype)

        hf = norm(cfg, attn_laurel, lw, "ffn_norm")
        if "ffn_gateup" in lw:  # load-time fused [gate | up] projection
            gu = matmul(hf, lw["ffn_gateup"])
            gate, upv = jnp.split(gu, 2, axis=-1)
        else:
            gate = matmul(hf, lw["ffn_gate"])
            upv = matmul(hf, lw["ffn_up"])
        if sparsity is not None and float(sparsity[il]) > 0.0:
            gate = _gaussian_topk(gate, float(sparsity[il]))
        ff = gelu(gate) * upv
        ff = matmul(ff, lw["ffn_down"])
        ff = rms_norm(ff, lw["ffn_post_norm"], cfg.rms_eps)
        gated = attn_laurel + ff

        corrected = _altup_correct(preds, gated, lw, cfg, act_idx)

        # per-layer input injection into the non-first streams
        # (gemma3n.cpp:230-255 "corrected_predictions[1:] += first_prediction")
        fp = _per_layer_inject(
            lw, cfg,
            corrected[act_idx] * lw["altup_correct_scale"].astype(cdtype),
            per[:, :, il], gelu)
        xs = jnp.concatenate([corrected[:1], corrected[1:] + fp[None]])

    # merge streams back to one (gemma3n.cpp:263-285)
    target = _rms_mag(xs[act_idx])
    unembd = _dense(params["altup_unembd_proj"])  # [A-1, E, E]
    out = xs[0].astype(jnp.float32)
    for i in range(A - 1):
        h = matmul(xs[i + 1], unembd[i])
        out = out + _mag_scale(h, target).astype(jnp.float32)
    x = (out / float(A)).astype(cdtype)

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
    if cfg.final_logit_softcap:
        logits = softcap(logits, cfg.final_logit_softcap)
    return logits, kv


# ---------------------------------------------------------------------------
# Gemma 4 assistant (MTP drafter over the TARGET's KV cache)
# ---------------------------------------------------------------------------

def assistant_forward(params, cfg: ModelConfig, tokens, h, inputs,
                      tgt_kv, tgt_tok_embd):
    """Gemma-4-assistant draft step (reference src/models/gemma4-assistant
    .cpp): input is concat(target_tok_embd[token] * sqrt(E_bb), h) projected
    by nextn.pre_projection; every layer runs q-only attention over the
    TARGET context's KV cache (share callback llama-model.cpp:2342-2350 —
    cfg.extra['kv_reuse'] maps each draft layer to the target's last layer
    of the same SWA class); returns (logits, h_next) where h_next =
    nextn.post_projection(post-norm hidden) chains into the next step."""
    ex = cfg.extra
    E = cfg.n_embd
    Ebb = int(ex["n_embd_out"])
    cdtype = cfg.compute_dtype or jnp.bfloat16
    act = ACTIVATIONS[cfg.act]
    B, T = tokens.shape
    x = embed_lookup(tgt_tok_embd, tokens, dtype=cdtype)
    x = (x.astype(jnp.float32) * float(Ebb) ** 0.5).astype(cdtype)
    xh = jnp.concatenate([x, h.astype(cdtype)], axis=-1)
    cur = matmul(xh, params["nextn_proj_pre"])
    for il, lw in enumerate(params["layers"]):
        hn = norm(cfg, cur, lw, "attn_norm")
        attn, _ = attention_block(cfg, lw, hn, inputs, tgt_kv, il,
                                  update_pos=False)
        attn = rms_norm(attn, lw["attn_post_norm"], cfg.rms_eps)
        attn_out = cur + attn
        hf = norm(cfg, attn_out, lw, "ffn_norm")
        ff = matmul(_geglu(lw, hf, act), lw["ffn_down"])
        ff = rms_norm(ff, lw["ffn_post_norm"], cfg.rms_eps)
        cur = attn_out + ff
        if "layer_out_scale" in lw:
            cur = cur * lw["layer_out_scale"].reshape(-1)[0].astype(cur.dtype)
    cur = norm(cfg, cur, params, "output_norm")
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = matmul(cur.reshape(B * T, E), out_w, dtype=jnp.float32)
    h_next = matmul(cur, params["nextn_proj_post"], dtype=jnp.float32)
    return logits, h_next


class Gemma4AssistantSpeculator:
    """Speculator-protocol adapter (runtime/speculative.py) for the Gemma-4
    MTP assistant — the reference's 'draft-mtp' is_mem_shared mode
    (common/speculative.cpp:1249-1650): no draft KV at all; every draft
    query attends the live target cache at a FIXED position n_past, and the
    drafter's own h_next output chains across draft steps."""

    needs_features = True

    def __init__(self, draft_model, ctx, seq: int = 0, p_min: float = 0.75):
        self.cfg = draft_model.cfg
        self.params = draft_model.params
        self.ctx = ctx
        self.seq = seq
        self.p_min = p_min
        tl = ctx.model.cfg.n_layers
        # capture the target's PRE-output-norm row; output_norm applies here
        self.target_layers = (tl,)
        self.cfg.extra["kv_reuse"] = [
            tl - 2 if self.cfg.is_swa_layer(il) else tl - 1
            for il in range(self.cfg.n_layers)]
        self.t_out_norm = ctx.model.params["output_norm"]
        self.tgt_tok_embd = ctx.model.params["token_embd"]
        self.pending_h = None  # np [E_bb] target post-norm hidden
        self._fn = None

    def reset(self) -> None:
        self.pending_h = None

    # -- target-verify feedback ----------------------------------------
    def process(self, tokens, feats, pos0: int) -> None:
        n = feats.shape[0] if hasattr(feats, "shape") else len(feats)
        if n == 0:
            return
        h = rms_norm(jnp.asarray(feats, jnp.float32), self.t_out_norm,
                     self.ctx.model.cfg.rms_eps)
        self.pending_h = np.asarray(h[-1], np.float32)

    # -- drafting --------------------------------------------------------
    def _step(self):
        if self._fn is None:
            cfg, tok_embd = self.cfg, self.tgt_tok_embd

            @jax.jit
            def fn(params, token, h, kv, seq_idx, pos):
                inputs = AttnInputs(seq_idx=seq_idx, slots=pos,
                                    positions=pos)
                return assistant_forward(params, cfg, token, h, inputs, kv,
                                         tok_embd)

            self._fn = fn
        return self._fn

    def draft(self, tokens, n: int):
        if self.pending_h is None or n <= 0:
            return []
        n_past = len(tokens) - 1
        cur = tokens[-1]
        h = jnp.asarray(self.pending_h)[None, None, :]
        kv = self.ctx.kv
        seq = jnp.asarray([self.seq], jnp.int32)
        # fixed position for every draft token (is_mem_shared mode —
        # speculative.cpp:1636-1639)
        pos = jnp.asarray([[n_past]], jnp.int32)
        out = []
        fn = self._step()
        for _ in range(n):
            logits, h_next = fn(self.params, jnp.asarray([[cur]], jnp.int32),
                                h, kv, seq, pos)
            lrow = np.asarray(logits[0])
            t = int(lrow.argmax())
            p = float(jax.nn.softmax(jnp.asarray(lrow))[t])
            if p < self.p_min:
                break
            out.append(t)
            cur = t
            h = h_next[:, -1:][..., :]
        return out
