"""DeepSeek-V4 forward pass (reference src/models/deepseek4.cpp +
llama-kv-cache-dsv4.{h,cpp}).

The architecture stacks three unusual strata:

* **Hyper-connections** (hc_mult residual streams): every half-block mixes
  its streams through learned sigmoid pre/post gates and a
  Sinkhorn-normalized stream-combination matrix (deepseek4.cpp
  build_hc_pre/build_hc_post/build_hc_sinkhorn).
* **Single-latent attention with k == v**: one head_dim-wide latent per
  token serves as both key and value; queries per-head-rms-normalized; the
  attention output's rope slice is INVERSE-rotated at the query position
  before a grouped low-rank o-projection (wo_a per group, wo_b).
* **Compressed KV (DSV4 cache)**: per-layer compress ratios — 0 (raw SWA
  only), 4 (CSA: overlapped softmax compression + lightning-indexer top-k
  over compressed columns), 128 (HCA: block softmax compression). Raw
  attention always covers the recent SWA window; compressed rows cover the
  full history at ratio× fewer rows.

TPU-first cache design: instead of the reference's incremental ring states
with device-side snapshot/rollback planes (llama-kv-cache-dsv4.cpp
dsv4_build_comp_plan), we cache each token's COMPRESSOR ACTIVATIONS
(kv + APE-added score) in plain position-addressed caches and rebuild the
compressed rows by a block reshape inside the traced step — the compression
is a deterministic function of those activations, so results match the
reference's committed rows exactly while the bookkeeping disappears.

MoE: sqrt-softplus gating; the first hash_layer_count layers route by
TOKEN ID through the tid2eid table instead of top-k (deepseek4.cpp:1334).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..ops.basic import rms_norm
from ..ops.qtensor import embed_lookup, matmul
from ..ops.rope import RopeParams, apply_rope
from .config import ModelConfig
from .transformer import AttnInputs, _moe_ragged

CSA_RATIO = 4
HCA_RATIO = 128


def _hc_sinkhorn(comb: jnp.ndarray, iters: int, eps: float) -> jnp.ndarray:
    """comb [..., src, dst]: row softmax over dst, then alternating
    src/dst sum-normalizations (deepseek4.cpp build_hc_sinkhorn)."""
    comb = jax.nn.softmax(comb, axis=-1) + eps

    def norm_cols(c):  # sum over src = 1 for each dst
        return c / (jnp.sum(c, axis=-2, keepdims=True) + eps)

    def norm_rows(c):  # sum over dst = 1 for each src
        return c / (jnp.sum(c, axis=-1, keepdims=True) + eps)

    comb = norm_cols(comb)
    for _ in range(max(iters, 1) - 1):
        comb = norm_cols(norm_rows(comb))
    return comb


def _hc_pre(cfg, streams, fn_w, scale_w, base_w):
    """streams [B,T,hc,E] -> (pre_mix [B,T,E], post [B,T,hc],
    comb [B,T,src,dst])."""
    ex = cfg.extra
    hc = ex["hc_mult"]
    B, T = streams.shape[:2]
    flat = streams.reshape(B, T, hc * cfg.n_embd)
    flat = rms_norm(flat, None, cfg.rms_eps)
    mixes = matmul(flat, fn_w, dtype=jnp.float32)  # [B,T,(2+hc)*hc]
    scale = scale_w.astype(jnp.float32).reshape(-1)
    base = base_w.astype(jnp.float32).reshape(-1)
    eps = ex["hc_eps"]

    pre = jax.nn.sigmoid(mixes[..., :hc] * scale[0] + base[:hc]) + eps
    post = 2.0 * jax.nn.sigmoid(
        mixes[..., hc:2 * hc] * scale[1] + base[hc:2 * hc])
    combf = mixes[..., 2 * hc:] * scale[2] + base[2 * hc:]
    # flat index = dst + hc*src (ggml ne0 = dst is fastest)
    comb = _hc_sinkhorn(combf.reshape(B, T, hc, hc), ex["hc_sinkhorn_iters"],
                        eps)
    x_pre = jnp.sum(streams.astype(jnp.float32) * pre[..., None], axis=2)
    return x_pre, post, comb


def _hc_post(x, streams, post, comb):
    """out[dst] = x*post[dst] + sum_src streams[src]*comb[src,dst]."""
    mixed = jnp.einsum("btsd,btse->btde", comb,
                       streams.astype(jnp.float32))
    return x.astype(jnp.float32)[:, :, None, :] * post[..., None] + mixed


def _hc_head(cfg, streams, fn_w, scale_w, base_w):
    ex = cfg.extra
    hc = ex["hc_mult"]
    B, T = streams.shape[:2]
    flat = rms_norm(streams.reshape(B, T, hc * cfg.n_embd), None, cfg.rms_eps)
    mixes = matmul(flat, fn_w, dtype=jnp.float32)  # [B,T,hc]
    pre = jax.nn.sigmoid(
        mixes * scale_w.astype(jnp.float32).reshape(-1)[0]
        + base_w.astype(jnp.float32)) + ex["hc_eps"]
    return jnp.sum(streams.astype(jnp.float32) * pre[..., None], axis=2)


def _rp(cfg, compress: bool) -> RopeParams:
    """Per-layer rope: compress layers use the compress base + YaRN; raw
    layers use the plain base with YaRN off (deepseek4.cpp:928-935)."""
    base = cfg.extra["compress_rope_base"] if compress else cfg.rope_freq_base
    return RopeParams(
        rope_type=cfg.rope_type, n_dims=cfg.rope_dims, freq_base=base,
        freq_scale=cfg.rope_freq_scale if compress else 1.0,
        ext_factor=cfg.rope_ext_factor if compress else 0.0,
        attn_factor=1.0, beta_fast=cfg.rope_beta_fast,
        beta_slow=cfg.rope_beta_slow, orig_ctx=cfg.rope_orig_ctx,
    )


def _rope_pe(x, positions, rp):
    """Rope the trailing rope_dims slice of the last axis."""
    rot = rp.n_dims
    pe = apply_rope(x[..., -rot:], positions, replace(rp, n_dims=rot))
    return jnp.concatenate([x[..., :-rot], pe], axis=-1)


def _compress_blocks(acts_kv, acts_score, act_pos, ratio, overlap, Dh):
    """Rebuild compressed rows from cached per-token compressor activations.

    acts_kv/acts_score: [S, W] (W = 2*Dh overlapped, Dh plain), slot == pos.
    Returns (comp [NB, Dh], comp_valid [NB]) for NB = S // ratio blocks:
    block b aggregates window rows with softmax(score) weights
    (deepseek4.cpp build_overlap_compressed_kv_from_state /
    build_hca_compressed_kv_from_state)."""
    S = acts_kv.shape[0]
    NB = S // ratio
    kvf = acts_kv.astype(jnp.float32)
    scf = acts_score.astype(jnp.float32)
    written = (act_pos >= 0)[: NB * ratio].reshape(NB, ratio)
    if overlap:
        # window = [prev-half of block b-1 tokens | cur-half of block b]
        prev_k = kvf[: NB * ratio, :Dh].reshape(NB, ratio, Dh)
        prev_s = scf[: NB * ratio, :Dh].reshape(NB, ratio, Dh)
        cur_k = kvf[: NB * ratio, Dh:].reshape(NB, ratio, Dh)
        cur_s = scf[: NB * ratio, Dh:].reshape(NB, ratio, Dh)
        zpk = jnp.zeros((1, ratio, Dh), jnp.float32)
        zps = jnp.full((1, ratio, Dh), -jnp.inf, jnp.float32)
        prev_k = jnp.concatenate([zpk, prev_k[:-1]], axis=0)
        prev_s = jnp.concatenate([zps, prev_s[:-1]], axis=0)
        vals = jnp.concatenate([prev_k, cur_k], axis=1)  # [NB, 2r, Dh]
        scs = jnp.concatenate([prev_s, cur_s], axis=1)
        pv = jnp.concatenate([jnp.ones((1, ratio), bool),
                              written[:-1]], axis=0)
        win_ok = jnp.concatenate([pv, written], axis=1)  # [NB, 2r]
    else:
        vals = kvf[: NB * ratio, :Dh].reshape(NB, ratio, Dh)
        scs = scf[: NB * ratio, :Dh].reshape(NB, ratio, Dh)
        win_ok = written
    scs = jnp.where(win_ok[..., None], scs, -jnp.inf)
    w = jax.nn.softmax(scs, axis=1)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    comp = jnp.sum(vals * w, axis=1)  # [NB, Dh]
    valid = written.all(axis=-1)
    return comp, valid


def _dsv4_attention(cfg, lw, h, inputs, mem, il, up_raw, up_comp, up_lid):
    ex = cfg.extra
    B, T, E = h.shape
    H = cfg.n_heads
    Dh = cfg.head_dim_k
    rot = cfg.rope_dims
    ratio = ex["compress_ratios"][il]
    rp = _rp(cfg, ratio != 0)
    window = cfg.sliding_window

    qr = rms_norm(matmul(h, lw["attn_q_a"]), lw["attn_q_a_norm"], cfg.rms_eps)
    q = matmul(qr, lw["attn_q_b"]).reshape(B, T, H, Dh)
    q = rms_norm(q, None, cfg.rms_eps)  # weightless per-head rms
    q = _rope_pe(q, inputs.positions, rp)

    kv = rms_norm(matmul(h, lw["attn_kv"]), lw["attn_kv_a_norm"], cfg.rms_eps)
    kv = _rope_pe(kv.reshape(B, T, 1, Dh), inputs.positions, rp)

    seq_flat = jnp.repeat(inputs.seq_idx, T)
    pos_flat = inputs.positions.reshape(-1)
    raw = mem.raw.write_layer(il, seq_flat, pos_flat,
                              kv.reshape(B * T, 1, Dh),
                              kv.reshape(B * T, 1, Dh),
                              update_pos=up_raw, contiguous=B == 1 and T > 1)
    mem = replace(mem, raw=raw)

    k_all = raw.k[il][inputs.seq_idx][:, 0]  # [B, S, Dh]
    slot_pos = raw.pos[inputs.seq_idx]  # [B, S]
    qpos = inputs.positions  # [B, T]

    # raw visibility: causal + SWA window (build_raw_attention / iSWA half)
    valid = slot_pos >= 0
    causal = slot_pos[:, None, :] <= qpos[:, :, None]
    raw_mask = valid[:, None, :] & causal
    if window > 0:
        raw_mask = raw_mask & (slot_pos[:, None, :] > qpos[:, :, None] - window)

    qf = q.astype(jnp.float32)
    scale = 1.0 / float(Dh) ** 0.5
    sc_raw = jnp.einsum("bthd,bsd->bhts", qf,
                        k_all.astype(jnp.float32)) * scale
    sc_raw = jnp.where(raw_mask[:, None], sc_raw, -jnp.inf)

    comp_k = None
    comp_mask = None
    if ratio:
        overlap = ratio == CSA_RATIO
        ape = lw["attn_comp_ape"].astype(jnp.float32)  # [ratio, W]
        ckv = matmul(h, lw["attn_comp_wkv"]).astype(jnp.float32)
        cs = (matmul(h, lw["attn_comp_wgate"]).astype(jnp.float32)
              + ape[pos_flat % ratio].reshape(B, T, -1))
        W = ckv.shape[-1]
        cw = mem.comp.k.shape[-1]
        if W < cw:  # HCA coff=1 acts pad to the shared 2*Dh cache width
            ckv = jnp.pad(ckv, ((0, 0), (0, 0), (0, cw - W)))
            cs = jnp.pad(cs, ((0, 0), (0, 0), (0, cw - W)))
        comp = mem.comp.write_layer(
            il, seq_flat, pos_flat,
            ckv.reshape(B * T, 1, -1),
            cs.reshape(B * T, 1, -1),
            update_pos=up_comp, contiguous=B == 1 and T > 1)
        mem = replace(mem, comp=comp)

        def comp_rows(cache, dh):
            # per sequence: rebuild compressed rows from activations
            a_k = cache.k[il][inputs.seq_idx][:, 0]  # [B, S, W]
            a_s = cache.v[il][inputs.seq_idx][:, 0]
            a_p = cache.pos[inputs.seq_idx]  # [B, S]

            def one(ak, asc, ap):
                return _compress_blocks(ak, asc, ap, ratio, overlap, dh)

            return jax.vmap(one)(a_k, a_s, a_p)  # [B, NB, dh], [B, NB]

        comp_raw, comp_valid = comp_rows(comp, Dh)
        comp_n = rms_norm(comp_raw, lw["attn_comp_norm"], cfg.rms_eps)
        NB = comp_n.shape[1]
        # block rope at the block's first token position (state_write_pos)
        bpos = jnp.arange(NB, dtype=jnp.int32)[None].repeat(B, 0) * ratio
        comp_k = _rope_pe(comp_n[:, :, None, :], bpos, rp)[:, :, 0]

        # visibility: block b completed and b < (pos+1)//ratio
        nvis = (qpos + 1) // ratio  # [B, T]
        bidx = jnp.arange(NB, dtype=jnp.int32)
        comp_mask = (bidx[None, None, :] < nvis[:, :, None]) \
            & comp_valid[:, None, :]

        if overlap and "indexer_attn_q_b" in lw:
            # lightning indexer over compressed lid rows -> top-k gate
            Hi = ex["indexer_n_head"]
            Di = ex["indexer_head_size"]
            topk = ex["indexer_top_k"]
            iape = lw["indexer_comp_ape"].astype(jnp.float32)
            ikv = matmul(h, lw["indexer_comp_wkv"]).astype(jnp.float32)
            isc = (matmul(h, lw["indexer_comp_wgate"]).astype(jnp.float32)
                   + iape[pos_flat % ratio].reshape(B, T, -1))
            lid = mem.lid.write_layer(
                il, seq_flat, pos_flat,
                ikv.reshape(B * T, 1, -1), isc.reshape(B * T, 1, -1),
                update_pos=up_lid, contiguous=B == 1 and T > 1)
            mem = replace(mem, lid=lid)
            lid_raw, _ = comp_rows(lid, Di)
            lid_k = rms_norm(lid_raw, lw["indexer_comp_norm"], cfg.rms_eps)
            lid_k = _rope_pe(lid_k[:, :, None, :], bpos,
                             replace(rp, n_dims=rot))[:, :, 0]

            iq = matmul(qr, lw["indexer_attn_q_b"]).reshape(B, T, Hi, Di)
            iq = _rope_pe(iq, qpos, rp)
            iw = matmul(h, lw["indexer_proj"], dtype=jnp.float32) \
                / float(Hi * Di) ** 0.5  # [B,T,Hi]
            isc2 = jax.nn.relu(jnp.einsum(
                "bthd,bnd->bhtn", iq.astype(jnp.float32), lid_k))
            isc2 = jnp.einsum("bhtn,bth->btn", isc2, iw)
            isc2 = jnp.where(comp_mask, isc2, -jnp.inf)
            k_eff = min(topk, NB)
            _, top_idx = jax.lax.top_k(isc2, k_eff)
            sel = jnp.any(jax.nn.one_hot(top_idx, NB, dtype=bool), axis=-2)
            comp_mask = comp_mask & sel

    if comp_k is not None:
        sc_comp = jnp.einsum("bthd,bnd->bhtn", qf, comp_k) * scale
        sc_comp = jnp.where(comp_mask[:, None], sc_comp, -jnp.inf)
        scores = jnp.concatenate([sc_raw, sc_comp], axis=-1)
        v_cat = jnp.concatenate([k_all.astype(jnp.float32), comp_k], axis=1)
    else:
        scores = sc_raw
        v_cat = k_all.astype(jnp.float32)

    sinks = lw.get("attn_sinks")
    if sinks is not None:
        sink_col = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(1, H, 1, 1),
            scores.shape[:-1] + (1,))
        probs = jax.nn.softmax(
            jnp.concatenate([scores, sink_col], axis=-1), axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("bhts,bsd->bthd", probs, v_cat)  # v == k

    # inverse-rope the output's pe slice at the query position
    # (ggml_rope_ext_back, deepseek4.cpp:1256)
    out = _rope_pe(out, -qpos, rp)

    # grouped low-rank o-projection: wo_a [G, o_lora, hg*Dh], wo_b
    G = ex["o_group_count"]
    hg = H // G
    wo_a = lw["attn_output_a"].astype(jnp.float32)  # [G, o_lora, hg*Dh]
    og = out.reshape(B, T, G, hg * Dh)
    oa = jnp.einsum("btgd,gld->btgl", og, wo_a)
    out = matmul(oa.reshape(B, T, -1).astype(h.dtype), lw["attn_output_b"])
    return out, mem


def _dsv4_moe(cfg, lw, h, tokens, il):
    ex = cfg.extra
    k = cfg.n_expert_used
    logits = matmul(h, lw["ffn_gate_inp"], dtype=jnp.float32)
    probs = jnp.sqrt(jax.nn.softplus(logits))  # sqrtsoftplus gating

    if il < ex.get("hash_layer_count", 0) and "ffn_gate_tid2eid" in lw:
        # hash routing: expert ids fixed by token id (deepseek4.cpp:1334)
        tid2eid = lw["ffn_gate_tid2eid"]
        t2e = (tid2eid.astype(jnp.int32) if tid2eid.dtype != jnp.int32
               else tid2eid)  # [n_expert_used, n_vocab] gguf -> [V, k]? no:
        # gguf {n_expert_used, n_vocab} -> numpy [n_vocab, n_expert_used]
        topi = t2e[tokens]  # [B, T, k]
        topw = jnp.take_along_axis(probs, topi, axis=-1)
    else:
        sel = probs
        if "exp_probs_b" in lw:
            sel = probs + lw["exp_probs_b"].astype(jnp.float32)
        _, topi = jax.lax.top_k(sel, k)
        topw = jnp.take_along_axis(probs, topi, axis=-1)
    if cfg.expert_weights_norm:
        topw = topw / jnp.clip(topw.sum(-1, keepdims=True), 1e-9, None)
    topw = topw * cfg.expert_weights_scale

    act = jax.nn.silu
    ff = _moe_ragged(cfg, lw, h, topi, topw, act)
    sh = act(matmul(h, lw["ffn_gate_shexp"], dtype=jnp.float32)) \
        * matmul(h, lw["ffn_up_shexp"], dtype=jnp.float32)
    ff = ff + matmul(sh.astype(h.dtype), lw["ffn_down_shexp"]).astype(
        jnp.float32)
    return ff


def forward(
    params,
    cfg: ModelConfig,
    tokens,
    inputs: AttnInputs,
    mem,
    output_rows=None,
    return_hidden: bool = False,
    inputs_embeds=None,
):
    ex = cfg.extra
    hc = ex["hc_mult"]
    cdtype = cfg.compute_dtype or jnp.bfloat16
    if inputs_embeds is not None:
        x = inputs_embeds.astype(cdtype)
    else:
        x = embed_lookup(params["token_embd"], tokens, dtype=cdtype)
    B, T, E = x.shape
    streams = jnp.broadcast_to(x[:, :, None, :], (B, T, hc, E)).astype(
        jnp.float32)

    ratios = ex["compress_ratios"]
    first_comp = next((i for i, r in enumerate(ratios) if r), -1)
    first_csa = next(
        (i for i, r in enumerate(ratios)
         if r == CSA_RATIO and "indexer_attn_q_b" in params["layers"][i]), -1)
    for il, lw in enumerate(params["layers"]):
        pre, post, comb = _hc_pre(cfg, streams, lw["hc_attn_fn"],
                                  lw["hc_attn_scale"], lw["hc_attn_base"])
        h = rms_norm(pre, lw["attn_norm"], cfg.rms_eps).astype(cdtype)
        attn, mem = _dsv4_attention(cfg, lw, h, inputs, mem, il,
                                    il == 0, il == first_comp, il == first_csa)
        streams = _hc_post(attn.astype(jnp.float32), streams, post, comb)

        pre, post, comb = _hc_pre(cfg, streams, lw["hc_ffn_fn"],
                                  lw["hc_ffn_scale"], lw["hc_ffn_base"])
        h = rms_norm(pre, lw["ffn_norm"], cfg.rms_eps).astype(cdtype)
        ff = _dsv4_moe(cfg, lw, h, tokens, il)
        streams = _hc_post(ff, streams, post, comb)

    x = _hc_head(cfg, streams, params["hc_head_fn"],
                 params["hc_head_scale"], params["hc_head_base"])
    x = x.reshape(B * T, E)
    if output_rows is not None:
        x = x[output_rows]
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    if return_hidden:
        return x, mem
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = matmul(x.astype(cdtype), out_w, dtype=jnp.float32)
    return logits, mem
