"""DFlash block-diffusion speculative drafter (reference
src/models/dflash.cpp + common/speculative.cpp:917-1244 'draft-dflash').

Three graphs, mirroring the reference's encoder / KV-injection / noise
decode split:

- encode: concatenated target-layer INPUT hidden states
  [n, n_target_layers * n_embd_tgt] -> fc -> rms(enc.output_norm) -> g
  (dflash.cpp graph<true>, :148-166).
- inject: per drafter layer, K = rope(rms(wk @ g)), V = wv @ g written into
  the drafter KV at the tokens' positions (dflash.cpp :236-270 ubatch.embd
  branch). TPU shape: the cache is position-addressed ([S] slot == pos), so
  re-injection after a rejected draft simply overwrites — no cell
  bookkeeping.
- block decode: a noise block [id_last, <mask> x n] with NON-CAUSAL
  attention over (injected context ∪ the block itself); greedy tokens are
  read from noise rows 1.. (speculative.cpp:1130-1236). The reference
  persists noise K/V in its unified cache; here the block K/V live only in
  the dispatch (identical math — attention sees exactly context + block —
  and stale-noise-cell aliasing is impossible by construction).

The drafter has no token_embd/output of its own: it borrows the target's
(dflash.cpp :293-300, :354-360).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import rms_norm
from ..ops.qtensor import embed_lookup, matmul
from ..ops.rope import RopeParams, apply_rope

MASK_VALUE = -1e30


def dflash_encode(params: dict[str, Any], cfg, feats: jnp.ndarray):
    """[n, n_targets*n_embd_tgt] -> [n, n_embd] g embeddings."""
    x = matmul(feats.astype(jnp.bfloat16), params["fc"])
    return rms_norm(x, params["enc_output_norm"], cfg.rms_eps)


def _rope_params(cfg) -> RopeParams:
    return RopeParams(rope_type=cfg.rope_type, n_dims=cfg.rope_dims,
                      freq_base=cfg.rope_freq_base,
                      freq_scale=cfg.rope_freq_scale)


def dflash_inject(params, cfg, g, positions, k_cache, v_cache, cache_pos):
    """Write g-derived K/V for every layer at `positions`.
    g [n, E]; k_cache/v_cache [L, S, Hkv, D]; cache_pos [S] int32."""
    rp = _rope_params(cfg)
    Hkv, D = cfg.n_kv_heads, cfg.head_dim_k
    n = g.shape[0]
    g = g.astype(jnp.bfloat16)
    slots = positions  # position-addressed cache
    for il, lw in enumerate(params["layers"]):
        k = matmul(g, lw["attn_k"]).reshape(1, n, Hkv, D)
        k = rms_norm(k, lw["attn_k_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        k = apply_rope(k, positions[None, :], rp)
        v = matmul(g, lw["attn_v"]).reshape(n, Hkv, D)
        k_cache = k_cache.at[il, slots].set(k[0].astype(k_cache.dtype))
        v_cache = v_cache.at[il, slots].set(v.astype(v_cache.dtype))
    cache_pos = cache_pos.at[slots].set(positions)
    return k_cache, v_cache, cache_pos


def dflash_block_decode(params, cfg, tokens, positions, k_cache, v_cache,
                        cache_pos, tok_embd, out_w):
    """Noise-block forward -> logits [nb, vocab]. tokens/positions [nb]
    (position < 0 marks padding rows); attention is non-causal over every
    live cache slot plus the block itself."""
    rp = _rope_params(cfg)
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim_k
    Dv = cfg.head_dim_v
    G = H // Hkv
    nb = tokens.shape[0]
    scale = cfg.attn_scale or D ** -0.5

    x = embed_lookup(tok_embd, tokens[None, :], dtype=jnp.bfloat16)[0]
    valid_cache = cache_pos >= 0  # [S]
    valid_rows = positions >= 0  # [nb]
    for il, lw in enumerate(params["layers"]):
        h = rms_norm(x, lw["attn_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        q = matmul(h, lw["attn_q"]).reshape(1, nb, H, D)
        k = matmul(h, lw["attn_k"]).reshape(1, nb, Hkv, D)
        v = matmul(h, lw["attn_v"]).reshape(nb, Hkv, Dv)
        q = rms_norm(q, lw["attn_q_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        k = rms_norm(k, lw["attn_k_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        q = apply_rope(q, positions[None, :], rp)[0]  # [nb, H, D]
        k = apply_rope(k, positions[None, :], rp)[0]  # [nb, Hkv, D]
        # context ∪ block, both [*, Hkv, D]
        ks = jnp.concatenate([k_cache[il].astype(jnp.bfloat16), k], axis=0)
        vs = jnp.concatenate([v_cache[il].astype(jnp.bfloat16),
                              v.astype(jnp.bfloat16)], axis=0)
        live = jnp.concatenate([valid_cache, valid_rows], axis=0)  # [S+nb]
        qg = q.reshape(nb, Hkv, G, D)
        s = jnp.einsum("nkgd,skd->kgns", qg, ks,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(live[None, None, None, :], s, MASK_VALUE)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("kgns,skd->nkgd", p.astype(jnp.bfloat16), vs)
        att = matmul(o.reshape(nb, H * Dv), lw["attn_output"])
        x = x.astype(jnp.float32) + att.astype(jnp.float32)
        hf = rms_norm(x, lw["ffn_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        up = matmul(hf, lw["ffn_up"])
        gate = matmul(hf, lw["ffn_gate"])
        ff = matmul((jax.nn.silu(gate.astype(jnp.float32))
                     .astype(jnp.bfloat16) * up), lw["ffn_down"])
        x = x + ff.astype(jnp.float32)
    x = rms_norm(x, params["output_norm"], cfg.rms_eps).astype(jnp.bfloat16)
    return matmul(x, out_w, dtype=jnp.float32)


class DflashSpeculator:
    """Speculator-protocol adapter (runtime/speculative.py): process() is
    fed target layer-input captures on every verified chunk and injects
    them; draft() runs ONE noise-block dispatch and greedily reads up to
    block_size-1 tokens, cut at p_min (speculative.cpp:1216-1226)."""

    needs_features = True

    def __init__(self, draft_model, target_model, n_ctx: int = 2048,
                 p_min: float = 0.75, n_min: int = 0):
        self.cfg = draft_model.cfg
        self.params = draft_model.params
        cfg = self.cfg
        self.target_layers = tuple(
            int(i) for i in cfg.extra["target_layers"])
        self.block_size = int(cfg.extra.get("block_size", 16))
        self.mask_id = int(cfg.extra.get("mask_token_id", 0))
        self.p_min = p_min
        self.n_min = n_min
        if self.params.get("markov_w1") is not None:
            # legacy DSpark: the reference also runs the Markov/confidence
            # head on the plain DFlash decode whenever markov_w1 exists
            # (dflash.cpp:496-498); drafting without it silently diverges
            raise NotImplementedError(
                "DSpark Markov-head dflash checkpoints are not supported "
                "yet (markov_w1 present)")
        self.tok_embd = self.params.get(
            "token_embd", target_model.params.get("token_embd"))
        self.out_w = self.params.get("output")
        if self.out_w is None:
            self.out_w = target_model.params.get(
                "output", target_model.params["token_embd"])
        self.n_ctx = n_ctx
        L, S = cfg.n_layers, n_ctx
        self.k_cache = jnp.zeros((L, S, cfg.n_kv_heads, cfg.head_dim_k),
                                 jnp.bfloat16)
        self.v_cache = jnp.zeros((L, S, cfg.n_kv_heads, cfg.head_dim_v),
                                 jnp.bfloat16)
        self.cache_pos = jnp.full((S,), -1, jnp.int32)
        self._inject_fns: dict[int, Any] = {}
        self._decode_fns: dict[int, Any] = {}

    def reset(self) -> None:
        self.cache_pos = jnp.full_like(self.cache_pos, -1)

    # ------------------------------------------------------------------
    def _inject(self, n: int):
        fn = self._inject_fns.get(n)
        if fn is None:
            cfg = self.cfg

            @partial(jax.jit, donate_argnums=(2, 3, 4))
            def fn(params, g, kc, vc, cp, positions):
                return dflash_inject(params, cfg, g, positions, kc, vc, cp)

            self._inject_fns[n] = fn
        return fn

    def _decode(self, nb: int):
        fn = self._decode_fns.get(nb)
        if fn is None:
            cfg, te, ow = self.cfg, self.tok_embd, self.out_w

            @jax.jit
            def fn(params, tokens, positions, kc, vc, cp):
                return dflash_block_decode(params, cfg, tokens, positions,
                                           kc, vc, cp, te, ow)

            self._decode_fns[nb] = fn
        return fn

    # ------------------------------------------------------------------
    def process(self, tokens: list[int], feats, pos0: int) -> None:
        """Inject g(features) at positions pos0..pos0+n-1 (the verified
        chunk). Overwrites any stale/rejected rows at those positions."""
        n = feats.shape[0] if hasattr(feats, "shape") else len(feats)
        if n == 0 or pos0 + n > self.n_ctx:
            return
        g = dflash_encode(self.params, self.cfg, jnp.asarray(feats))
        # drop stale entries past this chunk (rejected drafts / rewinds)
        self.cache_pos = jnp.where(
            jnp.arange(self.n_ctx) >= pos0 + n, -1, self.cache_pos)
        self.k_cache, self.v_cache, self.cache_pos = self._inject(n)(
            self.params, g, self.k_cache, self.v_cache, self.cache_pos,
            jnp.asarray(pos0 + np.arange(n), jnp.int32))

    def draft(self, tokens: list[int], n: int) -> list[int]:
        n = min(n, self.block_size - 1)
        pos0 = len(tokens) - 1
        if n <= 0 or pos0 < 0 or pos0 + n + 1 >= self.n_ctx:
            return []
        # require injected context up to pos0-1 (process ran on the prefix)
        if pos0 > 0 and int(jnp.max(self.cache_pos)) < pos0 - 1:
            return []
        nb = self.block_size  # fixed dispatch shape
        toks = np.full(nb, self.mask_id, np.int32)
        toks[0] = tokens[-1]
        pos = np.full(nb, -1, np.int32)
        pos[: n + 1] = pos0 + np.arange(n + 1)
        logits = self._decode(nb)(
            self.params, jnp.asarray(toks), jnp.asarray(pos),
            self.k_cache, self.v_cache, self.cache_pos)
        probs = jax.nn.softmax(logits[1: n + 1], axis=-1)
        ids = np.asarray(jnp.argmax(probs, axis=-1))
        top_p = np.asarray(jnp.max(probs, axis=-1))
        out: list[int] = []
        for i in range(n):
            if top_p[i] < self.p_min:
                break
            out.append(int(ids[i]))
        return out if len(out) >= self.n_min else []
